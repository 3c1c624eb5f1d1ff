from stnls_tpu.testing import nls_gt
