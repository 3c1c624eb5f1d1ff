"""Testing utilities: naive ground truths, fixture data, gradient checks."""

from stnls_tpu.testing import nls_gt
from stnls_tpu.testing import agg_gt
from stnls_tpu.testing import data
from stnls_tpu.testing.checks import (
    find_duplicate_inds, check_shuffled_inds, gradcheck,
)
