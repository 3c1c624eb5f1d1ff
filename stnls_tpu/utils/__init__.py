from stnls_tpu.utils.config import extract_pairs, optional, ConfigDict
