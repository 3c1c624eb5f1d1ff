"""Search layer: grid searches around flow-shifted centers.

Mirrors lib/stnls/search of the reference.
"""

from stnls_tpu.search import utils
from stnls_tpu.search.non_local_search import (
    NonLocalSearch, _apply as nls, init as init_nls,
    extract_config as extract_nls_config, nls_pipeline,
)
from stnls_tpu.search import non_local_search
