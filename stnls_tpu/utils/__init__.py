from stnls_tpu.utils.config import (
    extract_pairs, optional, optional_delete, ConfigDict,
)
from stnls_tpu.utils import config
from stnls_tpu.utils import misc
from stnls_tpu.utils import timer
from stnls_tpu.utils import mem
from stnls_tpu.utils import mem as gpu_mem  # reference-name alias
from stnls_tpu.utils import bench
from stnls_tpu.utils import inds
from stnls_tpu.utils import pads
from stnls_tpu.utils import color
from stnls_tpu.utils import vid_io
from stnls_tpu.utils import mask
from stnls_tpu.utils import debug
from stnls_tpu.utils.inds import get_nums_hw, get_batching_info
from stnls_tpu.utils.misc import flow2inds, inds2flow, set_seed
