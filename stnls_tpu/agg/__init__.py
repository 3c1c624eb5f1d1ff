"""Aggregation layer (reference lib/stnls/agg): weighted non-local patch
stacking and summing."""

from stnls_tpu.agg.gather import NonLocalGather, non_local_gather
from stnls_tpu.agg.scatter import NonLocalScatter, non_local_scatter
from stnls_tpu.agg.gather_add import NonLocalGatherAdd
from stnls_tpu.agg.scatter_add import NonLocalScatterAdd
from stnls_tpu.agg.pool import PooledPatchSum, WeightedPatchSum
from stnls_tpu.agg.stack_conv import StackConv
from stnls_tpu.agg.api import init, extract_config
