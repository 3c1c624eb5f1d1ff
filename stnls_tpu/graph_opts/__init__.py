"""Graph-ops layer (reference lib/stnls/graph_opts): support machinery for
NonLocalScatter's race-free inversion — slot labels + slot-indexed
scatter/gather of per-edge tensors."""

from stnls_tpu.graph_opts import scatter_labels
from stnls_tpu.graph_opts import scatter_tensor
from stnls_tpu.graph_opts import gather_tensor
