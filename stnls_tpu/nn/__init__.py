"""NN-ops layer (reference lib/stnls/nn): flow composition, anchoring,
top-K, index utilities, and the composite attention modules."""

from stnls_tpu.nn.flow import (
    search_flow, accumulate_flow, run_accumulate_flow,
    extract_search_from_accumulated, index_grid,
)
from stnls_tpu.nn.anchor_self import (
    anchor_self, anchor_self_time, anchor_self_refine, anchor_self_paired,
)
from stnls_tpu.nn.topk import topk, topk_each, standard_topk, anchored_topk
from stnls_tpu.nn.non_local_inds import non_local_inds
from stnls_tpu.nn.non_local_attn import NonLocalAttention
from stnls_tpu.nn.non_local_attn_stack import NonLocalAttentionStack
