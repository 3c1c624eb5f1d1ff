"""NonLocalGather: weighted non-local patch stacking.

API parity with reference lib/stnls/agg/gather.py; compute in
stnls_tpu.ops.agg.nl_gather_stack (strided-slice adds instead of CUDA
atomicAdd — see ops/agg.py docstring). Differentiable in vid, weights, and
(float path) flows via jax.grad, replacing gather_{int,bilin2d}_backward.
"""

import jax.numpy as jnp

from stnls_tpu.utils.config import extract_pairs
from stnls_tpu.ops.agg import nl_gather_stack
from stnls_tpu.agg.utils import ensure_ndim6, ensure_flow_heads, expand_heads


def non_local_gather(vid, weights, flows, ps=7, stride0=4, pt=1,
                     reflect_bounds=True, dilation=1, use_adj=False,
                     itype="float"):
    """vid [B,(HD),T,F,H,W]; weights [B,HD,T,nH,nW,K] or [B,HD,Q,K];
    flows [...,K,3] -> stack [B,HD,K,T,F,H,W]."""
    flows = ensure_flow_heads(flows)
    HD = max(weights.shape[1], flows.shape[1])
    vid = ensure_ndim6(vid, HD)
    vid = expand_heads(vid, HD)
    flows = expand_heads(flows, HD)
    if itype == "int":
        flows = jnp.round(flows).astype(jnp.int32)
    return nl_gather_stack(
        vid, weights, flows, ps=ps, stride0=stride0, pt=pt,
        dilation=dilation, reflect_bounds_=reflect_bounds, use_adj=use_adj,
        itype=itype)


class NonLocalGather:
    """stacking = NonLocalGather(ps, stride0); stack = stacking(vid, weights,
    flows) (reference gather.py:263-276)."""

    def __init__(self, ps=7, stride0=4, pt=1, dilation=1,
                 reflect_bounds=True, use_adj=False, itype="float"):
        self.ps = ps
        self.stride0 = stride0
        self.pt = pt
        self.dilation = dilation
        self.reflect_bounds = reflect_bounds
        self.use_adj = use_adj
        self.itype = itype

    def __call__(self, vid, weights, flows):
        return non_local_gather(vid, weights, flows, self.ps, self.stride0,
                                self.pt, self.reflect_bounds, self.dilation,
                                self.use_adj, self.itype)

    forward = __call__

    def flops(self, nrefs, chnls_per_head, nheads, k):
        return nrefs * chnls_per_head * nheads * k * (self.ps ** 2) * self.pt


def extract_config(cfg, restrict=True):
    pairs = {"ps": 7, "stride0": 4, "pt": 1, "dilation": 1,
             "reflect_bounds": True, "use_adj": False, "itype": "float"}
    return extract_pairs(cfg, pairs, restrict=restrict)


def init(cfg):
    cfg = extract_config(cfg)
    return NonLocalGather(cfg.ps, cfg.stride0, cfg.pt, cfg.dilation,
                          cfg.reflect_bounds, cfg.use_adj, cfg.itype)
