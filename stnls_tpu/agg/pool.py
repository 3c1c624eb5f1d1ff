"""PooledPatchSum / WeightedPatchSum: weighted patch sum onto a
ps-upsampled grid (reference lib/stnls/agg/pool.py; pool_int_kernel.cu).

`WeightedPatchSum` is exported as the README-documented name
(README "stnls.agg.WeightedPatchSum"); in the reference's current tree the
live implementation of that role is PooledPatchSum (the module named
WeightedPatchSum only survives in legacy dev/ code), so here both names
share one implementation.
"""

from stnls_tpu.utils.config import extract_pairs
from stnls_tpu.ops.agg import nl_pool
from stnls_tpu.agg.utils import ensure_ndim6, ensure_flow_heads, expand_heads


def pooled_patch_sum(vid, weights, flows, ps=7, stride0=4, pt=1, dilation=1,
                     reflect_bounds=True, use_adj=False, itype="float"):
    flows = ensure_flow_heads(flows)
    HD = weights.shape[1]
    vid = ensure_ndim6(vid, HD)
    vid = expand_heads(vid, HD)
    flows = expand_heads(flows, HD)
    return nl_pool(vid, weights, flows, ps=ps, stride0=stride0, pt=pt,
                   dilation=dilation, reflect_bounds_=reflect_bounds,
                   use_adj=use_adj)


class PooledPatchSum:

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
        return pooled_patch_sum(vid, weights, flows, self.ps, self.stride0,
                                self.pt, self.dilation, self.reflect_bounds,
                                self.use_adj, self.itype)

    forward = __call__

    def flops(self, nrefs, chnls_per_head, nheads, k):
        return nrefs * chnls_per_head * nheads * k * (self.ps ** 2) * self.pt


WeightedPatchSum = PooledPatchSum


def extract_config(cfg, restrict=True):
    pairs = {"ps": 7, "stride0": 4, "pt": 1, "dilation": 1,
             "reflect_bounds": True, "use_adj": False, "itype": "float"}
    return extract_pairs(cfg, pairs, restrict=restrict)


def init(cfg):
    cfg = extract_config(cfg)
    return PooledPatchSum(cfg.ps, cfg.stride0, cfg.pt, cfg.dilation,
                          cfg.reflect_bounds, cfg.use_adj, cfg.itype)
