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


def _pallas_ok(impl, ps, stride0, pt, dilation, reflect_bounds, budget,
               spread, H, W, F):
    import jax
    from stnls_tpu.ops.agg_pallas_sp import pool_pallas_supported
    if impl not in ("auto", "pallas"):
        return False
    if impl == "auto" and jax.default_backend() != "tpu":
        return False
    ok = pool_pallas_supported(ps=ps, stride0=stride0, dilation=dilation,
                               pt=pt, reflect_bounds_=reflect_bounds,
                               budget=budget, spread=spread, H=H, W=W, F=F)
    if impl == "pallas":
        assert ok, "pallas pool unsupported for this config"
    return ok


def pooled_patch_sum(vid, weights, flows, ps=7, stride0=4, pt=1, dilation=1,
                     reflect_bounds=True, use_adj=False, itype="float",
                     impl="auto", budget="auto", spread="auto",
                     wt_hint=None):
    import jax.numpy as jnp
    flows = ensure_flow_heads(flows)
    HD = weights.shape[1]
    vid = ensure_ndim6(vid, HD)
    vid = expand_heads(vid, HD)
    flows = expand_heads(flows, HD)
    H, W = vid.shape[-2:]
    F = vid.shape[3]
    if budget in ("auto", None) or spread in ("auto", None):
        from stnls_tpu.ops.agg_pallas import resolve_agg_budgets
        T = vid.shape[2]
        ps_odd = ps + (1 - ps % 2)
        budget, spread = resolve_agg_budgets(
            jnp.round(flows), T=T, H=H, W=W, ps=ps_odd, dilation=dilation,
            use_adj=use_adj, budget=budget, spread=spread,
            stride0=stride0)
    if _pallas_ok(impl, ps, stride0, pt, dilation, reflect_bounds,
                  budget, spread, H, W, F):
        from stnls_tpu.ops.agg_pallas_sp import nl_pool_pallas
        from stnls_tpu.utils.debug import emit_count_warning
        B, HD_, T = vid.shape[:3]
        K = flows.shape[-2]
        weights6 = weights.reshape(B, HD_, T, H, W, K)
        flows7 = flows.reshape(B, HD_, T, H, W, K, 3)
        finite = (jnp.abs(flows7[..., 1]) < 1e7) \
            & (jnp.abs(flows7[..., 2]) < 1e7)
        weights6 = jnp.where(finite, weights6, 0.)
        flows7 = jnp.where(finite[..., None], flows7, 0.)
        out, outl = nl_pool_pallas(
            vid, weights6, flows7, ps=ps, dilation=dilation,
            reflect_bounds_=reflect_bounds, use_adj=use_adj,
            budget=budget, spread=spread, wt_hint=wt_hint)
        emit_count_warning(
            jnp.sum(outl & finite.transpose(0, 1, 5, 2, 3, 4)),
            f"PooledPatchSum pallas path: edges exceeded budget="
            f"{budget}/spread={spread} and contribute zero")
        return out
    return nl_pool(vid, weights, flows, ps=ps, stride0=stride0, pt=pt,
                   dilation=dilation, reflect_bounds_=reflect_bounds,
                   use_adj=use_adj)


class PooledPatchSum:

    def __init__(self, ps=7, stride0=4, pt=1, dilation=1,
                 reflect_bounds=True, use_adj=False, itype="float",
                 impl="auto", budget="auto", spread="auto", wt_hint=None):
        self.ps = ps
        self.stride0 = stride0
        self.pt = pt
        self.dilation = dilation
        self.reflect_bounds = reflect_bounds
        self.use_adj = use_adj
        self.itype = itype
        self.impl = impl
        self.budget = budget
        self.spread = spread
        self.wt_hint = wt_hint

    def __call__(self, vid, weights, flows):
        import jax.numpy as jnp
        from stnls_tpu.agg.gather import _sticky_budgets
        budget, spread = _sticky_budgets(
            self, vid, jnp.round(flows), self.ps + (1 - self.ps % 2),
            self.dilation, self.use_adj, stride0=self.stride0)
        return pooled_patch_sum(vid, weights, flows, self.ps, self.stride0,
                                self.pt, self.dilation, self.reflect_bounds,
                                self.use_adj, self.itype, self.impl,
                                budget, spread, self.wt_hint)

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
