"""NonLocalGather: weighted non-local patch stacking.

API parity with reference lib/stnls/agg/gather.py. Two compute paths:
the fused Pallas kernel (ops/agg_pallas.py — dense one-hot shift sweep,
zero gathers/scatters, VMEM accumulator; default on TPU) and the
strided-slice jnp engine (ops/agg.py — reference/fallback everywhere).
Differentiable in vid, weights, and (float path) flows, replacing
gather_{int,bilin2d}_backward; both paths are deterministic (the CUDA
atomicAdd backward is not).

The Pallas path aggregates offsets up to `budget` pixels with per-tile
row spread up to `spread` (out-of-budget edges contribute zero, same
contract as the search kernel's flow_budget); impl="pallas" forces it,
impl="jnp" forces the fallback, "auto" picks Pallas on TPU when the
geometry fits.
"""

import jax
import jax.numpy as jnp

from stnls_tpu.utils.config import extract_pairs
from stnls_tpu.ops.agg import nl_gather_stack
from stnls_tpu.agg.utils import ensure_ndim6, ensure_flow_heads, expand_heads


def _pallas_ok(impl, ps, stride0, pt, dilation, reflect_bounds, budget,
               spread, H, W):
    from stnls_tpu.ops.agg_pallas import agg_pallas_supported
    if impl not in ("auto", "pallas"):
        return False
    if impl == "auto" and jax.default_backend() != "tpu":
        return False
    ok = agg_pallas_supported(ps=ps, stride0=stride0, dilation=dilation,
                              pt=pt, reflect_bounds_=reflect_bounds,
                              budget=budget, spread=spread, H=H, W=W)
    if impl == "pallas":
        assert ok, "pallas agg unsupported for this config"
    return ok


def non_local_gather(vid, weights, flows, ps=7, stride0=4, pt=1,
                     reflect_bounds=True, dilation=1, use_adj=False,
                     itype="float", impl="auto", budget="auto",
                     spread="auto", wt_hint=None, tile=None):
    """vid [B,(HD),T,F,H,W]; weights [B,HD,T,nH,nW,K] or [B,HD,Q,K];
    flows [...,K,3] -> stack [B,HD,K,T,F,H,W]."""
    flows = ensure_flow_heads(flows)
    HD = max(weights.shape[1], flows.shape[1])
    vid = ensure_ndim6(vid, HD)
    vid = expand_heads(vid, HD)
    flows = expand_heads(flows, HD)
    if itype == "int":
        flows = jnp.round(flows).astype(jnp.int32)
    H, W = vid.shape[-2:]
    B, HD_, T = vid.shape[:3]
    nH = (H - 1) // stride0 + 1
    nW = (W - 1) // stride0 + 1
    K = flows.shape[-2]
    if budget in ("auto", None) or spread in ("auto", None):
        from stnls_tpu.ops.agg_pallas import resolve_agg_budgets
        budget, spread = resolve_agg_budgets(
            flows, T=T, H=H, W=W, ps=ps, dilation=dilation,
            use_adj=use_adj, budget=budget, spread=spread,
            stride0=stride0)
    if _pallas_ok(impl, ps, stride0, pt, dilation, reflect_bounds, budget,
                  spread, H, W):
        from stnls_tpu.ops.agg_pallas import nl_gather_stack_pallas
        from stnls_tpu.utils.debug import emit_count_warning
        weights6 = weights.reshape(B, HD_, T, nH, nW, K)
        flows7 = flows.reshape(B, HD_, T, nH, nW, K, 3)
        stack, outl = nl_gather_stack_pallas(
            vid, weights6, flows7, ps=ps, stride0=stride0, pt=pt,
            dilation=dilation, reflect_bounds_=reflect_bounds,
            use_adj=use_adj, itype=itype, budget=budget, spread=spread,
            wt_hint=wt_hint, tile=tile)
        emit_count_warning(
            jnp.sum(outl),
            f"NonLocalGather pallas path: edges exceeded budget={budget}/"
            f"spread={spread} and contribute zero; raise the budgets")
        return stack
    return nl_gather_stack(
        vid, weights, flows, ps=ps, stride0=stride0, pt=pt,
        dilation=dilation, reflect_bounds_=reflect_bounds, use_adj=use_adj,
        itype=itype)


def _sticky_budgets(module, vid, flows, ps, dilation, use_adj,
                    stride0=1):
    """Sticky auto-budget resolution for agg modules: budgets resolved
    from concrete flows are remembered on the module, so a later jitted
    call (traced flows, nothing to resolve from) reuses them instead of
    the legacy fallback. Warm up with one eager call before jitting."""
    import jax
    import jax.numpy as jnp
    budget, spread = module.budget, module.spread
    want = (budget in ("auto", None)) or (spread in ("auto", None))
    if not want:
        return budget, spread
    if isinstance(jnp.asarray(flows), jax.core.Tracer):
        got = getattr(module, "_resolved", None)
        if got is not None:
            rb, rs = got
            return (rb if budget in ("auto", None) else budget,
                    rs if spread in ("auto", None) else spread)
        return budget, spread
    from stnls_tpu.ops.agg_pallas import resolve_agg_budgets
    T, H, W = vid.shape[-4], vid.shape[-2], vid.shape[-1]
    rb, rs = resolve_agg_budgets(flows, T=T, H=H, W=W, ps=ps,
                                 dilation=dilation, use_adj=use_adj,
                                 budget=budget, spread=spread,
                                 stride0=stride0)
    module._resolved = (rb, rs)
    return rb, rs


class NonLocalGather:
    """stacking = NonLocalGather(ps, stride0); stack = stacking(vid, weights,
    flows) (reference gather.py:263-276)."""

    def __init__(self, ps=7, stride0=4, pt=1, dilation=1,
                 reflect_bounds=True, use_adj=False, itype="float",
                 impl="auto", budget="auto", spread="auto", wt_hint=None,
                 tile=None):
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
        self.tile = tile

    def __call__(self, vid, weights, flows):
        budget, spread = _sticky_budgets(self, vid, flows, self.ps,
                                         self.dilation, self.use_adj,
                                         stride0=self.stride0)
        return non_local_gather(vid, weights, flows, self.ps, self.stride0,
                                self.pt, self.reflect_bounds, self.dilation,
                                self.use_adj, self.itype, self.impl,
                                budget, spread, self.wt_hint, self.tile)

    forward = __call__

    def flops(self, nrefs, chnls_per_head, nheads, k):
        return nrefs * chnls_per_head * nheads * k * (self.ps ** 2) * self.pt


def extract_config(cfg, restrict=True):
    pairs = {"ps": 7, "stride0": 4, "pt": 1, "dilation": 1,
             "reflect_bounds": True, "use_adj": False, "itype": "float",
             "impl": "auto", "agg_budget": "auto", "agg_spread": "auto",
             "wt_hint": None}
    return extract_pairs(cfg, pairs, restrict=restrict)


def init(cfg):
    cfg = extract_config(cfg)
    return NonLocalGather(cfg.ps, cfg.stride0, cfg.pt, cfg.dilation,
                          cfg.reflect_bounds, cfg.use_adj, cfg.itype,
                          impl=cfg.impl, budget=cfg.agg_budget,
                          spread=cfg.agg_spread, wt_hint=cfg.wt_hint)
