"""NonLocalScatterAdd: scatter-sum into an output video.

API parity with reference lib/stnls/agg/scatter_add.py; compute in
ops.agg.nl_scatter_add with deterministic `.at[].add` scatters replacing
the reference's atomicAdd (scatter_add_kernel.cu:114-139), plus a fused
Pallas fast path (ops/agg_pallas_sp.py) when the op runs at stride 1
(strideIn == strideOut == 1, pt == 1, default out size) — the dense
shift-sweep kernel, ~zero gathers/scatters (VERDICT r4 #4). The output
is left unnormalized like the reference (scatter_add.py:105-107).
"""

import jax
import jax.numpy as jnp

from stnls_tpu.utils.config import extract_pairs
from stnls_tpu.ops.agg import nl_scatter_add
from stnls_tpu.agg.utils import ensure_ndim6, ensure_flow_heads, expand_heads


def _pallas_ok(impl, ps, strideIn, strideOut, outH, outW, pt, dilation,
               reflect_bounds, budget, spread, H, W):
    from stnls_tpu.ops.agg_pallas_sp import sp_pallas_supported
    if impl not in ("auto", "pallas"):
        return False
    if impl == "auto" and jax.default_backend() != "tpu":
        return False
    nH = (H - 1) // strideIn + 1
    nW = (W - 1) // strideIn + 1
    ok = (strideIn == strideOut
          and strideIn * nH == H and strideIn * nW == W
          and outH in (0, H) and outW in (0, W)
          and sp_pallas_supported(ps=ps, stride0=strideIn,
                                  dilation=dilation,
                                  pt=pt, reflect_bounds_=reflect_bounds,
                                  budget=budget, spread=spread, H=H, W=W))
    if impl == "pallas":
        assert ok, "pallas scatter_add unsupported for this config"
    return ok


def non_local_scatter_add(vid, weights, flows, ps=7, strideIn=4, strideOut=4,
                          outH=0, outW=0, pt=1, dilation=1,
                          reflect_bounds=True, use_adj=False, itype="float",
                          impl="auto", budget="auto", spread="auto",
                          wt_hint=None):
    flows = ensure_flow_heads(flows)
    HD = weights.shape[1]
    vid = ensure_ndim6(vid, HD)
    vid = expand_heads(vid, HD)
    flows = expand_heads(flows, HD)
    H, W = vid.shape[-2:]
    if budget in ("auto", None) or spread in ("auto", None):
        from stnls_tpu.ops.agg_pallas import resolve_agg_budgets
        T = vid.shape[2]
        budget, spread = resolve_agg_budgets(
            jnp.round(flows), T=T, H=H, W=W, ps=ps, dilation=dilation,
            use_adj=use_adj, budget=budget, spread=spread,
            stride0=strideIn)
    if _pallas_ok(impl, ps, strideIn, strideOut, outH, outW, pt, dilation,
                  reflect_bounds, budget, spread, H, W):
        from stnls_tpu.ops.agg_pallas_sp import nl_scatter_add_pallas
        from stnls_tpu.utils.debug import emit_count_warning
        B, HD_, T = vid.shape[:3]
        K = flows.shape[-2]
        nH = (H - 1) // strideIn + 1
        nW = (W - 1) // strideIn + 1
        weights6 = weights.reshape(B, HD_, T, nH, nW, K)
        flows7 = flows.reshape(B, HD_, T, nH, nW, K, 3)
        # the reference skips "-1e8 invalid fill" entries; zero them so
        # the reflect-bound floor math never sees the sentinels
        finite = (jnp.abs(flows7[..., 1]) < 1e7) \
            & (jnp.abs(flows7[..., 2]) < 1e7)
        weights6 = jnp.where(finite, weights6, 0.)
        flows7 = jnp.where(finite[..., None], flows7, 0.)
        out, outl = nl_scatter_add_pallas(
            vid, weights6, flows7, ps=ps, stride0=strideIn,
            dilation=dilation,
            reflect_bounds_=reflect_bounds, use_adj=use_adj,
            budget=budget, spread=spread, wt_hint=wt_hint)
        # outliers live on the (possibly dilated) pixel grid; lift the
        # query-grid finite mask to match before filtering sentinels out
        fin_px = finite
        if nH != H:
            fin_px = jnp.repeat(jnp.repeat(finite, strideIn, axis=3),
                                strideIn, axis=4)[:, :, :, :H, :W]
        emit_count_warning(
            jnp.sum(outl & fin_px.transpose(0, 1, 5, 2, 3, 4)),
            f"NonLocalScatterAdd pallas path: edges exceeded budget="
            f"{budget}/spread={spread} and contribute zero")
        return out
    out, _ = nl_scatter_add(
        vid, weights, flows, ps=ps, strideIn=strideIn, strideOut=strideOut,
        pt=pt, dilation=dilation, reflect_bounds_=reflect_bounds,
        use_adj=use_adj, itype=itype, outH=outH, outW=outW)
    return out


class NonLocalScatterAdd:

    def __init__(self, ps=7, strideIn=4, strideOut=4, outH=0, outW=0, pt=1,
                 dilation=1, reflect_bounds=True, use_adj=False,
                 itype="float", impl="auto", budget="auto", spread="auto",
                 wt_hint=None):
        self.ps = ps
        self.strideIn = strideIn
        self.strideOut = strideOut
        self.outH = outH
        self.outW = outW
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
        from stnls_tpu.agg.gather import _sticky_budgets
        # scatter_add rounds flows (int path): resolve budgets on the
        # rounded offsets so the floor-based estimate matches the kernel
        budget, spread = _sticky_budgets(self, vid, jnp.round(flows),
                                         self.ps, self.dilation,
                                         self.use_adj,
                                         stride0=self.strideIn)
        return non_local_scatter_add(
            vid, weights, flows, self.ps, self.strideIn, self.strideOut,
            self.outH, self.outW, self.pt, self.dilation,
            self.reflect_bounds, self.use_adj, self.itype, self.impl,
            budget, spread, self.wt_hint)

    forward = __call__

    def flops(self, nrefs, chnls_per_head, nheads, k):
        return nrefs * chnls_per_head * nheads * k * (self.ps ** 2) * self.pt


def extract_config(cfg, restrict=True):
    pairs = {"ps": 7, "strideIn": 4, "strideOut": 4, "outH": 0, "outW": 0,
             "pt": 1, "dilation": 1, "reflect_bounds": True,
             "use_adj": False, "itype": "float"}
    return extract_pairs(cfg, pairs, restrict=restrict)


def init(cfg):
    cfg = extract_config(cfg)
    return NonLocalScatterAdd(cfg.ps, cfg.strideIn, cfg.strideOut, cfg.outH,
                              cfg.outW, cfg.pt, cfg.dilation,
                              cfg.reflect_bounds, cfg.use_adj, cfg.itype)
