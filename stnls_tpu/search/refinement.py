"""RefineSearch: second-stage refinement around K given per-query flows.

API parity with reference lib/stnls/search/refinement.py + impl/refinement.py:
re-search a wr x wr lattice (spacing stride1) around each of the Ks given
flows (optionally filtered to kr of them), anchor each group's entry closest
to its source flow, then top-K.

The reference's backward needs kselect/reflect bookkeeping recorded in the
forward kernel (refinement_bilin2d_kernel.cu:121-122,178,448-451) to route
flow gradients back to the chosen source flow with reflection signs; here
the whole pipeline is differentiable jnp, so jax.grad routes gradients
through the argmin/top-k selection automatically.
"""

import numpy as np
import jax
import jax.numpy as jnp

from stnls_tpu.utils.config import extract_pairs
from stnls_tpu.ops.nls import refine_search_volume, dist_type_select
from stnls_tpu.ops import anchor as anchor_ops
from stnls_tpu.ops import topk as topk_ops
from stnls_tpu.search.utils import shape_vids, filter_k
from functools import partial


def _use_cvr(cfg, H, W):
    from stnls_tpu.ops.refine_cvr import refine_cvr_supported
    impl = cfg.get("impl", "auto")
    if impl not in ("auto", "cvr"):
        return False
    ok = (cfg["pt"] == 1 and not cfg["restricted_radius"]
          and refine_cvr_supported(
              itype=cfg["itype"], pt=cfg["pt"], stride1=cfg["stride1"],
              reflect_bounds=cfg["reflect_bounds"], ps=cfg["ps"],
              dilation=cfg["dilation"], off_Hq=cfg["off_Hq"],
              off_Wq=cfg["off_Wq"], strideQ=None, stride0=cfg["stride0"],
              ws_interior=0, H=H, W=W))
    if impl == "cvr":
        assert ok, "cvr refine impl unsupported for this config"
        return True
    return ok and jax.default_backend() == "tpu"


def _refine_pipeline(vid0, vid1, flows_k, cfg):
    H, W = vid0.shape[-2:]
    if _use_cvr(cfg, H, W):
        # fast path: dense rebased correlation volume per (t, k) pair with
        # per-query frame masks (ops/refine_cvr.py)
        from stnls_tpu.ops.refine_cvr import refine_cvr_volume
        from stnls_tpu.utils.debug import emit_count_warning
        dists, inds3, outl = refine_cvr_volume(
            vid0, vid1, flows_k, wr=cfg["wr"], ps=cfg["ps"],
            stride0=cfg["stride0"], stride1=cfg["stride1"],
            dist_type=cfg["dist_type"], dilation=cfg["dilation"],
            full_ws=cfg["full_ws"], use_adj=cfg["use_adj"],
            itype=cfg["itype"], flow_budget=cfg.get("flow_budget", 8),
            spread_budget=cfg.get("spread_budget", 8))
        emit_count_warning(
            jnp.sum(outl),
            "RefineSearch cvr path: edges exceeded flow_budget/"
            "spread_budget and carry init-valued dists")
    else:
        dists, inds3 = refine_search_volume(
            vid0, vid1, flows_k, ws=cfg["ws"], wr=cfg["wr"], ps=cfg["ps"],
            stride0=cfg["stride0"], stride1=cfg["stride1"],
            dist_type=cfg["dist_type"], dilation=cfg["dilation"],
            pt=cfg["pt"], reflect_bounds_=cfg["reflect_bounds"],
            full_ws=cfg["full_ws"], use_adj=cfg["use_adj"],
            off_Hq=cfg["off_Hq"], off_Wq=cfg["off_Wq"],
            itype=cfg["itype"],
            restricted_radius=cfg["restricted_radius"])
    # dists [B,HD,T,Ks,wr,wr,nH,nW]
    B, HD, T, Ks, wr, _, nH, nW = dists.shape
    Q = T * nH * nW
    dists = jnp.transpose(dists, (0, 1, 2, 6, 7, 3, 4, 5)) \
        .reshape(B, HD, Q, Ks, wr * wr)
    inds3 = jnp.transpose(inds3, (0, 1, 2, 3, 7, 8, 4, 5, 6)) \
        .reshape(3, B, HD, Q, Ks, wr * wr)

    self_action = cfg["self_action"]
    assert self_action in (None, "anchor", "anchor_self", "anchor_each")
    anchor_flag = (self_action is not None) and ("anchor" in self_action)
    if anchor_flag:
        fk = jnp.moveaxis(flows_k.reshape(flows_k.shape[0],
                                          flows_k.shape[1], Q, Ks, 3), -1, 0)
        dists, inds3, _ = anchor_ops.anchor_self_refine(
            dists, inds3, fk.astype(inds3.dtype))

    _, descending, _ = dist_type_select(cfg["dist_type"])
    k = cfg["k"]
    if cfg["topk_mode"] == "all":
        dists = dists.reshape(B, HD, Q, -1)
        inds3 = inds3.reshape(3, B, HD, Q, -1)
        dists, inds3 = topk_ops.topk(dists, inds3, k, descending,
                                     anchor=anchor_flag)
    elif cfg["topk_mode"] == "each":
        dists, inds3 = topk_ops.topk_each(dists, inds3, k, descending,
                                          anchor_self=anchor_flag)
    else:
        raise ValueError(f"Unknown topk_mode [{cfg['topk_mode']}]")

    dists = dists.reshape(B, HD, T, nH, nW, -1)
    inds = jnp.moveaxis(inds3.reshape(3, B, HD, T, nH, nW, -1), 0, -1)
    return dists, inds


class RefineSearch:
    """search = RefineSearch(ws, wt, wr, k, kr, ps, ...);
    dists, inds = search(vid0, vid1, flows) with flows
    [B,HD,T,nH,nW,K,3] (or [B,HD,Q,K,3]) relative offsets.

    `restricted_radius` is accepted for API parity and has no effect —
    faithful to the reference, where the CUDA kernels never read the
    flag: refinement_int_kernel.cu:123-127 carries the radius-bound
    logic only as commented-out "[unused]" code and
    refinement_bilin2d_kernel.cu:131-133 likewise (the Python layer
    lib/stnls/search/refinement.py:145,170 merely threads it through).
    Verified behaviorally: tests/search/test_refinement.py asserts
    restricted_radius True/False produce identical results."""

    def __init__(self, ws, wt, wr, k, kr=-1, ps=1, nheads=1, stride0=4,
                 stride1=1, dilation=1, pt=1, dist_type="l2",
                 restricted_radius=False, reflect_bounds=True, full_ws=True,
                 self_action=None, use_adj=False, normalize_bwd=False,
                 k_agg=-1, topk_mode="all", off_Hq=0, off_Wq=0,
                 itype="float", impl="auto", flow_budget=8,
                 spread_budget=8):
        self.cfg = dict(
            ws=ws, wt=wt, wr=wr, k=k, kr=kr, ps=ps, nheads=nheads,
            stride0=stride0, stride1=stride1, dilation=dilation, pt=pt,
            dist_type=dist_type, restricted_radius=restricted_radius,
            reflect_bounds=reflect_bounds, full_ws=full_ws,
            self_action=self_action, use_adj=use_adj,
            normalize_bwd=normalize_bwd, k_agg=k_agg, topk_mode=topk_mode,
            off_Hq=off_Hq, off_Wq=off_Wq, itype=itype, impl=impl,
            flow_budget=flow_budget, spread_budget=spread_budget)
        for key, val in self.cfg.items():
            setattr(self, key, val)
        self._fn = jax.jit(partial(_refine_pipeline, cfg=dict(self.cfg)))

    def __call__(self, vid0, vid1, flows):
        vid0, vid1 = shape_vids(self.nheads, [vid0, vid1])
        B, HD, T, F, H, W = vid0.shape
        nH = (H - 1) // self.stride0 + 1
        nW = (W - 1) // self.stride0 + 1
        if flows.ndim == 5:  # [B,HD,Q,K,3]
            flows = flows.reshape(flows.shape[0], flows.shape[1], T, nH, nW,
                                  flows.shape[-2], 3)
        flows = filter_k(flows, self.kr)
        return self._fn(vid0, vid1, flows)

    forward = __call__

    def paired_vids(self, vid0, vid1, flows, wt, skip_self=False):
        from stnls_tpu.search.utils import paired_vids as _pv
        return _pv(self.forward, vid0, vid1, flows, wt, skip_self)

    def flops(self, T, F, H, W):
        nrefs = T * ((H - 1) // self.stride0 + 1) * ((W - 1) // self.stride0 + 1)
        nsearch = self.wr * self.wr * max(self.k, 1)
        return nrefs * nsearch * 2 * F * self.ps * self.ps * self.pt

    def radius(self, *args):
        return self.wr


def _apply(vid0, vid1, flows, ws, wt, wr, k, kr=-1, ps=1, nheads=1,
           stride0=4, stride1=1, dilation=1, pt=1, dist_type="l2",
           restricted_radius=False, reflect_bounds=True, full_ws=True,
           self_action=None, use_adj=False, normalize_bwd=False, k_agg=-1,
           topk_mode="all", off_Hq=0, off_Wq=0, itype="float"):
    search = RefineSearch(ws, wt, wr, k, kr, ps, nheads, stride0, stride1,
                          dilation, pt, dist_type, restricted_radius,
                          reflect_bounds, full_ws, self_action, use_adj,
                          normalize_bwd, k_agg, topk_mode, off_Hq, off_Wq,
                          itype)
    return search(vid0, vid1, flows)


def extract_config(cfg, restrict=True):
    pairs = {"ws": -1, "wt": -1, "wr": 1, "kr": -1, "ps": 1, "k": -1,
             "nheads": 1, "dist_type": "l2",
             "stride0": 4, "stride1": 1, "dilation": 1, "pt": 1,
             "restricted_radius": False,
             "reflect_bounds": True, "full_ws": True,
             "self_action": None, "use_adj": False,
             "normalize_bwd": False, "k_agg": -1, "topk_mode": "all",
             "off_Hq": 0, "off_Wq": 0, "itype": "float",
             "impl": "auto", "flow_budget": 8, "spread_budget": 8}
    return extract_pairs(cfg, pairs, restrict=restrict)


def init(cfg):
    cfg = extract_config(cfg, False)
    return RefineSearch(cfg.ws, cfg.wt, cfg.wr, cfg.k, cfg.kr, cfg.ps,
                        cfg.nheads, cfg.stride0, cfg.stride1, cfg.dilation,
                        cfg.pt, cfg.dist_type, cfg.restricted_radius,
                        cfg.reflect_bounds, cfg.full_ws, cfg.self_action,
                        cfg.use_adj, cfg.normalize_bwd, cfg.k_agg,
                        cfg.topk_mode, cfg.off_Hq, cfg.off_Wq, cfg.itype,
                        cfg.impl, cfg.flow_budget, cfg.spread_budget)
