"""PairedSearch: single-frame-pair search (reference
lib/stnls/search/paired_search.py + paired_search_kernel.cu).

Searches a ws x ws lattice in frame1 around flow-shifted centers of frame0's
query grid; 2-d offsets out. The building block for frame-streaming search
via `paired_vids` (search/utils.py:339-382) — the natural unit for temporal
sharding. Implemented as the T=1 specialization of the shared lattice
engine (ops/nls.py), with the given flow applied at the single time slot.
"""

from functools import partial

import jax
import jax.numpy as jnp

from stnls_tpu.utils.config import extract_pairs
from stnls_tpu.ops.nls import nls_search_volume, dist_type_select
from stnls_tpu.ops import anchor as anchor_ops
from stnls_tpu.ops import topk as topk_ops
from stnls_tpu.search.utils import paired_vids as _paired_vids


def _shape_frames(nheads, frames):
    out = []
    for f in frames:
        assert f.ndim in (4, 5)
        if f.ndim == 4:
            B, C, H, W = f.shape
            assert C % nheads == 0
            f = f.reshape(B, nheads, C // nheads, H, W)
        out.append(f)
    return out


def _use_cvr(cfg, H, W):
    from stnls_tpu.ops.nls_cvr import cvr_supported
    impl = cfg.get("impl", "auto")
    if impl not in ("auto", "cvr"):
        return False
    ok = cvr_supported(
        itype=cfg["itype"], pt=1, stride1=cfg["stride1"],
        reflect_bounds=cfg["reflect_bounds"], ps=cfg["ps"],
        dilation=cfg["dilation"], off_Hq=cfg["off_Hq"],
        off_Wq=cfg["off_Wq"], strideQ=None, stride0=cfg["stride0"],
        ws_interior=0, H=H, W=W)
    if impl == "cvr":
        assert ok, "cvr impl unsupported for this config"
        return True
    return ok and jax.default_backend() == "tpu"


def _paired_pipeline(frame0, frame1, flow, cfg):
    B, HD, F, qH, qW = frame0.shape
    vid0 = frame0[:, :, None]  # T=1
    vid1 = frame1[:, :, None]
    flows = flow[:, :, None, None]  # [B,HD,T=1,W_t=1,2,nH,nW]
    kw = dict(ws=cfg["ws"], wt=0, ps=cfg["ps"], stride0=cfg["stride0"],
              stride1=cfg["stride1"], dist_type=cfg["dist_type"],
              dilation=cfg["dilation"], full_ws=cfg["full_ws"],
              use_adj=cfg["use_adj"], itype=cfg["itype"])
    if _use_cvr(cfg, qH, qW):
        # fast path: paired search IS the T=1/wt=0 NLS with vid1 as the
        # key frame (reference paired_search_kernel.cu computes the same
        # per-cell distances as nls with the window on frame1)
        from stnls_tpu.ops.nls_cvr import nls_cvr_volume
        from stnls_tpu.utils.debug import emit_count_warning
        dists, inds3, outl = nls_cvr_volume(
            vid0, vid1, flows,
            flow_budget=cfg.get("flow_budget", 8),
            spread_budget=cfg.get("spread_budget", 8), **kw)
        emit_count_warning(
            jnp.sum(outl),
            "PairedSearch cvr path: queries exceeded flow_budget/"
            "spread_budget and carry init-valued dists")
    else:
        dists, inds3 = nls_search_volume(
            vid0, vid1, flows, pt=1,
            reflect_bounds_=cfg["reflect_bounds"],
            off_Hq=cfg["off_Hq"], off_Wq=cfg["off_Wq"], **kw)
    # [B,HD,1,1,ws,ws,nH,nW] -> [B,HD,Q,ws*ws] with 2-d offsets
    ws = cfg["ws"]
    nH, nW = dists.shape[-2:]
    Q = nH * nW
    dists = jnp.transpose(dists, (0, 1, 2, 6, 7, 3, 4, 5)) \
        .reshape(B, HD, Q, ws * ws)
    inds2 = jnp.transpose(inds3[1:], (0, 1, 2, 3, 7, 8, 4, 5, 6)) \
        .reshape(2, B, HD, Q, ws * ws)

    self_action = cfg["self_action"]
    assert self_action in (None, "anchor", "anchor_each")
    anchor_flag = (self_action is not None) and ("anchor" in self_action)
    if anchor_flag:
        # anchor the entry closest to the given flow (dH,dW order,
        # paired_search impl:66-73 flips the flow components)
        fk = jnp.stack([flow[:, :, 1], flow[:, :, 0]], 0) \
            .reshape(2, B, HD, Q)[..., None]  # [2,B,HD,Q,G=1]
        d = dists[..., None, :]  # group axis G=1
        i2 = inds2[..., None, :]
        d, i2, _ = anchor_ops.anchor_self_refine(
            d, i2, fk.astype(i2.dtype))
        dists = d[..., 0, :]
        inds2 = i2[..., 0, :]

    _, descending, _ = dist_type_select(cfg["dist_type"])
    if cfg["k"] > 0:
        dists, inds2 = topk_ops.topk(dists, inds2, cfg["k"], descending,
                                     anchor=anchor_flag)
    dists = dists.reshape(B, HD, nH, nW, -1)
    inds = jnp.moveaxis(inds2.reshape(2, B, HD, nH, nW, -1), 0, -1)
    return dists, inds


class PairedSearch:
    """dists, inds = search(frame0, frame1, flow); frames [B,(HD),C,H,W],
    flow [B,HD,2,nH,nW]; inds [B,HD,nH,nW,K,2]."""

    def __init__(self, ws, ps=1, k=-1, nheads=1, dist_type="l2", stride0=4,
                 stride1=1, dilation=1, pt=1, reflect_bounds=True,
                 full_ws=True, self_action=None, use_adj=False,
                 normalize_bwd=False, k_agg=-1, off_Hq=0, off_Wq=0,
                 itype="float", impl="auto", flow_budget="auto",
                 spread_budget=8):
        self.cfg = dict(
            ws=ws, ps=ps, k=k, nheads=nheads, dist_type=dist_type,
            stride0=stride0, stride1=stride1, dilation=dilation, pt=pt,
            reflect_bounds=reflect_bounds, full_ws=full_ws,
            self_action=self_action, use_adj=use_adj,
            normalize_bwd=normalize_bwd, k_agg=k_agg, off_Hq=off_Hq,
            off_Wq=off_Wq, itype=itype, impl=impl,
            flow_budget=flow_budget, spread_budget=spread_budget)
        for key, val in self.cfg.items():
            setattr(self, key, val)
        # flow_budget="auto" resolves per call from the concrete flow;
        # cache one jitted pipeline per resolved bucket
        self._fns = {}

    def _get_fn(self, budget):
        if budget not in self._fns:
            self._fns[budget] = jax.jit(partial(
                _paired_pipeline,
                cfg=dict(self.cfg, flow_budget=budget)))
        return self._fns[budget]

    def __call__(self, frame0, frame1, flow):
        from stnls_tpu.search.non_local_search import resolve_flow_budget
        assert self.ws > 0, "Must have nonzero spatial search window"
        frame0, frame1 = _shape_frames(self.nheads, [frame0, frame1])
        if flow.ndim == 4:
            flow = flow[:, None]
        return self._get_fn(
            resolve_flow_budget(self.flow_budget, flow))(
            frame0, frame1, flow)

    forward = __call__

    def paired_vids(self, vid0, vid1, flows, wt, skip_self=False):
        return _paired_vids(self.forward, vid0, vid1, flows, wt, skip_self)

    def flops(self, T, F, H, W):
        nrefs = ((H - 1) // self.stride0 + 1) * ((W - 1) // self.stride0 + 1)
        return nrefs * self.ws * self.ws * 2 * F * self.ps * self.ps

    def radius(self, *args):
        return self.ws


def _apply(frame0, frame1, flow, ws, ps=1, k=-1, nheads=1, dist_type="l2",
           stride0=4, stride1=1, dilation=1, pt=1, reflect_bounds=True,
           full_ws=True, self_action=None, use_adj=False,
           normalize_bwd=False, k_agg=-1, off_Hq=0, off_Wq=0, itype="float"):
    search = PairedSearch(ws, ps, k, nheads, dist_type, stride0, stride1,
                          dilation, pt, reflect_bounds, full_ws, self_action,
                          use_adj, normalize_bwd, k_agg, off_Hq, off_Wq,
                          itype)
    return search(frame0, frame1, flow)


def extract_config(cfg, restrict=True):
    pairs = {"ws": -1, "ps": 1, "k": -1,
             "nheads": 1, "dist_type": "l2",
             "stride0": 4, "stride1": 1, "dilation": 1, "pt": 1,
             "reflect_bounds": True, "full_ws": True,
             "self_action": None, "use_adj": False,
             "normalize_bwd": False, "k_agg": -1,
             "off_Hq": 0, "off_Wq": 0, "itype": "float",
             "impl": "auto", "flow_budget": "auto", "spread_budget": 8}
    return extract_pairs(cfg, pairs, restrict=restrict)


def init(cfg):
    cfg = extract_config(cfg, False)
    return PairedSearch(cfg.ws, cfg.ps, cfg.k, cfg.nheads, cfg.dist_type,
                        cfg.stride0, cfg.stride1, cfg.dilation, cfg.pt,
                        cfg.reflect_bounds, cfg.full_ws, cfg.self_action,
                        cfg.use_adj, cfg.normalize_bwd, cfg.k_agg,
                        cfg.off_Hq, cfg.off_Wq, cfg.itype, cfg.impl,
                        cfg.flow_budget, cfg.spread_budget)
