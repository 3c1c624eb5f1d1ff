"""PairedRefine: refinement variant of the paired search (reference
lib/stnls/search/paired_refine.py + paired_refine_kernel.cu): a wr x wr
lattice around each of the K given 2-d flows of a single frame pair."""

from functools import partial

import jax
import jax.numpy as jnp

from stnls_tpu.utils.config import extract_pairs
from stnls_tpu.ops.nls import refine_search_volume, dist_type_select
from stnls_tpu.ops import anchor as anchor_ops
from stnls_tpu.ops import topk as topk_ops
from stnls_tpu.search.utils import filter_k, paired_vids_refine
from stnls_tpu.search.paired_search import _shape_frames


def _paired_refine_pipeline(frame0, frame1, flows_k, cfg):
    B, HD, F, qH, qW = frame0.shape
    vid0 = frame0[:, :, None]
    vid1 = frame1[:, :, None]
    K2 = flows_k.shape[-2]
    nH = (qH - 1) // cfg["stride0"] + 1
    nW = (qW - 1) // cfg["stride0"] + 1
    # lift 2-d flows to 3-d with dt=0: [B,HD,T=1,nH,nW,K,3]
    fk = flows_k.reshape(B, HD, 1, nH, nW, K2, 2)
    fk3 = jnp.concatenate([jnp.zeros_like(fk[..., :1]), fk], axis=-1)
    from stnls_tpu.search.refinement import _use_cvr
    if _use_cvr(dict(cfg, pt=1, restricted_radius=False), qH, qW):
        # fast path: T=1 specialization of the refine cvr engine
        from stnls_tpu.ops.refine_cvr import refine_cvr_volume
        from stnls_tpu.utils.debug import emit_count_warning
        dists, inds3, outl = refine_cvr_volume(
            vid0, vid1, fk3, wr=cfg["wr"], ps=cfg["ps"],
            stride0=cfg["stride0"], stride1=cfg["stride1"],
            dist_type=cfg["dist_type"], dilation=cfg["dilation"],
            full_ws=cfg["full_ws"], use_adj=cfg["use_adj"],
            itype=cfg["itype"], flow_budget=cfg.get("flow_budget", 8),
            spread_budget=cfg.get("spread_budget", 8))
        emit_count_warning(
            jnp.sum(outl),
            "PairedRefine cvr path: edges exceeded flow_budget/"
            "spread_budget and carry init-valued dists")
    else:
        dists, inds3 = refine_search_volume(
            vid0, vid1, fk3, ws=cfg["ws"], wr=cfg["wr"], ps=cfg["ps"],
            stride0=cfg["stride0"], stride1=cfg["stride1"],
            dist_type=cfg["dist_type"], dilation=cfg["dilation"], pt=1,
            reflect_bounds_=cfg["reflect_bounds"], full_ws=cfg["full_ws"],
            use_adj=cfg["use_adj"], off_Hq=cfg["off_Hq"],
            off_Wq=cfg["off_Wq"], itype=cfg["itype"])
    wr = cfg["wr"]
    Q = nH * nW
    dists = jnp.transpose(dists, (0, 1, 2, 6, 7, 3, 4, 5)) \
        .reshape(B, HD, Q, K2, wr * wr)
    inds2 = jnp.transpose(inds3[1:], (0, 1, 2, 3, 7, 8, 4, 5, 6)) \
        .reshape(2, B, HD, Q, K2, wr * wr)

    self_action = cfg["self_action"]
    anchor_flag = (self_action is not None) and ("anchor" in self_action)
    if anchor_flag:
        fgrp = jnp.moveaxis(fk.reshape(B, HD, Q, K2, 2), -1, 0)
        dists, inds2, _ = anchor_ops.anchor_self_refine(
            dists, inds2, fgrp.astype(inds2.dtype))

    _, descending, _ = dist_type_select(cfg["dist_type"])
    k = cfg["k"]
    if cfg["topk_mode"] == "all":
        dists = dists.reshape(B, HD, Q, -1)
        inds2 = inds2.reshape(2, B, HD, Q, -1)
        dists, inds2 = topk_ops.topk(dists, inds2, k, descending,
                                     anchor=anchor_flag)
    elif cfg["topk_mode"] == "each":
        dists, inds2 = topk_ops.topk_each(dists, inds2, k, descending,
                                          anchor_self=anchor_flag)
    else:
        raise ValueError(f"Unknown topk_mode [{cfg['topk_mode']}]")

    dists = dists.reshape(B, HD, nH, nW, -1)
    inds = jnp.moveaxis(inds2.reshape(2, B, HD, nH, nW, -1), 0, -1)
    return dists, inds


class PairedRefine:

    def __init__(self, ws, wr, k, kr=-1, ps=1, nheads=1, dist_type="l2",
                 stride0=4, stride1=1, dilation=1, pt=1,
                 reflect_bounds=True, full_ws=True, self_action=None,
                 use_adj=False, normalize_bwd=False, k_agg=-1,
                 topk_mode="all", off_Hq=0, off_Wq=0, itype="float",
                 impl="auto", flow_budget=8, spread_budget=8):
        self.cfg = dict(
            ws=ws, wr=wr, k=k, kr=kr, ps=ps, nheads=nheads,
            dist_type=dist_type, stride0=stride0, stride1=stride1,
            dilation=dilation, pt=pt, reflect_bounds=reflect_bounds,
            full_ws=full_ws, self_action=self_action, use_adj=use_adj,
            normalize_bwd=normalize_bwd, k_agg=k_agg, topk_mode=topk_mode,
            off_Hq=off_Hq, off_Wq=off_Wq, itype=itype, impl=impl,
            flow_budget=flow_budget, spread_budget=spread_budget)
        for key, val in self.cfg.items():
            setattr(self, key, val)
        self._fn = jax.jit(
            partial(_paired_refine_pipeline, cfg=dict(self.cfg)))

    def __call__(self, frame0, frame1, flows_k):
        assert self.wr > 0, "Must have nonzero refinement window"
        frame0, frame1 = _shape_frames(self.nheads, [frame0, frame1])
        if flows_k.ndim == 5:  # [B,HD,Q,K,2]
            B, HD = flows_k.shape[:2]
        flows_k = filter_k(flows_k, self.kr)
        return self._fn(frame0, frame1, flows_k)

    forward = __call__

    def paired_vids(self, vid0, vid1, flows, wt, skip_self=False):
        return paired_vids_refine(self.forward, vid0, vid1, flows, wt,
                                  skip_self)

    def flops(self, T, F, H, W):
        nrefs = ((H - 1) // self.stride0 + 1) * ((W - 1) // self.stride0 + 1)
        return nrefs * self.wr * self.wr * 2 * F * self.ps * self.ps

    def radius(self, *args):
        return self.wr


def _apply(frame0, frame1, flows_k, ws, wr, k, kr=-1, ps=1, nheads=1,
           dist_type="l2", stride0=4, stride1=1, dilation=1, pt=1,
           reflect_bounds=True, full_ws=True, self_action=None,
           use_adj=False, normalize_bwd=False, k_agg=-1, topk_mode="all",
           off_Hq=0, off_Wq=0, itype="float"):
    search = PairedRefine(ws, wr, k, kr, ps, nheads, dist_type, stride0,
                          stride1, dilation, pt, reflect_bounds, full_ws,
                          self_action, use_adj, normalize_bwd, k_agg,
                          topk_mode, off_Hq, off_Wq, itype)
    return search(frame0, frame1, flows_k)


def extract_config(cfg, restrict=True):
    pairs = {"ws": -1, "wr": 1, "kr": -1, "ps": 1, "k": -1,
             "nheads": 1, "dist_type": "l2",
             "stride0": 4, "stride1": 1, "dilation": 1, "pt": 1,
             "reflect_bounds": True, "full_ws": True,
             "self_action": None, "use_adj": False,
             "normalize_bwd": False, "k_agg": -1, "topk_mode": "all",
             "off_Hq": 0, "off_Wq": 0, "itype": "float",
             "impl": "auto", "flow_budget": 8, "spread_budget": 8}
    return extract_pairs(cfg, pairs, restrict=restrict)


def init(cfg):
    cfg = extract_config(cfg, False)
    return PairedRefine(cfg.ws, cfg.wr, cfg.k, cfg.kr, cfg.ps, cfg.nheads,
                        cfg.dist_type, cfg.stride0, cfg.stride1,
                        cfg.dilation, cfg.pt, cfg.reflect_bounds,
                        cfg.full_ws, cfg.self_action, cfg.use_adj,
                        cfg.normalize_bwd, cfg.k_agg, cfg.topk_mode,
                        cfg.off_Hq, cfg.off_Wq, cfg.itype)
