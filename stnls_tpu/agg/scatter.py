"""NonLocalScatter: scatter query patches to their K non-local locations,
deduplicated into S "neighborhood slots" via precomputed labels.

API parity with reference lib/stnls/agg/scatter.py + scatter_int_kernel.cu
(int-only, asserted at scatter.py:241). The reference needs the labels to
avoid atomicAdd races; here `.at[].add` is already deterministic, and the
labels define the slot axis of the output as documented:

    stack[b,hd,s,t,:,nl_ij] += w[q,k] * vid[b,hd,ref_t,:,ref_ij]
    mask[b,hd,s,t,0,nl_ij] = 1       for the edge (q,k) with label s,

normalized by the query-patch fold counts (scatter.py:128-129).
"""

import numpy as np
import jax.numpy as jnp

from stnls_tpu.utils.config import extract_pairs
from stnls_tpu.ops.geometry import reflect_bounds as _reflect, in_bounds, num_queries
from stnls_tpu.ops.agg import patch_overlap_counts
from stnls_tpu.agg.utils import ensure_ndim6, ensure_flow_heads, expand_heads


def non_local_scatter(vid, weights, flows_k, labels, ps=7, stride0=4, pt=1,
                      reflect_bounds=True, dilation=1, use_adj=False,
                      itype="int", S=None):
    reflect_bounds_ = reflect_bounds
    flows_k = ensure_flow_heads(flows_k)
    HD = flows_k.shape[1]
    vid = ensure_ndim6(vid, HD)
    vid = expand_heads(vid, HD)
    B, HD, T, F, H, W = vid.shape
    K = flows_k.shape[-2]
    nH, nW = num_queries(H, W, stride0)
    patch_offset = 0 if use_adj else -(ps // 2)
    # pass S statically (graph_opts.scatter_labels.slot_bound) to stay
    # jittable; fallback matches the reference's labels.max()+1 host sync
    if S is None:
        S = int(jnp.max(labels)) + 1
    flows_k = jnp.round(flows_k).astype(jnp.int32) \
        if jnp.issubdtype(flows_k.dtype, jnp.floating) else flows_k
    weights = weights.reshape(B, HD, T, nH, nW, K)
    flows_k = flows_k.reshape(B, HD, T, nH, nW, K, 3)
    labels = labels.reshape(B, HD, T, nH, nW, K)

    t = jnp.arange(T, dtype=jnp.int32)[None, None, :, None, None, None]
    h = (jnp.arange(nH, dtype=jnp.int32) * stride0)[None, None, None, :, None, None]
    w = (jnp.arange(nW, dtype=jnp.int32) * stride0)[None, None, None, None, :, None]
    nl_t = _reflect(t + flows_k[..., 0], T)
    nl_h = _reflect(h + flows_k[..., 1], H)
    nl_w = _reflect(w + flows_k[..., 2], W)

    vid_cf = vid.reshape(B, HD, T, F, H * W).transpose(0, 1, 3, 2, 4) \
        .reshape(B, HD, F, T * H * W)
    n = T * nH * nW * K
    stack_flat = jnp.zeros((B, HD, F, S * T * H * W + 1), vid.dtype)
    mask_flat = jnp.zeros((B, HD, S * T * H * W + 1), vid.dtype)
    bi = jnp.arange(B)[:, None, None, None]
    hi_ = jnp.arange(HD)[None, :, None, None]
    fi = jnp.arange(F)[None, None, :, None]
    bi2 = jnp.arange(B)[:, None, None]
    hi2 = jnp.arange(HD)[None, :, None]

    for pk in range(pt):
        rt = _reflect(t + pk, T)
        nt = _reflect(nl_t + pk, T)
        for pi in range(ps):
            dHp = dilation * (pi + patch_offset)
            rh = h + dHp  # ref not reflected (scatter_int.cu:42-43)
            sh = nl_h + dHp
            if reflect_bounds_:
                sh = _reflect(sh, H)
            for pj in range(ps):
                dWp = dilation * (pj + patch_offset)
                rw = w + dWp
                sw = nl_w + dWp
                if reflect_bounds_:
                    sw = _reflect(sw, W)
                ok = (in_bounds(rh, H) & in_bounds(rw, W)
                      & in_bounds(sh, H) & in_bounds(sw, W))
                ridx = (rt * H + jnp.clip(rh, 0, H - 1)) * W \
                    + jnp.clip(rw, 0, W - 1)
                ridx = jnp.broadcast_to(ridx, (B, HD, T, nH, nW, K))
                pix = jnp.take_along_axis(
                    vid_cf, ridx.reshape(B, HD, 1, n), axis=3) \
                    .reshape(B, HD, F, T, nH, nW, K)
                val = pix * weights[:, :, None]
                val = jnp.where(ok[:, :, None], val, 0.)
                sidx = ((labels * T + nt) * H + jnp.clip(sh, 0, H - 1)) * W \
                    + jnp.clip(sw, 0, W - 1)
                sidx = jnp.where(jnp.broadcast_to(ok, sidx.shape), sidx,
                                 S * T * H * W)
                sidx_f = sidx.reshape(B, HD, 1, n)
                stack_flat = stack_flat.at[bi, hi_, fi, sidx_f].add(
                    val.reshape(B, HD, F, n))
                mask_flat = mask_flat.at[bi2, hi2, sidx.reshape(B, HD, n)] \
                    .set(1.)

    stack = stack_flat[..., :-1].reshape(B, HD, F, S, T, H, W) \
        .transpose(0, 1, 3, 4, 2, 5, 6)  # [B,HD,S,T,F,H,W]
    mask = mask_flat[..., :-1].reshape(B, HD, S, T, 1, H, W)
    counts = jnp.asarray(
        patch_overlap_counts(H, W, ps, stride0, dilation, use_adj), vid.dtype)
    stack = stack / (counts + 1e-10)
    return stack, mask


class NonLocalScatter:

    def __init__(self, ps, stride0, pt=1, dilation=1, reflect_bounds=True,
                 use_adj=False, itype="int", S=None):
        assert itype == "int", "Must use int search."
        self.ps = ps
        self.stride0 = stride0
        self.pt = pt
        self.dilation = dilation
        self.reflect_bounds = reflect_bounds
        self.use_adj = use_adj
        self.itype = itype
        self.S = S

    def __call__(self, vid, weights, flows_k, labels):
        return non_local_scatter(vid, weights, flows_k, labels, self.ps,
                                 self.stride0, self.pt, self.reflect_bounds,
                                 self.dilation, self.use_adj, self.itype,
                                 S=self.S)

    forward = __call__


def _apply(vid, weights, flows, labels, ps=1, stride0=1, pt=1,
           reflect_bounds=True, dilation=1, use_adj=False, itype="int"):
    return non_local_scatter(vid, weights, flows, labels, ps, stride0, pt,
                             reflect_bounds, dilation, use_adj, itype)


def extract_config(cfg, restrict=True):
    pairs = {"ps": 3, "ws": -1, "stride0": 1, "pt": 1,
             "reflect_bounds": True, "dilation": 1, "use_adj": False,
             "itype": "int"}
    return extract_pairs(cfg, pairs, restrict=restrict)


def init(cfg):
    cfg = extract_config(cfg, False)
    return NonLocalScatter(cfg.ps, cfg.stride0, cfg.pt, cfg.dilation,
                           cfg.reflect_bounds, cfg.use_adj, cfg.itype)
