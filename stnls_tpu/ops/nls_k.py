"""Sparse top-K re-evaluation of search distances (the TPU analog of the
reference's K-sparse backward).

The reference never backprops through the full W_t*ws*ws search volume:
its backward kernels take grad_dists/grad_inds at the K *selected*
entries and touch only those patches (lib/stnls/search/impl/
non_local_search.py:142-212, non_local_search_int_kernel.cu:382-440,
nls_bilin2d.cu:189-291). A dense TPU engine that recomputes the whole
volume in backward does ~W_t*ws^2/K times too much work.

This module mirrors the reference's structure functionally: given the
selected window cells (integer ids, chosen under stop_gradient by any
fast forward engine), `nls_dists_at_cells` recomputes ONLY those K
distances with plain differentiable jnp — one patch_gather for the key
patches (fast TPU gather layout, ops/pgather.py) plus static strided
slices for the query patches. `jax.grad` through it reproduces exactly
the reference's three backward kernels:

  * grad_vid0: weighted key patches scattered at query taps — here the
    transpose of the static v0 slices (strided-slice adds);
  * grad_vid1: query patches scattered at the K bilinear corners — here
    patch_gather's windowed scatter_add VJP (deterministic; the CUDA
    atomicAdd is not);
  * grad_flows: bilinear-weight chain rule with reflection sign flips
    (shared_kernel.cu:918-965) — here autodiff through the explicit
    corner-weight lerp and the piecewise-linear reflect_bounds.

Selection-vs-value contract: the forward engine only *selects* cells;
the values (and every gradient) come from this exact recompute. Engine
approximations (pallas flow budgets) can therefore affect which cells
win, never the reported distance of a winner.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from stnls_tpu.ops.geometry import (
    reflect_bounds, in_bounds, num_queries, time_window_frames,
    search_offsets,
)
from stnls_tpu.ops.nls import dist_type_select, _expand_flow_heads
from stnls_tpu.ops.pgather import patch_gather, pad_frames_cf


def _select_slot(x_wt, st):
    """x_wt [B,HD,T,W_t,nH,nW] -> [B,HD,T,nH,nW,K] selecting slot st per
    (query, k). One-hot sum over the tiny W_t axis (a take_along_axis
    here risks the scalarized-gather path on TPU)."""
    W_t = x_wt.shape[3]
    xt = jnp.moveaxis(x_wt, 3, -1)          # [B,HD,T,nH,nW,W_t]
    out = 0.
    for s in range(W_t):
        out = out + jnp.where(st == s, xt[..., s][..., None], 0.)
    return out


def search_aux(vid_shape, flows, *, ws, wt, stride0, stride1, itype="float",
               full_ws=True):
    """Separable offset factors of the search volume (geometry only, no
    video reads): aux dict(dt_tab [T,W_t], dh [B,HD,T,W_t,ws,nH,nW],
    dw likewise, cdtype) — the same aux ops.nls_pallas.nls_pallas_volume
    returns, for engines that don't. Feeds the lazy top-K
    (search.non_local_search._pallas_topk_aux) and the sparse-K grad
    path."""
    B, HD, T, F, H, W = vid_shape
    is_int = (itype == "int")
    if is_int:
        stride1 = float(max(1, int(stride1)))
        flows = jnp.round(flows)
    else:
        stride1 = float(stride1)
    fdt = jnp.float32
    W_t = min(2 * wt + 1, T)
    flows = _expand_flow_heads(flows, HD)
    st_offset = W_t - flows.shape[3]
    assert st_offset in (0, 1)
    nH = flows.shape[-2]
    nW = flows.shape[-1]
    fH = flows[:, :, :, :, 1].astype(fdt)
    fW = flows[:, :, :, :, 0].astype(fdt)
    if st_offset == 1:
        zsh = fH.shape[:3] + (1,) + fH.shape[4:]
        fH = jnp.concatenate([jnp.zeros(zsh, fH.dtype), fH], axis=3)
        fW = jnp.concatenate([jnp.zeros(zsh, fW.dtype), fW], axis=3)
    base_h = (jnp.arange(nH, dtype=jnp.int32) * stride0) % H
    base_w = (jnp.arange(nW, dtype=jnp.int32) * stride0) % W
    bh = base_h[None, None, None, None, :, None].astype(fdt)
    bw = base_w[None, None, None, None, None, :].astype(fdt)
    ctr_h = reflect_bounds(bh + fH, H)
    ctr_w = reflect_bounds(bw + fW, W)
    off_h, off_w = search_offsets(ctr_h, ctr_w, stride1, ws, H, W,
                                  full_ws, False)
    cells_w = jnp.arange(ws, dtype=fdt)
    s1 = jnp.asarray(stride1, fdt)
    prop_h = ctr_h[:, :, :, :, None] + s1 * (cells_w[:, None, None]
                                             - off_h[:, :, :, :, None])
    prop_w = ctr_w[:, :, :, :, None] + s1 * (cells_w[:, None, None]
                                             - off_w[:, :, :, :, None])
    tj_tab = np.asarray(time_window_frames(T, wt))
    cdtype = jnp.int32 if is_int else jnp.dtype(jnp.float32)
    dt = jnp.asarray(tj_tab - np.arange(T)[:, None]).astype(cdtype)
    dh = prop_h - bh[:, :, :, :, None]        # [B,HD,T,W_t,ws,nH,nW]
    dw = prop_w - bw[:, :, :, :, None]
    if is_int:
        dh = dh.astype(cdtype)
        dw = dw.astype(cdtype)
    return dict(dt_tab=dt, dh=dh, dw=dw, cdtype=cdtype)


def nls_dists_at_cells(vid0, vid1, flows, cells, *, ws, wt, ps, stride0,
                       stride1, dist_type="l2", dilation=1, full_ws=True,
                       use_adj=False, itype="float", channel_chunk=4,
                       row0=0, col0=0):
    """Differentiably recompute search distances at selected window cells.

    vid0/vid1 [B,HD,T,F,H,W]; flows [B,HD,T,W_t(-1),2,nH,nW]; cells int32
    [B,HD,T,nH,nW,K] holding flat ids (st*ws + wi)*ws + wj (stop-grad).
    row0/col0 + banded flows/cells (nH/nW smaller than the full query
    grid) restrict to a query band for memory-bounded streaming.

    Returns (dists [B,HD,T,nH,nW,K], (dt, dh, dw) offsets each
    [B,HD,T,nH,nW,K]) — dists/offsets differentiable in vid0, vid1 and
    (float path) flows, exactly like the reference float path
    (non_local_search.py:89-90: int path has no flow grads). Invalid
    cells (window positions outside the frame) carry init_val and zero
    gradients, mirroring compute_dist's check_interval skip.
    """
    B, HD, T, F, H, W = vid0.shape
    K = cells.shape[-1]
    is_int = (itype == "int")
    if is_int:
        stride1 = float(max(1, int(stride1)))
        flows = jnp.round(flows)
    else:
        stride1 = float(stride1)
    dtype = vid0.dtype
    fdt = jnp.float32
    W_t = min(2 * wt + 1, T)
    nHq, nWq = num_queries(H, W, stride0)
    nH, nW = cells.shape[-3], cells.shape[-2]
    assert nH <= nHq and nW <= nWq
    flows = _expand_flow_heads(flows, HD)
    st_offset = W_t - flows.shape[3]
    assert st_offset in (0, 1)
    patch_offset = 0 if use_adj else -(ps // 2)

    cells = lax.stop_gradient(cells).astype(jnp.int32)
    st = cells // (ws * ws)
    wi = (cells % (ws * ws)) // ws
    wj = cells % ws

    # -- per-(q,k) flow at the selected temporal slot --
    fH = flows[:, :, :, :, 1].astype(fdt)    # [B,HD,T,W_t(-1),nH,nW]
    fW = flows[:, :, :, :, 0].astype(fdt)
    if st_offset == 1:
        zsh = fH.shape[:3] + (1,) + fH.shape[4:]
        fH = jnp.concatenate([jnp.zeros(zsh, fH.dtype), fH], axis=3)
        fW = jnp.concatenate([jnp.zeros(zsh, fW.dtype), fW], axis=3)
    fH_k = _select_slot(fH, st)              # [B,HD,T,nH,nW,K]
    fW_k = _select_slot(fW, st)

    base_h = ((row0 + jnp.arange(nH, dtype=jnp.int32)) * stride0) % H
    base_w = ((col0 + jnp.arange(nW, dtype=jnp.int32)) * stride0) % W
    bh = base_h[None, None, None, :, None, None].astype(fdt)
    bw = base_w[None, None, None, None, :, None].astype(fdt)

    ctr_h = reflect_bounds(bh + fH_k, H)
    ctr_w = reflect_bounds(bw + fW_k, W)
    off_h, off_w = search_offsets(ctr_h, ctr_w, stride1, ws, H, W,
                                  full_ws, False)
    off_h = lax.stop_gradient(off_h)
    off_w = lax.stop_gradient(off_w)
    prop_h = ctr_h + stride1 * (wi.astype(fdt) - off_h)
    prop_w = ctr_w + stride1 * (wj.astype(fdt) - off_w)
    valid = in_bounds(prop_h, H) & in_bounds(prop_w, W)

    if is_int:
        prop_h = jnp.round(prop_h)
        prop_w = jnp.round(prop_w)

    # -- temporal target frame per (q, k) --
    tj_tab = jnp.asarray(time_window_frames(T, wt))      # [T, W_t]
    tj_full = jnp.broadcast_to(
        tj_tab[None, None, :, :, None, None],
        (B, HD, T, W_t, nH, nW)).astype(fdt)
    tj_k = _select_slot(tj_full, st).astype(jnp.int32)   # [B,HD,T,nH,nW,K]

    # -- key patch support gather (reflect pad covers window + taps:
    #    prop stays within wspan of the frame by construction of off) --
    wspan = stride1 * (ws - 1)
    Eh = dilation * (ps - 1)
    pad = int(np.ceil(wspan)) + Eh + 2
    assert pad <= min(H, W) - 1, "frame too small for single-fold pad"
    v1p, (Tp, Hp, Wp) = pad_frames_cf(vid1, pad)

    o_h = prop_h + dilation * patch_offset
    o_w = prop_w + dilation * patch_offset
    if is_int:
        S = Eh + 1
        oi = o_h.astype(jnp.int32) + pad
        oj = o_w.astype(jnp.int32) + pad
        fh = fw = None
    else:
        S = Eh + 2
        fi = jnp.floor(o_h)
        fj = jnp.floor(o_w)
        fh = (o_h - fi).astype(fdt)          # carries the flow gradient
        fw = (o_w - fj).astype(fdt)
        oi = fi.astype(jnp.int32) + pad
        oj = fj.astype(jnp.int32) + pad

    # -- query patches: static strided slices of the padded query video
    #    (band mode: one dynamic row/col slice first — row0/col0 may be
    #    traced inside a band lax.map) --
    pad0 = Eh + 1
    v0p = jnp.pad(vid0.astype(fdt),
                  ((0, 0),) * 4 + ((pad0, pad0), (pad0, pad0)),
                  mode="reflect")            # [B,HD,T,F,Hp0,Wp0]
    if nH != nHq or nW != nWq or not (isinstance(row0, int) and row0 == 0
                                      and isinstance(col0, int)
                                      and col0 == 0):
        Hb = (nH - 1) * stride0 + 1 + 2 * pad0
        Wb = (nW - 1) * stride0 + 1 + 2 * pad0
        v0p = lax.dynamic_slice(
            v0p, (0, 0, 0, 0, row0 * stride0, col0 * stride0),
            v0p.shape[:4] + (Hb, Wb))

    dist_is_l2 = (dist_type == "l2")
    C = max(1, min(channel_chunk, F))
    while F % C:
        C -= 1
    nchunks = F // C
    v1_scan = jnp.moveaxis(v1p.reshape(B, HD, nchunks, C, -1), 2, 0)
    v0_scan = jnp.moveaxis(
        jnp.swapaxes(v0p, 3, 4).reshape(  # [B,HD,T,Hp0,F,Wp0] keeps F minor
            B, HD, T, v0p.shape[-2], nchunks, C, v0p.shape[-1]), 4, 0)

    ref_h0 = np.arange(nH) * stride0     # local to the (sliced) band
    ref_w0 = np.arange(nW) * stride0
    idx3 = (jnp.broadcast_to(tj_k, (B, HD, T, nH, nW, K)),
            jnp.broadcast_to(oi, (B, HD, T, nH, nW, K)),
            jnp.broadcast_to(oj, (B, HD, T, nH, nW, K)))

    if not is_int:
        whc = (1. - fh, fh)
        wvc = (1. - fw, fw)

    def chunk_fn(xs):
        v0_c, v1_c = xs                      # [B,HD,T,Hp0,C,Wp0], [B,HD,C,M]
        P = patch_gather(v1_c, idx3, (S, Tp, Hp, Wp))
        # P [B,HD,C,S,S,T,nH,nW,K]
        acc = 0.
        for pi in range(ps):
            a = dilation * pi
            rh = pad0 + dilation * (pi + patch_offset) + ref_h0
            for pj in range(ps):
                b = dilation * pj
                rw = pad0 + dilation * (pj + patch_offset) + ref_w0
                p0 = v0_c[:, :, :, rh[0]:rh[-1] + 1:stride0, :,
                          rw[0]:rw[-1] + 1:stride0]
                p0 = jnp.moveaxis(p0, 4, 2)[..., None]  # [B,HD,C,T,nH,nW,1]
                if is_int:
                    pv = P[:, :, :, a, b]
                else:
                    pv = 0.
                    for u in (0, 1):
                        for v in (0, 1):
                            wgt = (whc[u] * wvc[v])[:, :, None]
                            pv = pv + wgt * P[:, :, :, a + u, b + v]
                # pv [B,HD,C,T,nH,nW,K]
                if dist_is_l2:
                    dfd = p0 - pv
                    acc = acc + jnp.sum(dfd * dfd, axis=2)
                else:
                    acc = acc + jnp.sum(p0 * pv, axis=2)
        return acc                           # [B,HD,T,nH,nW,K]

    chunk_fn = jax.checkpoint(chunk_fn)

    def body(acc, xs):
        return acc + chunk_fn(xs), None

    acc0 = jnp.zeros((B, HD, T, nH, nW, K), fdt)
    dists, _ = lax.scan(body, acc0, (v0_scan, v1_scan))

    _, _, init_val = dist_type_select(dist_type)
    dists = jnp.where(valid, dists, jnp.asarray(init_val, fdt))

    t_ids = jnp.arange(T, dtype=fdt).reshape(1, 1, T, 1, 1, 1)
    dt = _select_slot(tj_full, st) - t_ids
    dh = prop_h - bh
    dw = prop_w - bw
    if is_int:
        dt = dt.astype(jnp.int32)
        dh = dh.astype(jnp.int32)
        dw = dw.astype(jnp.int32)
    else:
        dt = dt.astype(dtype)
        dh = dh.astype(dtype)
        dw = dw.astype(dtype)
    return dists.astype(dtype), (dt, dh, dw)
