"""Rebased correlation-volume RefineSearch (TPU fast path).

Same semantics as ops.nls.refine_search_volume (reference
lib/csrc/search/refinement_{int,bilin2d}_kernel.cu): re-search a wr x wr
lattice (spacing stride1) around each of the Ks *given* per-query flows.
Where the NLS engine's group axis is the temporal window W_t (one target
frame per group, static), refine's group axis is the K given flows and
the target frame is data-dependent per (query, k) — the given flow's
rounded dt. The cvr machinery (ops/nls_cvr.py: up-grid surface, per-tile
rebasing, dense shifted products + separable one-hot selection) carries
over with the group axis re-labeled Ks; the frame irregularity is
handled by iterating the (t, k) pair body over the T candidate frames
with a per-query one-hot frame mask, and a prefetched per-pair liveness
bit skips frames no query in the pair targets (lax.cond) — smooth
per-k flow fields leave 1-2 live frames per pair.

Out-of-budget/spilled queries are flagged `outliers` (init-valued dists);
the reference's -1e8 invalid-fill edges get init dists + fill inds like
the lattice engine. Cross-checked against refine_search_volume in
tests/search/test_refine_cvr.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from stnls_tpu.ops.geometry import (
    reflect_bounds, in_bounds, num_queries, search_offsets,
)
from stnls_tpu.ops.nls import dist_type_select, _expand_flow_heads
from stnls_tpu.ops.nls import INVALID_IND
from stnls_tpu.ops.nls_cvr import (
    cvr_geometry, cvr_supported, cvr_precompute, _select_sweep, X_E,
)

refine_cvr_supported = cvr_supported


def refine_cvr_volume(vid0, vid1, flows_k, *, wr, ps, stride0, stride1,
                      dist_type="l2", dilation=1, full_ws=True,
                      use_adj=False, itype="float", flow_budget=8,
                      spread_budget=4, tile=(8, 16), precomp=None):
    """flows_k [B,HDf,T,nH,nW,Ks,3] -> (dists [B,HD,T,Ks,wr,wr,nH,nW],
    inds3 [3,...], outliers [B,HD,T,Ks,nH,nW])."""
    B, HD, T, F, H, W = vid0.shape
    assert vid1.shape[-2:] == (H, W)
    is_int = (itype == "int")
    if is_int:
        stride1 = float(max(1, int(stride1)))
        flows_k = jnp.round(flows_k).astype(jnp.float32) \
            if jnp.issubdtype(flows_k.dtype, jnp.floating) \
            else flows_k.astype(jnp.float32)
    else:
        stride1 = float(stride1)
    ws = wr
    geo = cvr_geometry(ws=ws, ps=ps, stride0=stride0, stride1=stride1,
                       dilation=dilation, flow_budget=flow_budget,
                       spread_budget=spread_budget, use_adj=use_adj,
                       tile=tile)
    assert geo is not None, "refine cvr path unsupported for this config"
    m, su, Sp = geo["m"], geo["su"], geo["Sp"]
    Lh, Lw, nPh, nPw = geo["Lh"], geo["Lw"], geo["nPh"], geo["nPw"]
    ZMAX, taps, t0s, Eh = geo["ZMAX"], geo["taps"], geo["t0s"], geo["Eh"]
    pad1 = geo["pad1"]
    dist_is_l2 = (dist_type == "l2")
    dtype = vid0.dtype
    fdtype = jnp.float32
    nHq, nWq = num_queries(H, W, stride0)
    nH, nW = nHq, nWq
    tH, tW = geo["tH"], geo["tW"]
    tH = min(tH, nH)
    tW = min(tW, nW)
    while nH % tH:
        tH -= 1
    while nW % tW:
        tW -= 1
    nTh, nTw = nH // tH, nW // tW
    BH = B * HD

    flows_k = _expand_flow_heads(flows_k, HD)
    Ks = flows_k.shape[-2]
    fk = jnp.moveaxis(flows_k, 5, 3)          # [B,HD,T,Ks,nH,nW,3]
    edge_valid = (jnp.abs(fk[..., 1]) < 1e7) & (jnp.abs(fk[..., 2]) < 1e7)
    fk = jnp.where(edge_valid[..., None], fk, 0.)

    # ---- per-(query, k) centers: frame + spatial ----
    t_ids = jnp.arange(T, dtype=jnp.int32)[None, None, :, None, None, None]
    dt_i = jnp.floor(fk[..., 0] + 0.5).astype(jnp.int32)
    ctr_t = reflect_bounds(t_ids + dt_i, T).astype(jnp.int32)

    ref_h = (jnp.arange(nH, dtype=jnp.int32) * stride0) % H
    ref_w = (jnp.arange(nW, dtype=jnp.int32) * stride0) % W
    base_h = ref_h[None, None, None, None, :, None].astype(fdtype)
    base_w = ref_w[None, None, None, None, None, :].astype(fdtype)
    ctr_h = reflect_bounds(base_h + fk[..., 1], H)   # [B,HD,T,Ks,nH,nW]
    ctr_w = reflect_bounds(base_w + fk[..., 2], W)
    off_h, off_w = search_offsets(ctr_h, ctr_w, stride1, ws, H, W,
                                  full_ws, is_int)
    rho_h = m * (ctr_h.astype(fdtype) - base_h) - su * off_h.astype(fdtype)
    rho_w = m * (ctr_w.astype(fdtype) - base_w) - su * off_w.astype(fdtype)
    k0h_f = jnp.floor(lax.stop_gradient(rho_h))
    k0w_f = jnp.floor(lax.stop_gradient(rho_w))
    th = (rho_h - k0h_f).astype(dtype)
    tw = (rho_w - k0w_f).astype(dtype)
    k0h = k0h_f.astype(jnp.int32)
    k0w = k0w_f.astype(jnp.int32)
    KLO, KHI = -m * ZMAX, m * ZMAX
    out_h = (k0h < KLO) | (k0h + Sp - 1 > KHI)
    out_w = (k0w < KLO) | (k0w + Sp - 1 > KHI)
    outliers = out_h | out_w
    k0h = jnp.clip(k0h, KLO, KHI - Sp + 1)
    k0w = jnp.clip(k0w, KLO, KHI - Sp + 1)
    if is_int:
        th = jnp.zeros_like(th)
        tw = jnp.zeros_like(tw)

    # ---- per-tile base shifts + residuals, P-major tile layout ----
    P = T * Ks

    def pmajor(x):
        x = jnp.moveaxis(x.reshape(BH, T, Ks, nH, nW), 0, 2)
        x = x.reshape(P, BH, nTh, tH, nTw, tW)
        return jnp.transpose(x, (0, 1, 2, 4, 3, 5))

    k0h_t = pmajor(k0h)
    k0w_t = pmajor(k0w)
    bh_t = jnp.clip(jnp.min(k0h_t, axis=(4, 5)), KLO, KHI - nPh + 1)
    bw_t = jnp.clip(jnp.min(k0w_t, axis=(4, 5)), KLO, KHI - nPw + 1)
    l0h = k0h_t - bh_t[..., None, None]
    l0w = k0w_t - bw_t[..., None, None]
    spill = (l0h < 0) | (l0h > Lh) | (l0w < 0) | (l0w > Lw)
    l0h = jnp.clip(l0h, 0, Lh)
    l0w = jnp.clip(l0w, 0, Lw)

    def unpmajor(x_t):
        x = jnp.transpose(x_t, (0, 1, 2, 4, 3, 5)) \
            .reshape(T, Ks, BH, nH, nW)
        x = jnp.moveaxis(x, 2, 0)
        return x.reshape(B, HD, T, Ks, nH, nW)

    outliers = outliers | unpmajor(spill)

    # ---- frame-level fields (shared with the NLS cvr engine) ----
    if precomp is None:
        precomp = cvr_precompute(vid0, vid1, ws=ws, ps=ps, stride0=stride0,
                                 stride1=stride1, dist_type=dist_type,
                                 dilation=dilation, use_adj=use_adj,
                                 itype=itype, flow_budget=flow_budget,
                                 spread_budget=spread_budget,
                                 tile=(tH, tW))
    S_up = precomp["S_up"]
    v0e = precomp["v0e"]
    X_f = precomp.get("X_f")
    ps0 = precomp.get("ps0")
    nX = len(X_E)

    TPH = (tH - 1) * stride0 + 1
    TPW = (tW - 1) * stride0 + 1
    TPHx, TPWx = TPH + Eh, TPW + Eh
    winH = m * (TPHx - 1) + nPh
    winW = m * (TPWx - 1) + nPw
    XwinH = m * (TPH - 1) + nPh
    XwinW = m * (TPW - 1) + nPw
    ty0 = [i * tH * stride0 for i in range(nTh)]
    tx0 = [j * tW * stride0 for j in range(nTw)]

    v0t = jnp.stack(
        [jnp.stack([v0e[:, :, :, ty0[i]:ty0[i] + TPHx,
                        tx0[j]:tx0[j] + TPWx]
                    for j in range(nTw)], 2)
         for i in range(nTh)], 2)
    if dist_is_l2:
        ps0_t = jnp.stack(
            [jnp.stack([ps0[:, :, i * tH:i * tH + tH, j * tW:j * tW + tW]
                        for j in range(nTw)], 2)
             for i in range(nTh)], 2)

    t_arr = jnp.asarray(np.repeat(np.arange(T), Ks), jnp.int32)

    ty0_a = jnp.asarray(ty0, jnp.int32)[None, None, :, None]
    tx0_a = jnp.asarray(tx0, jnp.int32)[None, None, None, :]
    oh_t = bh_t + m * (pad1 - t0s) + m * ty0_a
    ow_t = bw_t + m * (pad1 - t0s) + m * tx0_a

    th_t = pmajor(th)
    tw_t = pmajor(tw)
    ctrt_t = pmajor(ctr_t)                    # [P,BH,nTh,nTw,tH,tW]

    # per-(pair, frame) liveness: does ANY query of the pair target tj?
    livebits = jnp.stack(
        [jnp.any(ctrt_t == tj, axis=(1, 2, 3, 4, 5)) for tj in range(T)],
        axis=-1)                              # [P, T] bool

    ncr = 1 if is_int else 2
    _, _, init_val = dist_type_select(dist_type)

    def tap_tile(img):
        acc = None
        for a in taps:
            ia = a + t0s
            ya = img[..., ia:ia + (tH - 1) * stride0 + 1:stride0, :]
            for b in taps:
                ib = b + t0s
                v = ya[..., ib:ib + (tW - 1) * stride0 + 1:stride0]
                acc = v if acc is None else acc + v
        return acc

    def pair_body(p_idx):
        t_i = t_arr[p_idx]
        v0f = lax.dynamic_index_in_dim(v0t, t_i, axis=1, keepdims=False)
        if dist_is_l2:
            p0 = lax.dynamic_index_in_dim(ps0_t, t_i, axis=1,
                                          keepdims=False)
        oh_p, ow_p = oh_t[p_idx], ow_t[p_idx]
        l0h_p, l0w_p = l0h[p_idx], l0w[p_idx]
        th_p, tw_p = th_t[p_idx], tw_t[p_idx]
        ctrt_p = ctrt_t[p_idx]                # [BH,nTh,nTw,tH,tW]
        whc = (1. - th_p, th_p)
        wvc = (1. - tw_p, tw_p)

        def frame_term(tj):
            sup = S_up[:, tj]                 # static frame index
            xf = X_f[:, tj] if dist_is_l2 else None
            rebs, xwins = [], []
            for b in range(BH):
                rb, xb = [], []
                for i in range(nTh):
                    rr, xr = [], []
                    for j in range(nTw):
                        w = lax.dynamic_slice(
                            sup[b], (0, oh_p[b, i, j], ow_p[b, i, j]),
                            (F, winH, winW))
                        rr.append(w)
                        if dist_is_l2:
                            xw_ = lax.dynamic_slice(
                                xf[b], (0, oh_p[b, i, j], ow_p[b, i, j]),
                                (nX, XwinH, XwinW))
                            xr.append(xw_)
                    rb.append(jnp.stack(rr, 0))
                    if dist_is_l2:
                        xb.append(jnp.stack(xr, 0))
                rebs.append(jnp.stack(rb, 0))
                if dist_is_l2:
                    xwins.append(jnp.stack(xb, 0))
            reb = jnp.stack(rebs, 0)
            xwin = jnp.stack(xwins, 0) if dist_is_l2 else None

            cc_win, x_win = _select_sweep(
                v0f, reb, xwin, l0h_p, l0w_p, tap_tile, geo=geo,
                stride0=stride0, fdtype=fdtype)

            dists = []
            for i in range(ws):
                for j in range(ws):
                    oh, ow = su * i, su * j
                    acc = p0 if dist_is_l2 else None
                    for ch in range(ncr):
                        for cw in range(ncr):
                            ccv = cc_win[oh + ch, ow + cw]
                            term = ccv if is_int \
                                else whc[ch] * wvc[cw] * ccv
                            if dist_is_l2:
                                acc = acc - 2. * term
                            else:
                                acc = term if acc is None else acc + term
                    if dist_is_l2:
                        for ch in range(ncr):
                            for cw in range(ncr):
                                for ch2 in range(ncr):
                                    for cw2 in range(ncr):
                                        e = (ch2 - ch, cw2 - cw)
                                        c_use = (ch, cw)
                                        if e[0] < 0 or (e[0] == 0
                                                        and e[1] < 0):
                                            e = (-e[0], -e[1])
                                            c_use = (ch2, cw2)
                                        fam = X_E.index(e)
                                        xv = x_win[oh + c_use[0],
                                                   ow + c_use[1],
                                                   :, :, :, fam]
                                        if is_int:
                                            acc = acc + xv
                                        else:
                                            wgt = (whc[ch] * wvc[cw]
                                                   * whc[ch2] * wvc[cw2])
                                            acc = acc + wgt * xv
                    dists.append(acc)
            d = jnp.stack(dists, 0)           # [ws*ws,BH,nTh,nTw,tH,tW]
            mask = (ctrt_p == tj).astype(fdtype)[None]
            return d * mask

        zshape = (ws * ws, BH, nTh, nTw, tH, tW)
        d_acc = jnp.zeros(zshape, fdtype)
        for tj in range(T):
            d_acc = d_acc + lax.cond(
                livebits[p_idx, tj],
                lambda tj=tj: frame_term(tj),
                lambda: jnp.zeros(zshape, fdtype))
        d = d_acc.reshape(ws, ws, BH, nTh, nTw, tH, tW)
        d = jnp.transpose(d, (2, 0, 1, 3, 5, 4, 6)) \
            .reshape(BH, ws, ws, nH, nW)
        return d

    body = jax.checkpoint(pair_body)
    d_pairs = lax.map(body, jnp.arange(P, dtype=jnp.int32))
    d = d_pairs.reshape(T, Ks, B, HD, ws, ws, nH, nW)
    d = jnp.transpose(d, (2, 3, 0, 1, 4, 5, 6, 7))

    # ---- validity / outliers / inds3 (mirrors the lattice engine) ----
    cdtype = jnp.int32 if is_int else dtype
    cells = jnp.arange(ws, dtype=fdtype)
    s1c = jnp.asarray(stride1, fdtype)
    prop_h = ctr_h[:, :, :, :, None] + s1c * (cells[:, None, None]
                                              - off_h[:, :, :, :, None])
    prop_w = ctr_w[:, :, :, :, None] + s1c * (cells[:, None, None]
                                              - off_w[:, :, :, :, None])
    valid_patch = (in_bounds(prop_h, H)[:, :, :, :, :, None] &
                   in_bounds(prop_w, W)[:, :, :, :, None, :])
    inval = jnp.asarray(init_val, dtype)
    ok = (valid_patch & ~outliers[:, :, :, :, None, None]
          & edge_valid[:, :, :, :, None, None])
    d = jnp.where(ok, d.astype(dtype), inval)

    dt_off = (ctr_t - t_ids).astype(cdtype)   # [B,HD,T,Ks,nH,nW]
    dh = (prop_h - base_h[:, :, :, :, None])[:, :, :, :, :, None]
    dw = (prop_w - base_w[:, :, :, :, None])[:, :, :, :, None, :]
    shape8 = d.shape
    inds3 = jnp.stack([
        jnp.broadcast_to(dt_off[:, :, :, :, None, None], shape8)
        .astype(cdtype),
        jnp.broadcast_to(dh, shape8).astype(cdtype),
        jnp.broadcast_to(dw, shape8).astype(cdtype),
    ], axis=0)
    fill = jnp.asarray(-100000000 if is_int else INVALID_IND, cdtype)
    ev8 = jnp.broadcast_to(
        edge_valid[None, :, :, :, :, None, None], (3,) + shape8)
    inds3 = jnp.where(ev8, inds3, fill)
    return d, inds3, outliers
