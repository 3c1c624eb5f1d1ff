"""Non-local search core (TPU-native, pure jnp).

Implements the reference's flow-shifted grid search
(`lib/csrc/search/non_local_search_{int,bilin2d}_kernel.cu`,
`lib/stnls/search/impl/non_local_search.py:23-140`) as a single vectorized,
differentiable jnp program:

  * queries live on a stride0 grid; each (query, time-slot st) gets a search
    center = query position + optical-flow offset (reflect-bounded),
  * a ws x ws lattice with spacing stride1 (possibly fractional) is laid
    around the center, shifted to stay in-frame when full_ws=True,
  * patchwise distances (prod or l2) over (pt, ps, ps, F) are accumulated,
    with reflect-padded patch reads and bilinear interpolation of vid1 in the
    float ("bilin2d") path,
  * outputs are dists plus relative offsets (dt, dh, dw) from the query.

TPU layout notes (this is where the design diverges hard from the CUDA
reference): every intermediate keeps the two *minor* axes large —
[B,HD,T,W_t,ws,ws,nH,nW] with the (nH,nW) spatial grid minor — because TPU
tiles arrays into (8,128) lanes and a trailing F=8 or (ws,ws)=(5,5) axis
pads 16-64x. Gathers run channels-first ([B,HD,F,T*H*W] flattened) for the
same reason, and the offset components travel as a *leading* [3, ...] axis
until the API boundary.

Backward: the reference hand-writes three CUDA kernels (vid grads, vid grads
with bilinear scatter, vid+flow grads with reflection-sign tracking,
`nls_bilin2d.cu:95-291`, `shared_kernel.cu:918-1053`). Here the forward is
built from jnp gathers and piecewise-linear reflection, so `jax.grad`
derives all of them, with *deterministic* scatter-adds (the CUDA version
needs atomicAdd and `nondet_tol` in its gradcheck).

The patch-pixel loop runs as a `lax.scan` over pt*ps*ps steps so the traced
graph stays small while the (W_t, ws, ws) search lattice stays vectorized on
the VPU.
"""

import numpy as np
import jax
import jax.numpy as jnp

from stnls_tpu.ops.geometry import (
    reflect_bounds, in_bounds, num_queries, time_window_frames, search_offsets,
)

# dist_type menu (reference search/utils.py:219-235)
DIST_PROD = 0
DIST_L2 = 1


def dist_type_select(dist_type):
    menu = {"prod": DIST_PROD, "l2": DIST_L2}
    descending = {"prod": True, "l2": False}
    init_val = {"prod": -np.inf, "l2": np.inf}
    return menu[dist_type], descending[dist_type], init_val[dist_type]


def _take_cf(vid_cf, idx):
    """Channels-first gather: vid_cf [B,HD,F,M], idx [B?,HD?,...] ->
    [B,HD,F,*idx.shape[2:]]. idx leading dims broadcast to (B,HD)."""
    B, HD, F, M = vid_cf.shape
    tail = idx.shape[2:]
    n = int(np.prod(tail)) if tail else 1
    idx2 = jnp.broadcast_to(idx, (B, HD) + tail).reshape(B, HD, 1, n)
    out = jnp.take_along_axis(vid_cf, idx2, axis=3)
    return out.reshape((B, HD, F) + tail)


def _expand_flow_heads(flows, HD):
    """flows [B,HDf,...] -> per-head view via ihead % HDf (kernel convention)."""
    HDf = flows.shape[1]
    if HDf == HD:
        return flows
    reps = [h % HDf for h in range(HD)]
    return flows[:, jnp.asarray(reps, jnp.int32)]


def nls_search_volume(vid0, vid1, flows, *, ws, wt, ps, stride0, stride1,
                      strideQ=None, dist_type="l2", dilation=1, pt=1,
                      reflect_bounds_=True, full_ws=True, use_adj=False,
                      off_Hq=0, off_Wq=0, itype="float", ws_interior=0):
    """Exhaustive search volume, internal TPU-friendly layout.

    Returns (dists, inds3):
      dists [B,HD,T,W_t,ws,ws,nH,nW] (invalid cells = +/-inf)
      inds3 [3,B,HD,T,W_t,ws,ws,nH,nW] relative (dt,dh,dw), float or int32.

    vid0/vid1: [B,HD,T,F,H,W]; flows: [B,HDf,T,W_t or W_t-1,2,nH,nW].
    """
    B, HD, T, F, qH, qW = vid0.shape
    kH, kW = vid1.shape[-2:]
    is_int = (itype == "int")
    patch_offset = 0 if use_adj else -(ps // 2)
    W_t = min(2 * wt + 1, T)
    nH, nW = num_queries(kH, kW, stride0)
    st_offset = W_t - flows.shape[3]
    assert st_offset in (0, 1), "flows must cover W_t or W_t-1 slots"
    if strideQ is None:
        strideQ = stride0
    if is_int:
        stride1 = max(1, int(stride1))
        flows = jnp.round(flows).astype(jnp.int32) \
            if jnp.issubdtype(flows.dtype, jnp.floating) else flows.astype(jnp.int32)
        if ws_interior <= 0:
            ws_interior = ws
    else:
        stride1 = float(stride1)
        ws_interior = ws  # float kernel has no ws_interior
    dtype = vid0.dtype
    cdtype = jnp.int32 if is_int else dtype

    # -- query grids --
    # int path: ref grid strides by strideQ over (qH,qW); window anchors (adj)
    # stride by stride0 over (kH,kW). float path: both coincide
    # (non_local_search_bilin2d_kernel.cu:98-100).
    t_ids = jnp.arange(T, dtype=jnp.int32)
    ref_h = (jnp.arange(nH, dtype=jnp.int32) * strideQ) % qH
    ref_w = (jnp.arange(nW, dtype=jnp.int32) * strideQ) % qW
    adj_h = (jnp.arange(nH, dtype=jnp.int32) * stride0) % kH
    adj_w = (jnp.arange(nW, dtype=jnp.int32) * stride0) % kW
    if not is_int:
        adj_h, adj_w = ref_h, ref_w

    # -- temporal window: tj per (t, st) --
    tj_tab = jnp.asarray(time_window_frames(T, wt))  # [T, W_t]

    # -- search centers: [B,HD,T,W_t,nH,nW] --
    flows = _expand_flow_heads(flows, HD)
    base_h = adj_h[None, None, None, None, :, None].astype(cdtype)
    base_w = adj_w[None, None, None, None, None, :].astype(cdtype)
    if st_offset == 1:
        # slot 0 searches the query frame itself with zero flow; the zero slot
        # is synthesized here so no flow gradient attaches to it.
        zshape = flows.shape[:3] + (1,) + flows.shape[4:]
        zero = jnp.zeros(zshape, flows.dtype)
        flows_full = jnp.concatenate([zero, flows], axis=3)
    else:
        flows_full = flows
    # flow layout: [...,0,:,:] = dW, [...,1,:,:] = dH
    ctr_h = reflect_bounds(base_h + flows_full[:, :, :, :, 1], kH)
    ctr_w = reflect_bounds(base_w + flows_full[:, :, :, :, 0], kW)

    # -- per-query effective window (ws_interior, int path only) --
    use_interior = is_int and (ws_interior != ws)
    if use_interior:
        btm_right = jnp.logical_or(
            (jnp.arange(nH) == nH - 1)[:, None],
            (jnp.arange(nW) == nW - 1)[None, :])  # [nH,nW]
        ws_eff = jnp.where(btm_right, ws, ws_interior)
        offs = [search_offsets(ctr_h, ctr_w, stride1, w, kH, kW, full_ws, is_int)
                for w in (ws, ws_interior)]
        sel = btm_right[None, None, None, None]
        off_h = jnp.where(sel, offs[0][0], offs[1][0])
        off_w = jnp.where(sel, offs[0][1], offs[1][1])
        # [ws,ws,nH,nW] cell validity, leading cell axes
        cell_mask = ((jnp.arange(ws)[:, None, None, None]
                      < ws_eff[None, None]) &
                     (jnp.arange(ws)[None, :, None, None]
                      < ws_eff[None, None]))
        cell_mask = cell_mask[None, None, None, None]  # [1,1,1,1,ws,ws,nH,nW]
    else:
        off_h, off_w = search_offsets(ctr_h, ctr_w, stride1, ws, kH, kW,
                                      full_ws, is_int)
        cell_mask = None

    # -- proposed lattice positions, cells-major/space-minor --
    cells = jnp.arange(ws, dtype=cdtype)
    s1 = jnp.asarray(stride1, cdtype)
    # [B,HD,T,W_t,ws,nH,nW]
    prop_h = ctr_h[:, :, :, :, None] + s1 * (cells[:, None, None]
                                             - off_h[:, :, :, :, None])
    prop_w = ctr_w[:, :, :, :, None] + s1 * (cells[:, None, None]
                                             - off_w[:, :, :, :, None])
    # [B,HD,T,W_t,ws,ws,nH,nW]
    valid_patch = (in_bounds(prop_h, kH)[:, :, :, :, :, None] &
                   in_bounds(prop_w, kW)[:, :, :, :, None, :])

    # -- channels-first flattened videos for gathers --
    v0_cf = vid0.reshape(B, HD, T, F, qH * qW).transpose(0, 1, 3, 2, 4) \
        .reshape(B, HD, F, T * qH * qW)
    v1_cf = vid1.reshape(B, HD, T, F, kH * kW).transpose(0, 1, 3, 2, 4) \
        .reshape(B, HD, F, T * kH * kW)

    # -- patch pixel offsets (static) --
    pks, pis, pjs = np.meshgrid(np.arange(pt), np.arange(ps), np.arange(ps),
                                indexing="ij")
    pix_offsets = jnp.asarray(
        np.stack([pks.ravel(), pis.ravel(), pjs.ravel()], 1), jnp.int32)

    tj_b = tj_tab[None, None, :, :, None, None, None, None]  # [1,1,T,W_t,1,1,1,1]

    def body(acc, pix_off):
        pk, pi, pj = pix_off[0], pix_off[1], pix_off[2]
        dH = dilation * (pi + patch_offset)
        dW = dilation * (pj + patch_offset)

        # -- reference pixel (always int reads) --
        rt = reflect_bounds(t_ids + pk, T)  # stays in range for pk < T
        rh = ref_h + off_Hq + dH
        rw = ref_w + off_Wq + dW
        if reflect_bounds_:
            rh, rw = reflect_bounds(rh, qH), reflect_bounds(rw, qW)
        v_ref = (in_bounds(rh, qH)[:, None] & in_bounds(rw, qW)[None, :])
        ridx = (rt[:, None, None] * qH + jnp.clip(rh, 0, qH - 1)[None, :, None]) \
            * qW + jnp.clip(rw, 0, qW - 1)[None, None, :]  # [T,nH,nW]
        pix0 = _take_cf(v0_cf, ridx[None, None])  # [B,HD,F,T,nH,nW]
        pix0 = pix0[:, :, :, :, None, None, None]  # -> [B,HD,F,T,1,1,1,nH,nW]

        # -- proposed pixel --
        ptj = reflect_bounds(tj_b + pk, T)  # [1,1,T,W_t,1,1,1,1] int32
        ph = prop_h[:, :, :, :, :, None] + jnp.asarray(dH, cdtype)
        pw = prop_w[:, :, :, :, None, :] + jnp.asarray(dW, cdtype)
        if reflect_bounds_:
            ph, pw = reflect_bounds(ph, kH), reflect_bounds(pw, kW)
        v_prop = in_bounds(ph, kH) & in_bounds(pw, kW)  # [...,ws,ws,nH,nW]

        if is_int:
            pidx = (ptj * kH + jnp.clip(ph, 0, kH - 1)) * kW \
                + jnp.clip(pw, 0, kW - 1)
            pidx = jnp.broadcast_to(pidx, (B, HD, T, W_t, ws, ws, nH, nW))
            pix1 = _take_cf(v1_cf, pidx)  # [B,HD,F,T,W_t,ws,ws,nH,nW]
        else:
            h0 = jnp.floor(ph)
            w0 = jnp.floor(pw)
            pix1 = 0.
            for di in (0, 1):
                for dj in (0, 1):
                    hc = h0 + di
                    wc = w0 + dj
                    wgt = (jnp.maximum(0., 1. - jnp.abs(hc - ph))
                           * jnp.maximum(0., 1. - jnp.abs(wc - pw)))
                    wgt = jnp.where(in_bounds(hc, kH) & in_bounds(wc, kW),
                                    wgt, 0.)
                    pidx = (ptj * kH + jnp.clip(hc, 0, kH - 1).astype(jnp.int32)) \
                        * kW + jnp.clip(wc, 0, kW - 1).astype(jnp.int32)
                    pidx = jnp.broadcast_to(pidx,
                                            (B, HD, T, W_t, ws, ws, nH, nW))
                    corner = _take_cf(v1_cf, pidx)
                    pix1 = pix1 + jnp.broadcast_to(wgt, pidx.shape)[:, :, None] \
                        * corner

        # -- pair contribution (zero when either side is out of frame) --
        pair_ok = v_prop & v_ref[None, None, None, None, None, None]
        if dist_type == "prod":
            contrib = jnp.sum(pix0 * pix1, axis=2)
        else:
            diff = pix0 - pix1
            contrib = jnp.sum(diff * diff, axis=2)
        contrib = jnp.where(pair_ok, contrib, 0.)
        return acc + contrib, None

    acc0 = jnp.zeros((B, HD, T, W_t, ws, ws, nH, nW), dtype)
    dists, _ = jax.lax.scan(body, acc0, pix_offsets)

    # -- invalidate out-of-frame centers / unsearched cells --
    _, _, init_val = dist_type_select(dist_type)
    inval = jnp.asarray(init_val, dtype)
    dists = jnp.where(valid_patch, dists, inval)
    if cell_mask is not None:
        dists = jnp.where(jnp.broadcast_to(cell_mask, dists.shape), dists, inval)

    # -- relative offsets (dt, dh, dw), component-leading --
    dt = (tj_tab - t_ids[:, None]).astype(cdtype)  # [T,W_t]
    shape8 = dists.shape
    dh = (prop_h - base_h[:, :, :, :, None].astype(cdtype))[:, :, :, :, :, None]
    dw = (prop_w - base_w[:, :, :, :, None].astype(cdtype))[:, :, :, :, None, :]
    inds3 = jnp.stack([
        jnp.broadcast_to(dt[None, None, :, :, None, None, None, None], shape8)
        .astype(cdtype),
        jnp.broadcast_to(dh, shape8).astype(cdtype),
        jnp.broadcast_to(dw, shape8).astype(cdtype),
    ], axis=0)
    if cell_mask is not None:
        fill = jnp.asarray(-100000000 if is_int else -1e8, cdtype)
        inds3 = jnp.where(jnp.broadcast_to(cell_mask[None], inds3.shape),
                          inds3, fill)
    return dists, inds3


def nls_search_core(vid0, vid1, flows, **kw):
    """Reference-layout wrapper: returns
    dists [B,HD,T,nH,nW,W_t,ws,ws], inds [B,HD,T,nH,nW,W_t,ws,ws,3]."""
    dists, inds3 = nls_search_volume(vid0, vid1, flows, **kw)
    dists = jnp.transpose(dists, (0, 1, 2, 6, 7, 3, 4, 5))
    inds = jnp.transpose(inds3, (1, 2, 3, 7, 8, 4, 5, 6, 0))
    return dists, inds
