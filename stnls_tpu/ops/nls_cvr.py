"""Rebased correlation-volume non-local search (pure-XLA TPU fast path).

Same semantics as ops.nls.nls_search_volume (reference CUDA kernels
lib/csrc/search/non_local_search_bilin2d_kernel.cu, nls_int.cu,
shared_kernel.cu:248-287) for itype in {int,float}, dist in {l2,prod},
uniform stride1 = su/m, pt=1, reflect_bounds=True, off_Hq=off_Wq=0,
strideQ=stride0, any stride0 — differentiable end-to-end by autodiff
(grads to vid0, vid1 AND flows via the explicit corner weights th/tw).

Architecture (third generation; supersedes the ops.nls_cv tiled path and
the fused Mosaic kernel as the default TPU engine):

  1. Build the *up-grid surface* S_up once per frame: the piecewise-
     bilinear interpolation of vid1 sampled every 1/m pixels, interleaved
     into one array (phase r,s at index [m*y+r, m*x+s]). Every candidate
     value the search can touch is an exact lerp between two adjacent
     up-grid samples per axis (the surface has no kink strictly inside a
     1/m cell), reducing all subpixel geometry to integer up-grid shifts
     plus per-query corner weights (1-th, th) x (1-tw, tw).
  2. L2 additionally needs patch-sums of surface self-products
     X_e[u] = sum_taps <S_up[u+m*a], S_up[u+m*a+e]> for the five adjacent
     phase offsets e — built *globally per frame* (elementwise product +
     static strided tap-sum; no per-query work).
  3. Queries are tiled (tH x tW); each tile is *rebased* to its minimum
     integer up-shift b = min k0 over the tile, and one dynamic_slice per
     (batch-head, tile) extracts the tile's search window from S_up /
     X_e. Python-unrolled dynamic_slice ops stay dense copies — crucially
     NOT a vmap, which would lower to a scalarizing gather (measured ~9
     ns/elem on v5e).
  4. Dense shifted products: for each residual row position ph in
     [0, nPh), CC[ph, pw] = patchsum <vid0 tile, S_up window strided
     slice> — static slices, VPU mul-reduce, fused by XLA. The row
     selection is folded into the ph loop (masked one-hot FMA into Sp
     row accumulators) so no [nPh, nPw, ...] volume is materialized.
  5. Column selection is a second separable one-hot pass; the transpose
     of a masked FMA is the same masked FMA, so autodiff stays dense.
  6. Bilinear-corner assembly exactly as the reference: prod uses the
     2x2 corner lerp of CC; l2 = ||p0||^2 - 2*lerp(CC) + quad(X).

Out-of-budget queries (|k0| beyond flow_budget, or tile spread beyond
spread_budget) are flagged in `outliers` and carry init-valued dists —
callers surface or patch them up (see search.non_local_search).

Cross-validated against ops.nls.nls_search_volume in
tests/search/test_cvr_path.py.
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
from stnls_tpu.ops.nls_cv import cv_step

X_E = [(0, 0), (0, 1), (1, 0), (1, 1), (1, -1)]


def cvr_geometry(*, ws, ps, stride0, stride1, dilation, flow_budget,
                 spread_budget, use_adj, tile):
    """Static geometry. All up-grid quantities are in units of 1/m px."""
    step = cv_step(stride1)
    if step is None:
        return None
    m, su = step
    wspan = su * (ws - 1)
    Sp = wspan + 2                    # corner window extent per axis
    if isinstance(spread_budget, (tuple, list)):
        sb_r, sb_c = spread_budget
    else:
        sb_r = sb_c = spread_budget
    Lh = m * sb_r + m                 # residual l0 in [0, L]
    Lw = m * sb_c + m
    nPh = Lh + Sp                     # shifted-product positions per axis
    nPw = Lw + Sp
    ZMAX = -(-(m * flow_budget + wspan + 2) // m)   # |k0| <= m*ZMAX
    patch_offset = 0 if use_adj else -(ps // 2)
    taps = tuple(dilation * (p + patch_offset) for p in range(ps))
    t0s = -min(taps)
    Eh = dilation * (ps - 1)
    tH, tW = tile if isinstance(tile, (tuple, list)) else (tile, tile)
    pad1 = ZMAX + Eh + max(sb_r, sb_c) + 3
    pad0 = Eh + 1
    return dict(m=m, su=su, wspan=wspan, Sp=Sp, Lh=Lh, Lw=Lw, nPh=nPh,
                nPw=nPw, ZMAX=ZMAX, taps=taps, t0s=t0s, Eh=Eh, tH=tH,
                tW=tW, pad0=pad0, pad1=pad1)


def cvr_supported(*, itype, pt, stride1, reflect_bounds, ps, dilation,
                  off_Hq, off_Wq, strideQ, stride0, ws_interior, H, W):
    if pt != 1 or not reflect_bounds or off_Hq != 0 or off_Wq != 0:
        return False
    if strideQ not in (None, stride0):
        return False
    if ws_interior and ws_interior > 0:
        return False
    if itype == "int":
        stride1 = max(1, int(stride1))
    if cv_step(stride1) is None:
        return False
    return min(H, W) >= dilation * (ps - 1) + 2


def _upsurface(v1p, m):
    """v1p [BH,T,F,H1p,W1p] reflect-padded video -> interleaved up-grid
    surface [BH,T,F,m*(H1p-1)+1, m*(W1p-1)+1] (phase (r,s) at index
    [m*y+r, m*x+s]). Exact piecewise-bilinear samples."""
    if m == 1:
        return v1p
    rows = []
    for r in range(m):
        cols = []
        for s in range(m):
            a, b = r / m, s / m
            v = ((1 - a) * (1 - b) * v1p[..., :-1, :-1]
                 + (1 - a) * b * v1p[..., :-1, 1:]
                 + a * (1 - b) * v1p[..., 1:, :-1]
                 + a * b * v1p[..., 1:, 1:])
            cols.append(v)
        rows.append(jnp.stack(cols, -1))         # [..., H1, W1, m]
    up = jnp.stack(rows, -3)                     # [..., H1, m, W1, m]
    sh = up.shape
    up = up.reshape(sh[:-4] + (sh[-4] * sh[-3], sh[-2] * sh[-1]))
    last_r = up[..., -m, :][..., None, :]        # phase-0 of the last row
    up = jnp.concatenate([up, last_r], axis=-2)
    last_c = up[..., :, -m][..., :, None]
    up = jnp.concatenate([up, last_c], axis=-1)
    return up


def cvr_precompute(vid0, vid1, *, ws, ps, stride0, stride1, dist_type,
                   dilation=1, use_adj=False, itype="float", flow_budget=8,
                   spread_budget=4, tile=(8, 16)):
    """Frame-level fields shared across bands/pairs: padded up-grid
    surface, globally tap-summed X self-product fields (l2), v0 tap
    window, ps0."""
    B, HD, T, F, H, W = vid0.shape
    if itype == "int":
        stride1 = float(max(1, int(stride1)))
    else:
        stride1 = float(stride1)
    geo = cvr_geometry(ws=ws, ps=ps, stride0=stride0, stride1=stride1,
                       dilation=dilation, flow_budget=flow_budget,
                       spread_budget=spread_budget, use_adj=use_adj,
                       tile=tile)
    m, taps, t0s, Eh = geo["m"], geo["taps"], geo["t0s"], geo["Eh"]
    pad0, pad1 = geo["pad0"], geo["pad1"]
    BH = B * HD
    dist_is_l2 = (dist_type == "l2")
    fdtype = jnp.float32

    v0p = jnp.pad(vid0.astype(fdtype),
                  ((0, 0),) * 4 + ((pad0, pad0), (pad0, pad0)),
                  mode="reflect").reshape(BH, T, F, H + 2 * pad0,
                                          W + 2 * pad0)
    o0 = pad0 - t0s
    Hx, Wx = H + Eh, W + Eh
    v0e = v0p[..., o0:o0 + Hx, o0:o0 + Wx]   # index y = pixel (y - t0s)

    v1p = jnp.pad(vid1.astype(fdtype),
                  ((0, 0),) * 4 + ((pad1, pad1), (pad1, pad1)),
                  mode="reflect").reshape(BH, T, F, H + 2 * pad1,
                                          W + 2 * pad1)
    S_up = _upsurface(v1p, m)                # [BH,T,F,Hu,Wu]
    out = dict(S_up=S_up, v0e=v0e, geo=geo)

    if dist_is_l2:
        nHq, nWq = num_queries(H, W, stride0)

        def tapsum_q(img):
            acc = None
            for a in taps:
                ia = a + t0s
                ya = img[..., ia:ia + (nHq - 1) * stride0 + 1:stride0, :]
                for b in taps:
                    ib = b + t0s
                    v = ya[..., ib:ib + (nWq - 1) * stride0 + 1:stride0]
                    acc = v if acc is None else acc + v
            return acc

        out["ps0"] = tapsum_q(jnp.sum(v0e * v0e, axis=2))

        # X_e fields: up-grid pixel products + strided tap-sum.
        # X_f[u] = sum_{a,b} <S_up[u + m*(a+t0s) + ...]> so that the value
        # for a candidate corner at up index c is X_f[c - m*t0s].
        Hu, Wu = S_up.shape[-2:]
        Xh = Hu - m * Eh - 1
        Xw = Wu - m * Eh - 1
        xs = []
        for (eh, ew) in X_E:
            # pe[y, x] = sum_F S_up[y, x] * S_up[y + eh, x + ew], aligned to
            # S_up indices (zero-filled where x+ew is out of range; those
            # cells sit in the pad1 margin and are never read in-budget).
            w0 = max(0, -ew)
            w1 = max(0, ew)
            a0 = S_up[..., :Hu - eh, w0:Wu - w1]
            a1 = S_up[..., eh:, w0 + ew:Wu - w1 + ew]
            pe = jnp.sum(a0 * a1, axis=2)        # [BH,T,Hu-eh,Wu-|ew|]
            pe = jnp.pad(pe, ((0, 0), (0, 0), (0, eh), (w0, w1)))
            acc = None
            for a in taps:
                ia = m * (a + t0s)
                ya = pe[..., ia:ia + Xh, :]
                for b in taps:
                    ib = m * (b + t0s)
                    v = ya[..., ib:ib + Xw]
                    acc = v if acc is None else acc + v
            xs.append(acc)
        out["X_f"] = jnp.stack(xs, 2)            # [BH,T,nX,Xh,Xw]
    return out


def _select_sweep(v0f, reb, xwin, l0h_p, l0w_p, tap_tile, *, geo, stride0,
                  fdtype):
    """VPU sweep engine: dense shifted products with the row selection
    streamed into the position loop (original cvr core)."""
    m, Sp = geo["m"], geo["Sp"]
    Lh, Lw, nPh, nPw = geo["Lh"], geo["Lw"], geo["nPh"], geo["nPw"]
    BH, nTh, nTw, F, TPHx, TPWx = v0f.shape
    tH, tW = l0h_p.shape[-2:]
    TPH = (tH - 1) * stride0 + 1
    TPW = (tW - 1) * stride0 + 1
    dist_is_l2 = xwin is not None
    nX = xwin.shape[3] if dist_is_l2 else 0

    zero_cc = jnp.zeros((nPw, BH, nTh, nTw, tH, tW), fdtype)
    cc_rows = [zero_cc] * Sp      # row-selected CC accumulators
    if dist_is_l2:
        zero_x = jnp.zeros((nPw, BH, nTh, nTw, nX, tH, tW), fdtype)
        x_rows = [zero_x] * Sp
    for ph in range(nPh):
        ys = reb[..., ph:ph + m * (TPHx - 1) + 1:m, :]
        row = []
        for pw in range(nPw):
            sl = ys[..., pw:pw + m * (TPWx - 1) + 1:m]
            prod = jnp.sum(v0f * sl, axis=3)   # [BH,nTh,nTw,TPHx,TPWx]
            row.append(tap_tile(prod))
        row = jnp.stack(row, 0)   # [nPw,BH,nTh,nTw,tH,tW]
        if dist_is_l2:
            yx = xwin[..., ph:ph + m * (TPH - 1) + 1:m * stride0, :]
            xrow = []
            for pw in range(nPw):
                xrow.append(
                    yx[..., pw:pw + m * (TPW - 1) + 1:m * stride0])
            xrow = jnp.stack(xrow, 0)  # [nPw,BH,nTh,nTw,nX,tH,tW]
        for uh in range(Sp):
            if not 0 <= ph - uh <= Lh:
                continue
            mh = (l0h_p == (ph - uh)).astype(fdtype)[None]
            cc_rows[uh] = cc_rows[uh] + mh * row
            if dist_is_l2:
                x_rows[uh] = x_rows[uh] + mh[:, :, :, :, None] * xrow
    cc_sel = jnp.stack(cc_rows, 0)  # [Sp,nPw,BH,nTh,nTw,tH,tW]
    if dist_is_l2:
        x_sel = jnp.stack(x_rows, 0)

    cc_win = []
    x_win = []
    for uw in range(Sp):
        acc = 0.
        accx = 0.
        for pw in range(nPw):
            if not 0 <= pw - uw <= Lw:
                continue
            mw = (l0w_p == (pw - uw)).astype(fdtype)[None]
            acc = acc + mw * cc_sel[:, pw]
            if dist_is_l2:
                accx = accx + mw[:, :, :, :, None] * x_sel[:, pw]
        cc_win.append(acc)        # [Sp_h,BH,nTh,nTw,tH,tW]
        if dist_is_l2:
            x_win.append(accx)
    cc_win = jnp.stack(cc_win, 1)  # [Sp_h,Sp_w,BH,nTh,nTw,tH,tW]
    if dist_is_l2:
        x_win = jnp.stack(x_win, 1)
    return cc_win, (x_win if dist_is_l2 else None)


def _select_mx(v0f, reb, xwin, l0h_p, l0w_p, *, geo, stride0, fdtype,
               mx_dtype=None, mx_precision="high"):
    """MXU engine: per-tile im2col + one batched matmul computes the
    correlation of every query patch against every window position
    (CC[q, u] = <p0(q), up-grid patch at u>), then the per-query residual
    selection runs as static diagonal strided slices (tying the query's
    raster position to its window row/col) followed by a one-hot
    compare-FMA over the bounded residual range. The F*ps^2 contraction —
    where all the search FLOPs live (reference
    lib/csrc/search/nls_bilin2d.cu:5-90 does the same dot per thread) —
    lands on the MXU as [tH*tW, ps^2*F] @ [ps^2*F, XwinH*XwinW]."""
    m, Sp = geo["m"], geo["Sp"]
    Lh, Lw, nPh, nPw = geo["Lh"], geo["Lw"], geo["nPh"], geo["nPw"]
    taps, t0s = geo["taps"], geo["t0s"]
    BH, nTh, nTw, F, TPHx, TPWx = v0f.shape
    tH, tW = l0h_p.shape[-2:]
    XwinH = m * stride0 * (tH - 1) + nPh
    XwinW = m * stride0 * (tW - 1) + nPw
    dist_is_l2 = xwin is not None
    ps2 = len(taps) ** 2

    # im2col: query patches [.., ps2*F, tH*tW]; key patches at every
    # up-grid window position [.., ps2*F, XwinH*XwinW] (tap spacing m).
    qs, ks = [], []
    for a in taps:
        ia = a + t0s
        iam = m * ia
        for b in taps:
            ib = b + t0s
            ibm = m * ib
            qs.append(v0f[..., ia:ia + (tH - 1) * stride0 + 1:stride0,
                          ib:ib + (tW - 1) * stride0 + 1:stride0])
            ks.append(reb[..., iam:iam + XwinH, ibm:ibm + XwinW])
    qm = jnp.stack(qs, 3).reshape(BH, nTh, nTw, ps2 * F, tH * tW)
    km = jnp.stack(ks, 3).reshape(BH, nTh, nTw, ps2 * F, XwinH * XwinW)
    if mx_dtype is not None:
        qm = qm.astype(mx_dtype)
        km = km.astype(mx_dtype)
    # precision: the default TPU matmul precision is bf16-grade, which
    # breaks the <=1e-4 exactness contract vs the reference. "high"
    # (bf16x3, ~f32-accurate at 3 MXU passes) is the default; "highest"
    # (6 passes) is the paranoid mode; mx_dtype=bfloat16 is the explicit
    # opt-in half-precision fast path (precision flag then ignored).
    prec = None if mx_dtype is not None else {
        "high": lax.Precision.HIGH,
        "highest": lax.Precision.HIGHEST,
        "default": lax.Precision.DEFAULT,
    }[mx_precision]
    cc = jax.lax.dot_general(
        qm, km, (((3,), (3,)), ((0, 1, 2), (0, 1, 2))),
        precision=prec,
        preferred_element_type=fdtype)        # [BH,nTh,nTw,tH*tW,nwin]
    cc = cc.reshape(BH, nTh, nTw, tH, tW, XwinH, XwinW)

    # Row selection: query (i, j) needs window rows m*stride0*i + l0h(i,j)
    # + uh. Fusing (i, XwinH) makes that a strided diagonal: index
    # i*(XwinH + m*stride0) + rh — a static lax.slice per rh, then a
    # one-hot FMA over the residual rh - uh == l0h.
    sD = XwinH + m * stride0
    ccf = jnp.transpose(cc, (0, 1, 2, 4, 3, 5, 6)) \
        .reshape(BH, nTh, nTw, tW, tH * XwinH, XwinW)
    l0h_t = jnp.transpose(l0h_p, (0, 1, 2, 4, 3))[..., None]   # [..,tW,tH,1]
    rowsel = [jnp.zeros((BH, nTh, nTw, tW, tH, XwinW), fdtype)] * Sp
    for rh in range(nPh):
        d1 = lax.slice_in_dim(ccf, rh, rh + (tH - 1) * sD + 1, sD, axis=4)
        for uh in range(Sp):
            if not 0 <= rh - uh <= Lh:
                continue
            mh = (l0h_t == (rh - uh)).astype(fdtype)
            rowsel[uh] = rowsel[uh] + mh * d1
    crow = jnp.stack(rowsel, 0)               # [Sp,BH,nTh,nTw,tW,tH,XwinW]

    # Column selection: same diagonal trick on (j, XwinW).
    sD2 = XwinW + m * stride0
    crf = jnp.transpose(crow, (0, 1, 2, 3, 5, 4, 6)) \
        .reshape(Sp, BH, nTh, nTw, tH, tW * XwinW)
    l0w_e = l0w_p[None]                       # [1,BH,nTh,nTw,tH,tW]
    colsel = [jnp.zeros((Sp, BH, nTh, nTw, tH, tW), fdtype)] * Sp
    for pw in range(nPw):
        d2 = lax.slice_in_dim(crf, pw, pw + (tW - 1) * sD2 + 1, sD2, axis=5)
        for uw in range(Sp):
            if not 0 <= pw - uw <= Lw:
                continue
            mw = (l0w_e == (pw - uw)).astype(fdtype)
            colsel[uw] = colsel[uw] + mw * d2
    cc_win = jnp.stack(colsel, 1)             # [Sp_h,Sp_w,BH,nTh,nTw,tH,tW]

    if not dist_is_l2:
        return cc_win, None

    # X self-product fields: static double extraction (strided slices per
    # (rh, pw) — no matmul needed, the fields are precomputed globally),
    # then the same two one-hot passes.
    nX = xwin.shape[3]
    TPH = (tH - 1) * stride0 + 1
    TPW = (tW - 1) * stride0 + 1
    zero_x = jnp.zeros((nPw, BH, nTh, nTw, nX, tH, tW), fdtype)
    x_rows = [zero_x] * Sp
    for ph in range(nPh):
        yx = xwin[..., ph:ph + m * (TPH - 1) + 1:m * stride0, :]
        xrow = jnp.stack(
            [yx[..., pw:pw + m * (TPW - 1) + 1:m * stride0]
             for pw in range(nPw)], 0)        # [nPw,BH,nTh,nTw,nX,tH,tW]
        for uh in range(Sp):
            if not 0 <= ph - uh <= Lh:
                continue
            mh = (l0h_p[:, :, :, None] == (ph - uh)).astype(fdtype)[None]
            x_rows[uh] = x_rows[uh] + mh * xrow
    x_sel = jnp.stack(x_rows, 0)              # [Sp,nPw,...]
    x_win = []
    for uw in range(Sp):
        accx = 0.
        for pw in range(nPw):
            if not 0 <= pw - uw <= Lw:
                continue
            mw = (l0w_p[:, :, :, None] == (pw - uw)).astype(fdtype)[None]
            accx = accx + mw * x_sel[:, pw]
        x_win.append(accx)
    x_win = jnp.stack(x_win, 1)               # [Sp_h,Sp_w,...,nX,tH,tW]
    return cc_win, x_win


def cvr_query_geometry(vid_shape, flows, *, geo, ws, wt, stride0, stride1,
                       full_ws, is_int, row0=0, col0=0, tH=None, tW=None):
    """Per-query centers / window offsets / rebased tile shifts — the
    pure-geometry half of nls_cvr_volume, shared with `cvr_outliers` so
    exactness guards (bench.py) check the same math the engine runs.

    Returns dict(ctr_h, ctr_w, off_h, off_w, th, tw, k0h, k0w [query
    grids], bh_t, bw_t, l0h, l0w [P-major tiles], outliers
    [B,HD,T,W_t,nH,nW], pmajor/unpmajor closures, W_t, nTh, nTw, tH, tW).
    """
    B, HD, T, F, H, W = vid_shape
    m, su, Sp = geo["m"], geo["su"], geo["Sp"]
    Lh, Lw, nPh, nPw = geo["Lh"], geo["Lw"], geo["nPh"], geo["nPw"]
    ZMAX = geo["ZMAX"]
    fdtype = jnp.float32
    dtype = flows.dtype if jnp.issubdtype(flows.dtype, jnp.floating) \
        else fdtype
    W_t = min(2 * wt + 1, T)
    nH = flows.shape[-2]
    nW = flows.shape[-1]
    if tH is None:
        tH, tW = geo["tH"], geo["tW"]
        tH = min(tH, nH)
        tW = min(tW, nW)
        while nH % tH:
            tH -= 1
        while nW % tW:
            tW -= 1
    nTh, nTw = nH // tH, nW // tW
    BH = B * HD
    st_offset = W_t - flows.shape[3]
    assert st_offset in (0, 1)

    ref_h = ((row0 + jnp.arange(nH, dtype=jnp.int32)) * stride0) % H
    ref_w = ((col0 + jnp.arange(nW, dtype=jnp.int32)) * stride0) % W
    base_h = ref_h[None, None, None, None, :, None].astype(fdtype)
    base_w = ref_w[None, None, None, None, None, :].astype(fdtype)
    fH = flows[:, :, :, :, 1]
    fW = flows[:, :, :, :, 0]
    if st_offset == 1:
        zshape = fH.shape[:3] + (1,) + fH.shape[4:]
        zero = jnp.zeros(zshape, fH.dtype)
        fH = jnp.concatenate([zero, fH], axis=3)
        fW = jnp.concatenate([zero, fW], axis=3)
    ctr_h = reflect_bounds(base_h + fH, H)      # [B,HD,T,W_t,nH,nW]
    ctr_w = reflect_bounds(base_w + fW, W)
    off_h, off_w = search_offsets(ctr_h, ctr_w, stride1, ws, H, W,
                                  full_ws, is_int)
    rho_h = m * (ctr_h.astype(fdtype) - base_h) - su * off_h.astype(fdtype)
    rho_w = m * (ctr_w.astype(fdtype) - base_w) - su * off_w.astype(fdtype)
    k0h_f = jnp.floor(lax.stop_gradient(rho_h))
    k0w_f = jnp.floor(lax.stop_gradient(rho_w))
    th = (rho_h - k0h_f).astype(dtype)          # carries the flow gradient
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

    P = T * W_t

    def pmajor(x):
        """[B,HD,T,W_t,nH,nW] -> [P, BH, nTh, nTw, tH, tW]."""
        x = jnp.moveaxis(x.reshape(BH, T, W_t, nH, nW), 0, 2)
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
        """[P, BH, nTh, nTw, tH, tW] -> [B,HD,T,W_t,nH,nW]."""
        x = jnp.transpose(x_t, (0, 1, 2, 4, 3, 5)) \
            .reshape(T, W_t, BH, nH, nW)
        x = jnp.moveaxis(x, 2, 0)
        return x.reshape(B, HD, T, W_t, nH, nW)

    outliers = outliers | unpmajor(spill)
    return dict(ctr_h=ctr_h, ctr_w=ctr_w, off_h=off_h, off_w=off_w,
                th=th, tw=tw, bh_t=bh_t, bw_t=bw_t, l0h=l0h, l0w=l0w,
                outliers=outliers, pmajor=pmajor, unpmajor=unpmajor,
                W_t=W_t, nTh=nTh, nTw=nTw, tH=tH, tW=tW,
                base_h=base_h, base_w=base_w)


def cvr_outliers(vid_shape, flows, *, ws, wt, ps, stride0, stride1,
                 dist_type="l2", itype="float", flow_budget=8,
                 spread_budget=4, tile=(8, 16), dilation=1, use_adj=False,
                 full_ws=True, row0=0, col0=0):
    """Out-of-budget mask [B,HD,T,W_t,nH,nW] for the cvr engine — pure
    flow geometry, no video reads, no engine compile. The bench's
    exactness guard (bench.py) asserts this is all-False before timing."""
    is_int = (itype == "int")
    if is_int:
        stride1 = float(max(1, int(stride1)))
        flows = jnp.round(flows).astype(jnp.float32) \
            if jnp.issubdtype(flows.dtype, jnp.floating) \
            else flows.astype(jnp.float32)
    else:
        stride1 = float(stride1)
    geo = cvr_geometry(ws=ws, ps=ps, stride0=stride0, stride1=stride1,
                       dilation=dilation, flow_budget=flow_budget,
                       spread_budget=spread_budget, use_adj=use_adj,
                       tile=tile)
    assert geo is not None, "cvr path unsupported for this config"
    B, HD = vid_shape[:2]
    flows = _expand_flow_heads(flows, HD)
    qg = cvr_query_geometry(vid_shape, flows, geo=geo, ws=ws, wt=wt,
                            stride0=stride0, stride1=stride1,
                            full_ws=full_ws, is_int=is_int,
                            row0=row0, col0=col0)
    return qg["outliers"]


def nls_cvr_volume(vid0, vid1, flows, *, ws, wt, ps, stride0, stride1,
                   dist_type="l2", dilation=1, full_ws=True, use_adj=False,
                   itype="float", flow_budget=8, spread_budget=4,
                   tile=(8, 16), row0=0, col0=0, precomp=None,
                   engine="mx", mx_dtype=None, mx_precision="high",
                   return_aux=False):
    """Returns (dists [B,HD,T,W_t,ws,ws,nH,nW], inds3 [3,...],
    outliers [B,HD,T,W_t,nH,nW]); with return_aux=True the second output
    is instead the separable offset-factor dict (dt_tab/dh/dw/cdtype,
    same contract as ops.nls_k.search_aux) for the lazy top-K path —
    the full [3,...] index volume is never materialized.

    row0/col0 + banded flows (fewer rows/cols than the full query grid)
    restrict to a query band for memory-bounded streaming; `precomp`
    (from cvr_precompute) shares the padded surface/X fields across
    bands."""
    B, HD, T, F, H, W = vid0.shape
    assert vid1.shape[-2:] == (H, W)
    is_int = (itype == "int")
    if is_int:
        stride1 = float(max(1, int(stride1)))
        flows = jnp.round(flows).astype(jnp.float32) \
            if jnp.issubdtype(flows.dtype, jnp.floating) \
            else flows.astype(jnp.float32)
    else:
        stride1 = float(stride1)
    geo = cvr_geometry(ws=ws, ps=ps, stride0=stride0, stride1=stride1,
                       dilation=dilation, flow_budget=flow_budget,
                       spread_budget=spread_budget, use_adj=use_adj,
                       tile=tile)
    assert geo is not None, "cvr path unsupported for this config"
    m, su, Sp = geo["m"], geo["su"], geo["Sp"]
    Lh, Lw, nPh, nPw = geo["Lh"], geo["Lw"], geo["nPh"], geo["nPw"]
    ZMAX, taps, t0s, Eh = geo["ZMAX"], geo["taps"], geo["t0s"], geo["Eh"]
    pad1 = geo["pad1"]
    dist_is_l2 = (dist_type == "l2")
    dtype = vid0.dtype
    fdtype = jnp.float32
    nHq, nWq = num_queries(H, W, stride0)
    nH = flows.shape[-2]
    nW = flows.shape[-1]
    assert nH <= nHq and nW <= nWq
    BH = B * HD
    flows = _expand_flow_heads(flows, HD)

    # ---- per-query centers / offsets / rebased tiles (shared helper) ----
    qg = cvr_query_geometry(vid0.shape, flows, geo=geo, ws=ws, wt=wt,
                            stride0=stride0, stride1=stride1,
                            full_ws=full_ws, is_int=is_int,
                            row0=row0, col0=col0)
    W_t = qg["W_t"]
    tH, tW, nTh, nTw = qg["tH"], qg["tW"], qg["nTh"], qg["nTw"]
    ctr_h, ctr_w = qg["ctr_h"], qg["ctr_w"]
    off_h, off_w = qg["off_h"], qg["off_w"]
    th, tw = qg["th"].astype(dtype), qg["tw"].astype(dtype)
    bh_t, bw_t = qg["bh_t"], qg["bw_t"]
    l0h, l0w = qg["l0h"], qg["l0w"]
    outliers = qg["outliers"]
    pmajor = qg["pmajor"]
    base_h, base_w = qg["base_h"], qg["base_w"]

    # ---- frame-level fields ----
    if precomp is None:
        precomp = cvr_precompute(vid0, vid1, ws=ws, ps=ps, stride0=stride0,
                                 stride1=stride1, dist_type=dist_type,
                                 dilation=dilation, use_adj=use_adj,
                                 itype=itype, flow_budget=flow_budget,
                                 spread_budget=spread_budget, tile=tile)
    S_up = precomp["S_up"]          # [BH,T,F,Hu,Wu]
    v0e = precomp["v0e"]            # [BH,T,F,Hx,Wx]
    X_f = precomp.get("X_f")        # [BH,T,nX,Xh,Xw] (l2)
    ps0 = precomp.get("ps0")        # [BH,T,nHq,nWq] (l2)
    nX = len(X_E)

    # ---- static per-tile pixel origins ----
    TPH = (tH - 1) * stride0 + 1
    TPW = (tW - 1) * stride0 + 1
    TPHx, TPWx = TPH + Eh, TPW + Eh
    winH = m * (TPHx - 1) + nPh
    winW = m * (TPWx - 1) + nPw
    XwinH = m * (TPH - 1) + nPh
    XwinW = m * (TPW - 1) + nPw
    ty0 = [(row0 + i * tH) * stride0 for i in range(nTh)]
    tx0 = [(col0 + j * tW) * stride0 for j in range(nTw)]

    v0t = jnp.stack(
        [jnp.stack([v0e[:, :, :, ty0[i]:ty0[i] + TPHx,
                        tx0[j]:tx0[j] + TPWx]
                    for j in range(nTw)], 2)
         for i in range(nTh)], 2)     # [BH,T,nTh,nTw,F,TPHx,TPWx]

    if dist_is_l2:
        ps0_t = jnp.stack(
            [jnp.stack([ps0[:, :, row0 + i * tH:row0 + i * tH + tH,
                            col0 + j * tW:col0 + j * tW + tW]
                        for j in range(nTw)], 2)
             for i in range(nTh)], 2)  # [BH,T,nTh,nTw,tH,tW]

    P = T * W_t
    tj_tab = np.asarray(time_window_frames(T, wt))       # [T, W_t]
    t_arr = jnp.asarray(np.repeat(np.arange(T), W_t), jnp.int32)
    tj_arr = jnp.asarray(tj_tab.reshape(-1), jnp.int32)

    # dynamic-slice origins (up-grid): S_up window tap-0 of tile (i,j) is
    # at up index m*(ty0[i] - t0s + pad1) + b; X_f origin likewise (its
    # tap-sum is pre-applied, index shifted by -m*t0s, see cvr_precompute).
    ty0_a = jnp.asarray(ty0, jnp.int32)[None, None, :, None]
    tx0_a = jnp.asarray(tx0, jnp.int32)[None, None, None, :]
    oh_t = bh_t + m * (pad1 - t0s) + m * ty0_a     # [P,BH,nTh,nTw]
    ow_t = bw_t + m * (pad1 - t0s) + m * tx0_a
    xh_t = bh_t + m * (pad1 - t0s) + m * ty0_a
    xw_t = bw_t + m * (pad1 - t0s) + m * tx0_a

    th_t = pmajor(th)
    tw_t = pmajor(tw)

    ncr = 1 if is_int else 2
    _, _, init_val = dist_type_select(dist_type)

    def tap_tile(img):
        """[..., TPHx, TPWx] pixel field -> [..., tH, tW] patch sums."""
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
        tj_i = tj_arr[p_idx]
        sup = lax.dynamic_index_in_dim(S_up, tj_i, axis=1, keepdims=False)
        v0f = lax.dynamic_index_in_dim(v0t, t_i, axis=1, keepdims=False)
        if dist_is_l2:
            xf = lax.dynamic_index_in_dim(X_f, tj_i, axis=1, keepdims=False)
            p0 = lax.dynamic_index_in_dim(ps0_t, t_i, axis=1, keepdims=False)
        oh_p, ow_p = oh_t[p_idx], ow_t[p_idx]     # [BH,nTh,nTw]
        xh_p, xw_p = xh_t[p_idx], xw_t[p_idx]
        l0h_p = l0h[p_idx]                        # [BH,nTh,nTw,tH,tW]
        l0w_p = l0w[p_idx]

        # -- per-(bh, tile) window extraction: unrolled dynamic_slice --
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
                            xf[b], (0, xh_p[b, i, j], xw_p[b, i, j]),
                            (nX, XwinH, XwinW))
                        xr.append(xw_)
                rb.append(jnp.stack(rr, 0))
                if dist_is_l2:
                    xb.append(jnp.stack(xr, 0))
            rebs.append(jnp.stack(rb, 0))
            if dist_is_l2:
                xwins.append(jnp.stack(xb, 0))
        reb = jnp.stack(rebs, 0)      # [BH,nTh,nTw,F,winH,winW]
        if dist_is_l2:
            xwin = jnp.stack(xwins, 0)  # [BH,nTh,nTw,nX,XwinH,XwinW]

        if engine == "mx":
            cc_win, x_win = _select_mx(
                v0f, reb, xwin if dist_is_l2 else None, l0h_p, l0w_p,
                geo=geo, stride0=stride0, fdtype=fdtype, mx_dtype=mx_dtype,
                mx_precision=mx_precision)
        else:
            cc_win, x_win = _select_sweep(
                v0f, reb, xwin if dist_is_l2 else None, l0h_p, l0w_p,
                tap_tile, geo=geo, stride0=stride0, fdtype=fdtype)

        # -- bilinear-corner assembly --
        th_p = th_t[p_idx]
        tw_p = tw_t[p_idx]
        whc = (1. - th_p, th_p)
        wvc = (1. - tw_p, tw_p)
        dists = []
        for i in range(ws):
            for j in range(ws):
                oh, ow = su * i, su * j
                acc = p0 if dist_is_l2 else None
                for ch in range(ncr):
                    for cw in range(ncr):
                        ccv = cc_win[oh + ch, ow + cw]
                        term = ccv if is_int else whc[ch] * wvc[cw] * ccv
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
                                    if e[0] < 0 or (e[0] == 0 and e[1] < 0):
                                        e = (-e[0], -e[1])
                                        c_use = (ch2, cw2)
                                    fam = X_E.index(e)
                                    xv = x_win[oh + c_use[0],
                                               ow + c_use[1], :, :, :, fam]
                                    if is_int:
                                        acc = acc + xv
                                    else:
                                        wgt = (whc[ch] * wvc[cw]
                                               * whc[ch2] * wvc[cw2])
                                        acc = acc + wgt * xv
                dists.append(acc)
        d = jnp.stack(dists, 0).reshape(ws, ws, BH, nTh, nTw, tH, tW)
        d = jnp.transpose(d, (2, 0, 1, 3, 5, 4, 6)) \
            .reshape(BH, ws, ws, nH, nW)
        return d

    body = jax.checkpoint(pair_body)
    d_pairs = lax.map(body, jnp.arange(P, dtype=jnp.int32))
    d = d_pairs.reshape(T, W_t, B, HD, ws, ws, nH, nW)
    d = jnp.transpose(d, (2, 3, 0, 1, 4, 5, 6, 7))

    # ---- validity / outliers / inds3 (identical to the other paths) ----
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
    ok = valid_patch & ~outliers[:, :, :, :, None, None]
    d = jnp.where(ok, d.astype(dtype), inval)

    if return_aux:
        dt_a = jnp.asarray(tj_tab - np.arange(T)[:, None]).astype(cdtype)
        dh_a = prop_h - base_h[:, :, :, :, None]   # [B,HD,T,W_t,ws,nH,nW]
        dw_a = prop_w - base_w[:, :, :, :, None]
        if is_int:
            dh_a = dh_a.astype(cdtype)
            dw_a = dw_a.astype(cdtype)
        aux = dict(dt_tab=dt_a, dh=dh_a, dw=dw_a, cdtype=cdtype)
        return d, aux, outliers

    dt = (jnp.asarray(tj_tab) - np.arange(T)[:, None]).astype(cdtype)
    dh = (prop_h - base_h[:, :, :, :, None].astype(fdtype))[:, :, :, :, :, None]
    dw = (prop_w - base_w[:, :, :, :, None].astype(fdtype))[:, :, :, :, None, :]
    shape8 = d.shape
    inds3 = jnp.stack([
        jnp.broadcast_to(dt[None, None, :, :, None, None, None, None],
                         shape8).astype(cdtype),
        jnp.broadcast_to(dh, shape8).astype(cdtype),
        jnp.broadcast_to(dw, shape8).astype(cdtype),
    ], axis=0)
    return d, inds3, outliers
