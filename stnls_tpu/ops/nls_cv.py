"""Correlation-volume non-local search (the TPU-native fast path).

Same semantics as ops.nls.nls_search_volume (float/bilin2d or int path,
reflect_bounds=True, uniform sample step), reformulated so the hot loop is
DENSE — shifted-product FMAs and masked one-hot reductions — with **zero
gather/scatter ops** in forward or backward. Rationale (measured on v5e,
benchmarks/probe_honest.py + memory notes): XLA TPU random access costs
~9 ns/element while dense compute streams at full speed, so the
reference's CUDA design point (one thread per query doing random patch
reads, non_local_search_bilin2d_kernel.cu) is exactly wrong for TPU; the
right shape is a PWC-Net-style cost volume.

Decomposition (indices on the "up grid" of spacing step = 1/m):
  1. Candidate positions of query q lie at base(q) + (k0(q) + su*i + c
     + theta(q))/m for cells i in [0,ws), corners c in {0,1}; candidate
     *values* are exact lerps between adjacent up-grid samples of the
     piecewise-bilinear surface of vid1 (the surface has no kink strictly
     inside a 1/m cell), so everything reduces to integer up-grid shifts
     kappa plus per-query corner weights (1-theta, theta).
  2. CC[kappa][q] = patchsum_pix <vid0[q+pix], SURF[(q+pix) + kappa/m]>
     is built densely for every kappa in the static window
     [-EXTm, EXTm+m-1]^2 via shifted elementwise products contracted over
     F (VPU — the F=8..16 contraction is too thin for the MXU to win).
     L2 additionally needs patch-sums of surface self-products
     X_e = <SURF[u], SURF[u+e]>, whose kappa-dependence is a pure image
     shift, so they are built once per frame and sliced.
  3. Per-query selection of the Sp x Sp window at k0(q) is a separable
     masked one-hot reduction over kappa — dense compare+FMA,
     differentiable, no gather. Queries whose flow exceeds the static
     `flow_budget` are flagged in `outliers` and invalidated; the caller
     patches those entries up exactly (they are rare for real flows) or
     widens the budget.

Reference semantics anchors: non_local_search_bilin2d_kernel.cu,
nls_int.cu, shared_kernel.cu:248-287 (set_search_offsets). Cross-validated
against ops.nls.nls_search_volume in tests/search/test_cv_path.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from stnls_tpu.ops.geometry import (
    reflect_bounds, in_bounds, num_queries, time_window_frames, search_offsets,
)
from stnls_tpu.ops.nls import dist_type_select, _expand_flow_heads

X_E = [(0, 0), (0, 1), (1, 0), (1, 1), (1, -1)]


def cv_step(stride1):
    """(m, su) with stride1 = su/m, step = 1/m; None if non-uniform."""
    s1 = float(stride1)
    if s1 <= 0:
        return None
    if s1.is_integer():
        return 1, int(s1)
    inv = 1.0 / s1
    if abs(inv - round(inv)) < 1e-6:
        return int(round(inv)), 1
    return None


def cv_geometry(*, ws, ps, stride1, dilation, flow_budget):
    m, su = cv_step(stride1)
    wspan = su * (ws - 1)
    Sp = wspan + 2
    ZMAX = -(-(m * flow_budget + wspan + 2) // m)
    EXTm = m * ZMAX
    Dk = m * (2 * ZMAX + 1)
    pad1 = ZMAX + dilation * (ps - 1) + 3
    return m, su, wspan, Sp, ZMAX, EXTm, Dk, pad1


def cv_supported(*, itype, pt, stride1, reflect_bounds, ws, ps, dilation,
                 flow_budget, H, W):
    if pt != 1 or not reflect_bounds:
        return False
    if itype == "int":
        stride1 = max(1, int(stride1))
    if cv_step(stride1) is None:
        return False
    pad1 = cv_geometry(ws=ws, ps=ps, stride1=stride1, dilation=dilation,
                       flow_budget=flow_budget)[-1]
    pad0 = dilation * (ps - 1) + 1
    return max(pad1, pad0) <= min(H, W) - 1


def _select_window(vol, k0, lo, Sp):
    """out[u] = vol[k0 - lo + u] via dense one-hot masked reduction along
    the leading axis (no gather; the backward is the transposed mask).

    vol [Dk, ...], k0 broadcastable to vol.shape[1:] (int32, pre-clipped
    so that k0 - lo + Sp - 1 < Dk). Returns [Sp, ...]."""
    Dk = vol.shape[0]
    kk = jnp.arange(Dk, dtype=jnp.int32).reshape(
        (Dk,) + (1,) * (vol.ndim - 1))
    tgt = (k0 - lo)[None]
    outs = []
    for u in range(Sp):
        mask = (kk == tgt + u).astype(vol.dtype)
        outs.append(jnp.sum(mask * vol, axis=0))
    return jnp.stack(outs, 0)


def nls_cv_volume(vid0, vid1, flows, *, ws, wt, ps, stride0, stride1,
                  dist_type="l2", dilation=1, full_ws=True, use_adj=False,
                  itype="float", flow_budget=8, tile_q=None,
                  spread_budget=4):
    """Returns (dists [B,HD,T,W_t,ws,ws,nH,nW], inds3 [3,...],
    outliers [B,HD,T,W_t,nH,nW] bool). Outlier entries carry init-valued
    dists; callers must patch them up for exactness beyond flow_budget.

    tile_q=(TH, TW): rebase each TH x TW query tile to its own minimum
    integer shift so the kappa domain shrinks from the global flow range
    to the tile-local spread (`spread_budget` pixels) — the construction
    and selection costs are O(domain^2), so this is ~10x on smooth flows.
    Tiles whose local spread exceeds the budget flag their spilling
    queries as outliers (exact like the global budget)."""
    B, HD, T, F, H, W = vid0.shape
    kH, kW = vid1.shape[-2:]
    assert (H, W) == (kH, kW), "cv path assumes matching frame sizes"
    is_int = (itype == "int")
    patch_offset = 0 if use_adj else -(ps // 2)
    W_t = min(2 * wt + 1, T)
    nH, nW = num_queries(H, W, stride0)
    st_offset = W_t - flows.shape[3]
    assert st_offset in (0, 1)
    if is_int:
        stride1 = float(max(1, int(stride1)))
        flows = jnp.round(flows).astype(jnp.int32) \
            if jnp.issubdtype(flows.dtype, jnp.floating) \
            else flows.astype(jnp.int32)
    else:
        stride1 = float(stride1)
    m, su, wspan, Sp, ZMAX, EXTm, Dk, pad1 = cv_geometry(
        ws=ws, ps=ps, stride1=stride1, dilation=dilation,
        flow_budget=flow_budget)
    dtype = vid0.dtype
    dist_is_l2 = (dist_type == "l2")
    pad0 = dilation * (ps - 1) + 1
    assert max(pad1, pad0) <= min(H, W) - 1, "frame too small for cv path"
    taps = [dilation * (p + patch_offset) for p in range(ps)]
    t0s = -min(taps)
    Eh = dilation * (ps - 1)
    Hx, Wx = H + Eh, W + Eh
    BH = B * HD
    KLO = -EXTm                      # kappa domain [KLO, KLO + Dk)

    # ---- centers / window offsets / inds3 (as in ops.nls_warp) ----
    tj_tab = np.asarray(time_window_frames(T, wt))  # [T, W_t] static
    flows = _expand_flow_heads(flows, HD)
    cdtype = jnp.int32 if is_int else dtype
    ref_h = (jnp.arange(nH, dtype=jnp.int32) * stride0) % H
    ref_w = (jnp.arange(nW, dtype=jnp.int32) * stride0) % W
    base_h = ref_h[None, None, None, None, :, None].astype(cdtype)
    base_w = ref_w[None, None, None, None, None, :].astype(cdtype)
    fH = flows[:, :, :, :, 1]
    fW = flows[:, :, :, :, 0]
    if st_offset == 1:
        zshape = fH.shape[:3] + (1,) + fH.shape[4:]
        zero = jnp.zeros(zshape, fH.dtype)
        fH = jnp.concatenate([zero, fH], axis=3)
        fW = jnp.concatenate([zero, fW], axis=3)
    ctr_h = reflect_bounds(base_h + fH, H)    # [B,HD,T,W_t,nH,nW]
    ctr_w = reflect_bounds(base_w + fW, W)
    off_h, off_w = search_offsets(ctr_h, ctr_w, stride1, ws, H, W,
                                  full_ws, is_int)
    cells = jnp.arange(ws, dtype=cdtype)
    s1c = jnp.asarray(stride1, cdtype)
    prop_h = ctr_h[:, :, :, :, None] + s1c * (cells[:, None, None]
                                              - off_h[:, :, :, :, None])
    prop_w = ctr_w[:, :, :, :, None] + s1c * (cells[:, None, None]
                                              - off_w[:, :, :, :, None])
    valid_patch = (in_bounds(prop_h, H)[:, :, :, :, :, None] &
                   in_bounds(prop_w, W)[:, :, :, :, None, :])

    # ---- per-query lattice anchor on the up grid ----
    fdt = dtype if dtype == jnp.float64 else jnp.float32
    rho_h = m * (ctr_h.astype(fdt) - base_h.astype(fdt)) \
        - su * off_h.astype(fdt)
    rho_w = m * (ctr_w.astype(fdt) - base_w.astype(fdt)) \
        - su * off_w.astype(fdt)
    k0h_f = jnp.floor(lax.stop_gradient(rho_h))
    k0w_f = jnp.floor(lax.stop_gradient(rho_w))
    th = (rho_h - k0h_f).astype(dtype)        # in [0,1); carries flow grad
    tw = (rho_w - k0w_f).astype(dtype)
    k0h = k0h_f.astype(jnp.int32)
    k0w = k0w_f.astype(jnp.int32)
    KHI = KLO + Dk - 1
    out_h = (k0h < KLO) | (k0h + Sp - 1 > KHI)
    out_w = (k0w < KLO) | (k0w + Sp - 1 > KHI)
    outliers = out_h | out_w                  # [B,HD,T,W_t,nH,nW]
    k0h = jnp.clip(k0h, KLO, KHI - Sp + 1)
    k0w = jnp.clip(k0w, KLO, KHI - Sp + 1)
    if is_int:
        th = jnp.zeros_like(th)
        tw = jnp.zeros_like(tw)

    # ---- padded videos ----
    v0p = jnp.pad(vid0, ((0, 0),) * 4 + ((pad0, pad0), (pad0, pad0)),
                  mode="reflect")
    v1p = jnp.pad(vid1, ((0, 0),) * 4 + ((pad1, pad1), (pad1, pad1)),
                  mode="reflect")
    o0 = pad0 - t0s
    v0e = v0p[..., o0:o0 + Hx, o0:o0 + Wx].reshape(BH, T, F, Hx, Wx)

    # surface phase images UP[ph][pw][x_pad] = SURF(x_pad + (ph,pw)/m)
    v1r = v1p.reshape(BH, T, F, H + 2 * pad1, W + 2 * pad1)
    if m > 1:
        UP = []
        for ph in range(m):
            row = []
            for pw in range(m):
                a, b = ph / m, pw / m
                row.append((1 - a) * (1 - b) * v1r[..., :-1, :-1]
                           + (1 - a) * b * v1r[..., :-1, 1:]
                           + a * (1 - b) * v1r[..., 1:, :-1]
                           + a * b * v1r[..., 1:, 1:])
            UP.append(row)
    else:
        UP = [[v1r]]
    H1, W1 = UP[0][0].shape[-2:]

    def tapsum2d(img, stride=None):
        """Patch-sum over pixel taps + query-grid subsample. img
        [..., Y, X] where index (t0s + y) holds pixel row y."""
        s0 = stride0 if stride is None else stride
        acc = 0.
        for a in taps:
            ia = a + t0s
            ya = img[..., ia:ia + (nH - 1) * s0 + 1:s0, :]
            for b in taps:
                ib = b + t0s
                acc = acc + ya[..., ib:ib + (nW - 1) * s0 + 1:s0]
        return acc

    # ---- L2 static images ----
    if dist_is_l2:
        ps0 = tapsum2d(jnp.sum(v0e * v0e, axis=2))   # [BH,T,nH,nW]

        def surf_img(pu_h, pu_w):
            ch, zh = pu_h % m, pu_h // m
            cw, zw = pu_w % m, pu_w // m
            return UP[ch][cw], zh, zw

        # PSXS[e][ph][pw][j] = patchsum_a X_e at up-coord
        # m*(j + a + OXG) + (ph,pw): img support j in [0, H1-2-Eh).
        # OXG is the image-coord origin: j + OXG = x_pad of the first tap.
        OXG = 1 - t0s  # x_pad = j + a + 1 - t0s + t0s... see slicing below
        PSXS = {}
        for e in X_E:
            per_ph = []
            for ph in range(m):
                rowp = []
                for pw in range(m):
                    ua, za, wa = surf_img(ph, pw)
                    ub, zb, wb = surf_img(ph + e[0], pw + e[1])
                    # pixel-product on x_pad in [1, H1-1) (slack for the
                    # +-1 carries of e); prod[i] = X_e at x_pad = i+1
                    A = ua[..., 1 + za:H1 - 1 + za, 1 + wa:W1 - 1 + wa]
                    Bm = ub[..., 1 + zb:H1 - 1 + zb, 1 + wb:W1 - 1 + wb]
                    prod = jnp.sum(A * Bm, axis=2)   # [BH,T,H1-2,W1-2]
                    # tap-sum: PSXS[j] = sum_a prod_at_xpad(j + a + t0s+1)
                    #   => index i = j + (a + t0s)
                    acc = 0.
                    Lh = prod.shape[-2] - Eh
                    Lw = prod.shape[-1] - Eh
                    for a in taps:
                        ia = a + t0s
                        pa = prod[..., ia:ia + Lh, :]
                        for b in taps:
                            ib = b + t0s
                            acc = acc + pa[..., ib:ib + Lw]
                    rowp.append(acc)  # [BH,T,Lh,Lw]; j+OXP = x_pad of tap0
                per_ph.append(rowp)
            PSXS[e] = per_ph
        # PSXS[j] covers x_pad = j + 1 + t0s for the a=-t0s tap =>
        # value at query row y, shift z lives at j = y + pad1 + z - 1.
        PSX_stack = {e: jnp.stack([jnp.stack(r, 0) for r in PSXS[e]], 0)
                     for e in X_E}  # [m, m, BH, T, Lh, Lw]
        Lh, Lw = PSX_stack[X_E[0]].shape[-2:]

    # ---- per-(t, slot) volume build + selection + assembly ----
    pairs = np.stack([np.repeat(np.arange(T), W_t),
                      tj_tab.reshape(-1),
                      np.tile(np.arange(W_t), T)], 1)  # [T*W_t, 3]
    UP_stack = jnp.stack([jnp.stack(r, 0) for r in UP], 0)
    # [m, m, BH, T, F, H1, W1]
    k0h_p = jnp.moveaxis(k0h.reshape(B * HD, T, W_t, nH, nW), 0, 2) \
        .reshape(T * W_t, BH, nH, nW)
    k0w_p = jnp.moveaxis(k0w.reshape(B * HD, T, W_t, nH, nW), 0, 2) \
        .reshape(T * W_t, BH, nH, nW)
    th_p = jnp.moveaxis(th.reshape(B * HD, T, W_t, nH, nW), 0, 2) \
        .reshape(T * W_t, BH, nH, nW)
    tw_p = jnp.moveaxis(tw.reshape(B * HD, T, W_t, nH, nW), 0, 2) \
        .reshape(T * W_t, BH, nH, nW)
    pairs_j = jnp.asarray(pairs, jnp.int32)
    r1 = pad1 - t0s
    zs = list(range(-ZMAX, ZMAX + 1))
    _, _, init_val = dist_type_select(dist_type)
    P = T * W_t

    # ---- optional query tiling: rebase each tile to its min shift ----
    use_tiles = False
    if tile_q is not None:
        TH, TW = tile_q
        TH = TH or nH
        TW = TW or nW
        use_tiles = (nH % TH == 0) and (nW % TW == 0) \
            and (TH, TW) != (nH, nW)
    if use_tiles:
        nTh, nTw = nH // TH, nW // TW
        ntiles = nTh * nTw
        ZL = spread_budget + -(-(Sp + 1) // m)
        Dloc = m * ZL
        TPH = (TH - 1) * stride0 + 1   # tile pixel extent
        TPW = (TW - 1) * stride0 + 1
        TPHx, TPWx = TPH + Eh, TPW + Eh
        HL = TPHx + ZL
        WL = TPWx + ZL
        KHI_t = KHI - Dloc + 1

        def tileify(x_p):
            """[P,BH,nH,nW] -> [P,BH,ntiles,TH,TW]."""
            x = x_p.reshape(P, BH, nTh, TH, nTw, TW)
            return jnp.transpose(x, (0, 1, 2, 4, 3, 5)) \
                .reshape(P, BH, ntiles, TH, TW)

        k0h_t = tileify(k0h_p)
        k0w_t = tileify(k0w_p)
        m_th = jnp.clip(jnp.min(k0h_t, axis=(3, 4)), KLO, KHI_t)
        m_tw = jnp.clip(jnp.min(k0w_t, axis=(3, 4)), KLO, KHI_t)
        l0h = k0h_t - m_th[..., None, None]
        l0w = k0w_t - m_tw[..., None, None]
        spill = (l0h > Dloc - Sp) | (l0w > Dloc - Sp) | (l0h < 0) | (l0w < 0)
        l0h = jnp.clip(l0h, 0, Dloc - Sp)
        l0w = jnp.clip(l0w, 0, Dloc - Sp)

        def untileify_mask(s_t):
            s = s_t.reshape(P, BH, nTh, nTw, TH, TW)
            s = jnp.transpose(s, (0, 1, 2, 4, 3, 5)).reshape(P, BH, nH, nW)
            return s

        spill_p = untileify_mask(spill)  # [P,BH,nH,nW]
        spill_full = jnp.moveaxis(
            spill_p.reshape(T, W_t, B, HD, nH, nW), (2, 3), (0, 1)) \
            .reshape(B, HD, T, W_t, nH, nW)
        outliers = outliers | spill_full
        th_t = tileify(th_p)
        tw_t = tileify(tw_p)
        # static per-tile pixel origins
        ty0 = np.repeat(np.arange(nTh), nTw) * TH * stride0  # [ntiles]
        tx0 = np.tile(np.arange(nTw), nTh) * TW * stride0
        if dist_is_l2:
            ps0_t = jnp.transpose(
                ps0.reshape(BH, T, nTh, TH, nTw, TW), (0, 1, 2, 4, 3, 5)) \
                .reshape(BH, T, ntiles, TH, TW)

    def pair_body(p_idx):
        t_i, tj_i, _ = pairs_j[p_idx, 0], pairs_j[p_idx, 1], pairs_j[p_idx, 2]
        v0f = lax.dynamic_index_in_dim(v0e, t_i, axis=1, keepdims=False)
        upf = lax.dynamic_index_in_dim(UP_stack, tj_i, axis=3,
                                       keepdims=False)
        # v0f [BH,F,Hx,Wx]; upf [m,m,BH,F,H1,W1]
        k0h_i = k0h_p[p_idx]
        k0w_i = k0w_p[p_idx]
        th_i = th_p[p_idx]
        tw_i = tw_p[p_idx]
        if dist_is_l2:
            psx_f = {e: lax.dynamic_index_in_dim(PSX_stack[e], tj_i, axis=3,
                                                 keepdims=False)
                     for e in X_E}
            ps0_i = lax.dynamic_index_in_dim(ps0, t_i, axis=1,
                                             keepdims=False)

        nfam = 1 + (len(X_E) if dist_is_l2 else 0)

        def zh_body(_, zh):
            rows = []
            for ph in range(m):
                # CC family
                fam_rows = []
                cc_pw = []
                for pw in range(m):
                    u = upf[ph, pw]  # [BH,F,H1,W1]
                    usl = lax.dynamic_slice_in_dim(u, r1 + zh, Hx, axis=2)
                    terms = []
                    for zw in zs:
                        vsl = usl[..., r1 + zw:r1 + zw + Wx]
                        terms.append(jnp.sum(v0f * vsl, axis=1))
                    cc_pw.append(jnp.stack(terms, 0))  # [n_z,BH,Hx,Wx]
                cc = jnp.stack(cc_pw, 1)               # [n_z,m,BH,Hx,Wx]
                cc = cc.reshape((Dk,) + cc.shape[2:])
                fam_rows.append(tapsum2d(cc))          # [Dk,BH,nH,nW]
                if dist_is_l2:
                    rx = pad1 - 1 - t0s
                    for e in X_E:
                        x_pw = []
                        for pw in range(m):
                            img = psx_f[e][ph, pw]     # [BH,Lh,Lw]
                            ysl = lax.dynamic_slice_in_dim(
                                img, rx + zh, (nH - 1) * stride0 + 1,
                                axis=1)
                            ysl = ysl[:, ::stride0]
                            terms = []
                            for zw in zs:
                                xsl = ysl[..., rx + zw:rx + zw
                                          + (nW - 1) * stride0 + 1]
                                terms.append(xsl[..., ::stride0])
                            x_pw.append(jnp.stack(terms, 0))
                        xr = jnp.stack(x_pw, 1)
                        xr = xr.reshape((Dk,) + xr.shape[2:])
                        fam_rows.append(xr)            # [Dk,BH,nH,nW]
                rows.append(jnp.stack(fam_rows, 0))    # [nfam,Dk,...]
            return None, jnp.stack(rows, 0)  # [m,nfam,Dk,BH,nH,nW]

        _, volrows = lax.scan(zh_body, None,
                              jnp.arange(-ZMAX, ZMAX + 1, dtype=jnp.int32))
        # volrows [n_z, m, nfam, Dkw, BH, nH, nW] -> [Dkh, ...]
        vol = volrows.reshape((Dk,) + volrows.shape[2:])

        # -- separable masked selection of the Sp x Sp window --
        colv = _select_window(vol, k0h_i[None, None], KLO, Sp)
        # colv [Sp_h, nfam, Dkw, BH, nH, nW] -> kw axis leading
        colv = jnp.moveaxis(colv, 2, 0)
        val = _select_window(colv, k0w_i[None, None], KLO, Sp)
        # val [Sp_w, Sp_h, nfam, BH, nH, nW]
        val = jnp.moveaxis(val, 0, 1)  # [Sp_h, Sp_w, nfam, ...]

        # -- assembly --
        whc = (1. - th_i, th_i)
        wvc = (1. - tw_i, tw_i)
        ncr = 1 if is_int else 2
        cc_win = val[:, :, 0]
        dists = []
        for i in range(ws):
            for j in range(ws):
                oh, ow = su * i, su * j
                acc = 0.
                if dist_is_l2:
                    acc = acc + ps0_i
                for ch in range(ncr):
                    for cw in range(ncr):
                        wgt = whc[ch] * wvc[cw]
                        cc_v = cc_win[oh + ch, ow + cw]
                        if dist_is_l2:
                            acc = acc - 2. * wgt * cc_v
                        else:
                            acc = acc + wgt * cc_v
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
                                    fam = 1 + X_E.index(e)
                                    wgt = (whc[ch] * wvc[cw]
                                           * whc[ch2] * wvc[cw2])
                                    acc = acc + wgt * val[
                                        oh + c_use[0], ow + c_use[1], fam]
                dists.append(acc)
        d = jnp.stack(dists, 0).reshape(ws, ws, BH, nH, nW)
        return jnp.moveaxis(d, 2, 0)  # [BH, ws, ws, nH, nW]

    def pair_body_tiled(p_idx):
        t_i, tj_i = pairs_j[p_idx, 0], pairs_j[p_idx, 1]
        v0f = lax.dynamic_index_in_dim(v0e, t_i, axis=1, keepdims=False)
        upf = lax.dynamic_index_in_dim(UP_stack, tj_i, axis=3,
                                       keepdims=False)
        m_th_i = m_th[p_idx]      # [BH, ntiles]
        m_tw_i = m_tw[p_idx]
        l0h_i = l0h[p_idx]        # [BH, ntiles, TH, TW]
        l0w_i = l0w[p_idx]
        th_i = th_t[p_idx]
        tw_i = tw_t[p_idx]
        if dist_is_l2:
            psx_f = {e: lax.dynamic_index_in_dim(PSX_stack[e], tj_i, axis=3,
                                                 keepdims=False)
                     for e in X_E}
            ps0_i = lax.dynamic_index_in_dim(ps0_t, t_i, axis=1,
                                             keepdims=False)
        nfam = 1 + (len(X_E) if dist_is_l2 else 0)

        # -- per-(bh, tile, local-phase) dynamic windows of the surface --
        pt_h = m_th_i % m                       # [BH, ntiles], in [0,m)
        zt_h = (m_th_i - pt_h) // m
        pt_w = m_tw_i % m
        zt_w = (m_tw_i - pt_w) // m
        qr = jnp.arange(m, dtype=jnp.int32)
        phh = pt_h[:, :, None] + qr             # [BH, ntiles, m]
        pww = pt_w[:, :, None] + qr
        ph_mod, ch_car = phh % m, phh // m
        pw_mod, cw_car = pww % m, pww // m
        ty0j = jnp.asarray(ty0, jnp.int32)
        tx0j = jnp.asarray(tx0, jnp.int32)
        row0 = r1 + zt_h[:, :, None] + ch_car + ty0j[None, :, None]
        col0 = r1 + zt_w[:, :, None] + cw_car + tx0j[None, :, None]
        shp4 = (BH, ntiles, m, m)
        PH = jnp.broadcast_to(ph_mod[:, :, :, None], shp4).reshape(-1)
        PW = jnp.broadcast_to(pw_mod[:, :, None, :], shp4).reshape(-1)
        R0 = jnp.broadcast_to(row0[:, :, :, None], shp4).reshape(-1)
        C0 = jnp.broadcast_to(col0[:, :, None, :], shp4).reshape(-1)
        BHI = jnp.broadcast_to(
            jnp.arange(BH, dtype=jnp.int32)[:, None, None, None],
            shp4).reshape(-1)

        def slice_up(ph_i, pw_i, bh_i, r0, c0):
            sl = lax.dynamic_slice(upf, (ph_i, pw_i, bh_i, 0, r0, c0),
                                   (1, 1, 1, F, HL, WL))
            return sl[0, 0, 0]

        UPloc = jax.vmap(slice_up)(PH, PW, BHI, R0, C0) \
            .reshape(BH, ntiles, m, m, F, HL, WL)

        v0t = jnp.stack(
            [v0f[..., ty0[ti]:ty0[ti] + TPHx, tx0[ti]:tx0[ti] + TPWx]
             for ti in range(ntiles)], 1)       # [BH, ntiles, F, TPHx, TPWx]

        if dist_is_l2:
            rx = pad1 - 1 - t0s
            rowx0 = rx + zt_h[:, :, None] + ch_car + ty0j[None, :, None]
            colx0 = rx + zt_w[:, :, None] + cw_car + tx0j[None, :, None]
            RX = jnp.broadcast_to(rowx0[:, :, :, None], shp4).reshape(-1)
            CX = jnp.broadcast_to(colx0[:, :, None, :], shp4).reshape(-1)
            HLX = TPH + ZL - 1
            WLX = TPW + ZL - 1
            XLOC = {}
            for e in X_E:
                img = psx_f[e]   # [m, m, BH, Lh, Lw]

                def slice_x(ph_i, pw_i, bh_i, r0, c0, img=img):
                    sl = lax.dynamic_slice(img, (ph_i, pw_i, bh_i, r0, c0),
                                           (1, 1, 1, HLX, WLX))
                    return sl[0, 0, 0]

                XLOC[e] = jax.vmap(slice_x)(PH, PW, BHI, RX, CX) \
                    .reshape(BH, ntiles, m, m, HLX, WLX)

        def tapsum_tile(img):
            acc = 0.
            for a in taps:
                ia = a + t0s
                ya = img[..., ia:ia + (TH - 1) * stride0 + 1:stride0, :]
                for b in taps:
                    ib = b + t0s
                    acc = acc + ya[..., ib:ib + (TW - 1) * stride0 + 1:
                                   stride0]
            return acc

        def zh_body(_, zl):
            rows = []
            for qh in range(m):
                fam_rows = []
                cc_pw = []
                for qw in range(m):
                    ul = UPloc[:, :, qh, qw]    # [BH,ntiles,F,HL,WL]
                    usl = lax.dynamic_slice_in_dim(ul, zl, TPHx, axis=3)
                    terms = []
                    for zw in range(ZL):
                        vsl = usl[..., zw:zw + TPWx]
                        terms.append(jnp.sum(v0t * vsl, axis=2))
                    cc_pw.append(jnp.stack(terms, 0))
                cc = jnp.stack(cc_pw, 1)        # [ZL,m,BH,ntiles,TPHx,TPWx]
                cc = cc.reshape((Dloc,) + cc.shape[2:])
                fam_rows.append(tapsum_tile(cc))  # [Dloc,BH,ntiles,TH,TW]
                if dist_is_l2:
                    for e in X_E:
                        x_pw = []
                        for qw in range(m):
                            xim = XLOC[e][:, :, qh, qw]  # [BH,ntiles,HLX,WLX]
                            ysl = lax.dynamic_slice_in_dim(
                                xim, zl, (TH - 1) * stride0 + 1, axis=2)
                            ysl = ysl[..., ::stride0, :]
                            terms = []
                            for zw in range(ZL):
                                xsl = ysl[..., zw:zw
                                          + (TW - 1) * stride0 + 1]
                                terms.append(xsl[..., ::stride0])
                            x_pw.append(jnp.stack(terms, 0))
                        xr = jnp.stack(x_pw, 1)
                        fam_rows.append(xr.reshape((Dloc,) + xr.shape[2:]))
                rows.append(jnp.stack(fam_rows, 0))
            return None, jnp.stack(rows, 0)  # [m,nfam,Dloc,BH,ntiles,TH,TW]

        _, volrows = lax.scan(zh_body, None,
                              jnp.arange(ZL, dtype=jnp.int32))
        vol = volrows.reshape((Dloc,) + volrows.shape[2:])

        colv = _select_window(vol, l0h_i[None, None], 0, Sp)
        colv = jnp.moveaxis(colv, 2, 0)
        val = _select_window(colv, l0w_i[None, None], 0, Sp)
        val = jnp.moveaxis(val, 0, 1)  # [Sp_h, Sp_w, nfam, BH, ntiles, TH, TW]

        whc = (1. - th_i, th_i)
        wvc = (1. - tw_i, tw_i)
        ncr = 1 if is_int else 2
        cc_win = val[:, :, 0]
        dists = []
        for i in range(ws):
            for j in range(ws):
                oh, ow = su * i, su * j
                acc = 0.
                if dist_is_l2:
                    acc = acc + ps0_i
                for ch in range(ncr):
                    for cw in range(ncr):
                        wgt = whc[ch] * wvc[cw]
                        cc_v = cc_win[oh + ch, ow + cw]
                        if dist_is_l2:
                            acc = acc - 2. * wgt * cc_v
                        else:
                            acc = acc + wgt * cc_v
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
                                    fam = 1 + X_E.index(e)
                                    wgt = (whc[ch] * wvc[cw]
                                           * whc[ch2] * wvc[cw2])
                                    acc = acc + wgt * val[
                                        oh + c_use[0], ow + c_use[1], fam]
                dists.append(acc)
        d = jnp.stack(dists, 0).reshape(ws, ws, BH, ntiles, TH, TW)
        d = d.reshape(ws, ws, BH, nTh, nTw, TH, TW)
        d = jnp.transpose(d, (2, 0, 1, 3, 5, 4, 6)) \
            .reshape(BH, ws, ws, nH, nW)
        return d

    body = jax.checkpoint(pair_body_tiled if use_tiles else pair_body)
    d_pairs = lax.map(body, jnp.arange(T * W_t, dtype=jnp.int32))
    # [T*W_t, BH, ws, ws, nH, nW] -> [B,HD,T,W_t,ws,ws,nH,nW]
    d = d_pairs.reshape(T, W_t, B, HD, ws, ws, nH, nW)
    d = jnp.transpose(d, (2, 3, 0, 1, 4, 5, 6, 7))

    inval = jnp.asarray(init_val, dtype)
    ok = valid_patch & ~outliers[:, :, :, :, None, None]
    d = jnp.where(ok, d, inval)

    # ---- offsets (identical to the other paths) ----
    dt = (jnp.asarray(tj_tab) - np.arange(T)[:, None]).astype(cdtype)
    dh = (prop_h - base_h[:, :, :, :, None].astype(cdtype))[:, :, :, :, :, None]
    dw = (prop_w - base_w[:, :, :, :, None].astype(cdtype))[:, :, :, :, None, :]
    shape8 = d.shape
    inds3 = jnp.stack([
        jnp.broadcast_to(dt[None, None, :, :, None, None, None, None],
                         shape8).astype(cdtype),
        jnp.broadcast_to(dh, shape8).astype(cdtype),
        jnp.broadcast_to(dw, shape8).astype(cdtype),
    ], axis=0)
    return d, inds3, outliers
