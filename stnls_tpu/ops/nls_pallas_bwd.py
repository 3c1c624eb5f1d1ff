"""Backward Pallas kernel for the fused non-local search volume.

Given the cotangent of the [ws,ws] distance volume, emits grads to the
padded rows-major videos (v0e, v1p) and to the bilinear corner weights
(th, tw). Structure mirrors the forward (ops/nls_pallas.py) in reverse:

  A. recompute the forward per-tile state (windows, phase images A,
     tap-summed X_e fields, selected CC/X windows) — checkpoint-style,
     nothing search-volume-sized is ever stored in HBM;
  B. assembly backward: distance -> selected-window cotangents g_acc and
     the corner-weight grads g_th/g_tw (needs the recomputed CC/X values);
  C. selection/product backward: spread g_acc over the dense shift domain
     with the transposed one-hot masks, transpose the ps x ps tap-sum as
     9 shifted adds, and accumulate window grads for v0, the phase images
     (g_ast) and the X fields (g_xst);
  D/E. X-field and phase-image build backward (linear, static slices);
  F. read-modify-write DMA of the window grads into the full g_v0e/g_v1p
     HBM buffers (input_output_aliased zeros). TPU Pallas grids execute
     sequentially, so the RMW accumulation is race-free — this is the
     deterministic replacement for the reference's atomicAdd backward
     (lib/csrc/search/nls_bilin2d.cu:171-180, shared_kernel.cu:918-1053).

The tap-sum transpose for strided query grids (stride0 > 1) dilates the
query-grid cotangent to pixel resolution with a strided .at[] set (an
interior pad) before the 9 shifted adds — the deterministic transpose of
the forward's tap-sum subsample (_tapsum_to_queries).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stnls_tpu.ops.nls import dist_type_select
from stnls_tpu.ops.nls_pallas import (
    kernel_dims, _hat, _hat_weights_scalar, _tapsum_to_queries,
    _corner_terms, pack_joint_bits,
)


def winner_joint_bits(cfg, cells_pl, selfidp, l0h, l0w):
    """Winner-only joint shift-activity bits for the K-sparse backward.

    The top-K cotangent touches, per query, only the K winner cells (plus
    the anchor self cell); each winner (st, i, j) needs the sweep combos
    (j_h, j_w) = (l0h + su*i + ch, l0w + su*j + cw) for its bilinear
    corners ch, cw in {0, ncr-1}. The forward's full-window bits cover
    Sp*Sp combos per query; winners cover ~ncr^2 * K/W_t — the sweep-cost
    mirror of the reference's K-sparse backward
    (lib/csrc/search/nls_bilin2d.cu:189-291). Cross-slot pairing in the
    rowhit x colhit product over-approximates (safe: extra combos compute
    values that meet a zero cotangent).

    cells_pl [BH,Tq,nT,S,TH,TW], selfidp [BH,Tq,nT,TH,TW],
    l0h/l0w [BH,P,nT,TH,TW]. Returns packed int32 bits (pack_joint_bits
    layout)."""
    m, ZL, ZLc, su, ws = (cfg["m"], cfg["ZL"], cfg["ZLc"], cfg["su"],
                          cfg["ws"])
    W_t = cfg["W_t"]
    Dloc, Dkc = m * ZL, m * ZLc
    ncr = 1 if cfg["is_int"] else 2
    BH, Tq, nT = cells_pl.shape[:3]
    TH, TW = cells_pl.shape[-2:]
    cells = cells_pl
    if cfg.get("anchor", False):
        cells = jnp.concatenate([cells, selfidp[:, :, :, None]], axis=3)
    S = cells.shape[3]
    st_of = cells // (ws * ws)
    ii = (cells % (ws * ws)) // ws
    jj = cells % ws
    l5 = l0h.reshape(BH, Tq, W_t, nT, TH, TW)
    w5 = l0w.reshape(BH, Tq, W_t, nT, TH, TW)
    stm = (st_of[:, :, None] ==
           jnp.arange(W_t, dtype=st_of.dtype)[:, None, None, None, None])
    SENT = jnp.int32(-(10 ** 6))
    jh = jnp.where(stm, l5[:, :, :, :, None] + su * ii[:, :, None], SENT)
    jw = jnp.where(stm, w5[:, :, :, :, None] + su * jj[:, :, None], SENT)

    def hits(vals, D):
        # [.., S, TH, TW] winner shift origins -> [.., D, TH*TW] per-query
        # hit masks over the ncr corner offsets (python loop over D keeps
        # the transient at one [.., S, TH, TW] plane)
        planes = []
        for d in range(D):
            h = None
            for c in range(ncr):
                v = vals == (d - c)
                h = v if h is None else h | v
            planes.append(jnp.any(h, axis=4))
        out = jnp.stack(planes, axis=4)        # [BH,Tq,W_t,nT,D,TH,TW]
        return out.reshape(BH, Tq * W_t, nT, D, TH * TW)

    rowhit = hits(jh, Dloc)
    colhit = hits(jw, Dkc)
    return pack_joint_bits(rowhit, colhit, Dkc)


def bwd_supported(cfg):
    return True


def _make_bwd_kernel(cfg):
    m, su, Sp, ZL, ZLc = (cfg["m"], cfg["su"], cfg["Sp"], cfg["ZL"],
                          cfg["ZLc"])
    taps, t0s = cfg["taps"], cfg["t0s"]
    ws, stride0 = cfg["ws"], cfg["stride0"]
    TH, TW, F = cfg["TH"], cfg["TW"], cfg["F"]
    H, W = cfg["H"], cfg["W"]
    pad0 = cfg["pad0"]
    s1 = float(cfg["stride1"])
    dm = kernel_dims(cfg)
    (TPH, TPW, TPHx, TPWx, RH, RW, AH, AW, XFH, XFW) = (
        dm["TPH"], dm["TPW"], dm["TPHx"], dm["TPWx"], dm["RH"], dm["RW"],
        dm["AH"], dm["AW"], dm["XFH"], dm["XFW"])
    r_need, s_need = dm["r_need"], dm["s_need"]
    NR, NS = dm["NR"], dm["NS"]
    r_pos = {r: i for i, r in enumerate(r_need)}
    s_pos = {sv: i for i, sv in enumerate(s_need)}
    x_es, nX, nfam = dm["x_es"], dm["nX"], dm["nfam"]
    dist_is_l2, is_int = dm["dist_is_l2"], dm["is_int"]
    RWc, VWc, AWb = dm["RWc"], dm["VWc"], dm["AWb"]
    ncr, cc_terms, x_terms = _corner_terms(is_int, dist_is_l2)
    tapsum = functools.partial(_tapsum_to_queries, taps=taps, t0s=t0s,
                               TH=TH, TW=TW, stride0=stride0)

    TPH_, TPW_ = (TH - 1) * stride0 + 1, (TW - 1) * stride0 + 1

    def dilate_queries(gq):
        """[TH, TW] query grid -> [TPH, TPW] pixel field with values at
        the stride0 grid (transpose of the fwd's [::stride0] subsample)."""
        if stride0 == 1:
            return gq
        z = jnp.zeros((TPH_, TPW_), jnp.float32)
        return z.at[::stride0, ::stride0].set(gq)

    def tapsum_T(gq, out_h, out_w):
        """Transpose of the tap-sum: scatter [TH, TW] query grads into a
        zero [out_h, out_w] pixel field at the ps^2 static tap offsets
        (separable for ps >= 3, mirroring _tapsum_to_queries)."""
        gd = dilate_queries(gq)
        if len(taps) >= 3:
            cs = None
            for b in taps:
                ib = b + t0s
                v = jnp.pad(gd, ((0, 0), (ib, out_w - TPW_ - ib)))
                cs = v if cs is None else cs + v
            acc = None
            for a in taps:
                ia = a + t0s
                v = jnp.pad(cs, ((ia, out_h - TPH_ - ia), (0, 0)))
                acc = v if acc is None else acc + v
            return acc
        acc = None
        for a in taps:
            ia = a + t0s
            for b in taps:
                ib = b + t0s
                v = jnp.pad(gd, ((ia, out_h - TPH_ - ia),
                                 (ib, out_w - TPW_ - ib)))
                acc = v if acc is None else acc + v
        return acc

    predicate = cfg.get("predicate", True)
    NSC = 10
    Dloc = m * ZL
    # perf-bisect knob (results WRONG unless empty): letters name phases
    # to skip — a=fwd-sel recompute sweep, c=bwd selection sweep,
    # d=X-field bwd, e=phase-image bwd, x=X-field recompute
    bskip = cfg.get("_bskip", "")

    save_acc = bool(cfg.get("save_acc", False))
    # emit="topk": the cotangent arrives K-sparse (per-winner grads + the
    # winners' flat cell ids) instead of as the dense [ws,ws] volume; the
    # per-cell gm is reconstructed by id compare — the deterministic
    # mirror of the reference's K-sparse backward
    # (lib/stnls/search/impl/non_local_search.py:142-212)
    emit = cfg.get("emit", "volume")
    W_t = cfg.get("W_t", None)
    n_slots = cfg.get("n_slots", 0)
    anchor = bool(cfg.get("anchor", False))

    joint = bool(cfg.get("joint", False)) and predicate
    NJW = cfg.get("NJW", 1)

    def kernel(scal_ref, jbits_ref, *all_rest):
        if emit == "topk":
            (gd_ref, gs_ref, cells_ref, selfid_ref, outl_ref,
             v0_ref, v1_ref, gv0z_ref, gv1z_ref) = all_rest[:9]
            rest = all_rest[9:]
        else:
            (g_ref, v0_ref, v1_ref, gv0z_ref, gv1z_ref) = all_rest[:5]
            rest = all_rest[5:]
        (l0h_ref, l0w_ref, th_ref, tw_ref,
         ctrh_ref, ctrw_ref, offh_ref, offw_ref) = rest[:8]
        rest = rest[8:]
        # with save_acc the forward's selected corner-window volume
        # arrives as an input — phase A's selection sweep is skipped
        if save_acc:
            accin_ref, rest = rest[0], rest[1:]
        (gv0_ref, gv1_ref, gth_ref, gtw_ref,
         v0w_ref, rawscr_ref, bst_ref, ast_ref, xst_ref, acc_ref,
         gv0w_ref, gast_ref, gxst_ref, gacc_ref, selw_ref,
         sem0, sem1, sem2, sem3) = rest
        # buffer reuse (VMEM is tight): raw doubles as g_raw and bst as
        # g_bst — both are dead once the phase images are built.
        graw_ref = rawscr_ref
        gbst_ref = bst_ref
        del gv0z_ref, gv1z_ref
        bh = pl.program_id(0)
        p = pl.program_id(1)
        t = pl.program_id(2)
        # scal is flattened 1-D in SMEM (see nls_pallas._build_inputs)
        sbase = ((bh * cfg["P"] + p) * cfg["nTg"] + t) * cfg["NSCAL"]

        def sread(j):
            return scal_ref[sbase + j]

        ti = sread(2)
        tj = sread(3)
        tyv = sread(4)   # global v0 row origin (band-aware)
        r0 = sread(0)
        wmodh = sread(1)
        cw0r = sread(5)  # col origin, fine part (lane roll)
        wmodw = sread(6)
        dc1 = sread(7)   # v1 col block (x128, DMA-aligned)
        dc0 = sread(8)   # v0 col block
        cv0r = sread(9)  # v0 fine roll

        # joint activity table base (fwd-window bits for the dense-volume
        # backward; winner-only bits for the K-sparse top-K backward)
        jtb = ((bh * cfg["P"] + p) * cfg["nTg"] + t) * (Dloc * NJW)

        def row_live(j_h):
            return jbits_ref[jtb + j_h * NJW] != 0 if joint \
                else sread(NSC + j_h) != 0

        def col_live(j_h, j_w):
            if not joint:
                return sread(NSC + Dloc + j_w) != 0
            word = jbits_ref[jtb + j_h * NJW + 1 + (j_w // 32)]
            return ((word >> (j_w % 32)) & 1) != 0

        # ---------------- A. recompute forward state ----------------
        cp0 = pltpu.make_async_copy(
            v0_ref.at[bh, ti, pl.ds(tyv, TPHx), slice(None),
                      pl.ds(dc0 * 128, VWc)], v0w_ref, sem0)
        cp0.start()
        cp1 = pltpu.make_async_copy(
            v1_ref.at[bh, tj, pl.ds(r0, RH), slice(None),
                      pl.ds(dc1 * 128, RWc)], rawscr_ref, sem1)
        cp1.start()
        cp0.wait()
        cp1.wait()
        v0w_ref[...] = pltpu.roll(v0w_ref[...], shift=-cv0r, axis=2)
        c_lo = 0
        v0w = v0w_ref[:, :, c_lo:c_lo + TPWx]
        # column rebase (see fwd kernel): dynamic lane roll
        rawscr_ref[...] = pltpu.roll(rawscr_ref[...], shift=-cw0r, axis=2)

        for r in r_need:
            wh = _hat_weights_scalar(wmodh + r, m, (1, 2, 3))
            acc_b = None
            for k in (1, 2, 3):
                v = wh[k - 1] * rawscr_ref[k:k + AH, :, 0:AWb]
                acc_b = v if acc_b is None else acc_b + v
            bst_ref[r_pos[r]] = acc_b
        for r in r_need:
            for sv in s_need:
                # c=0 is live for the sv=-1 phase (X families)
                wc = _hat_weights_scalar(wmodw + sv, m, (0, 1, 2, 3))
                acc_a = None
                for c in (0, 1, 2, 3):
                    v = wc[c] * bst_ref[r_pos[r], :, :, c:c + AW]
                    acc_a = v if acc_a is None else acc_a + v
                ast_ref[r_pos[r] * NS + s_pos[sv]] = acc_a

        for ei, e in enumerate(x_es if "x" not in bskip else []):
            for r in range(m):
                for sv in range(m):
                    a0 = ast_ref[r_pos[r] * NS + s_pos[sv]]
                    a1 = ast_ref[r_pos[r + e[0]] * NS + s_pos[sv + e[1]]]
                    prod = jnp.sum(a0 * a1, axis=1)  # [AH, AW]
                    if len(taps) >= 3:      # separable box sum
                        cs = None
                        for b in taps:
                            ib = b + t0s
                            v = prod[:, ib:ib + XFW]
                            cs = v if cs is None else cs + v
                        facc = None
                        for a in taps:
                            ia = a + t0s
                            v = cs[ia:ia + XFH, :]
                            facc = v if facc is None else facc + v
                    else:
                        facc = None
                        for a in taps:
                            ia = a + t0s
                            ya = prod[ia:ia + XFH, :]
                            for b in taps:
                                ib = b + t0s
                                v = ya[:, ib:ib + XFW]
                                facc = v if facc is None else facc + v
                    xst_ref[:, (ei * m + r) * m + sv, :] = facc

        l0h = l0h_ref[0, 0, 0]
        l0w = l0w_ref[0, 0, 0]
        if not save_acc:
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def fwd_sel_body(zzh, _):
            l0hz = l0h - m * zzh      # static selection compares (see fwd)
            for r in range(m):
                j_h = r + m * zzh

                def row_body(r=r, j_h=j_h):
                    selw_ref[:] = jnp.zeros_like(selw_ref)
                    for sv in range(m):
                        aidx = r * NS + s_pos[sv]
                        asl = ast_ref[aidx, pl.ds(zzh, TPHx)]
                        for zzw in range(ZLc):
                            j_w = sv + m * zzw

                            def col_body(asl=asl, zzw=zzw, j_w=j_w,
                                         sv=sv, r=r):
                                a_sl = asl[:, :, zzw:zzw + TPWx]
                                vals = [tapsum(jnp.sum(v0w * a_sl, axis=1))]
                                for ei in range(nX):
                                    xidx = (ei * m + r) * m + sv
                                    xs = xst_ref[pl.ds(zzh, TPH), xidx,
                                                 zzw:zzw + TPW]
                                    if stride0 > 1:
                                        xs = xs[::stride0, ::stride0]
                                    vals.append(xs)
                                for uw in range(Sp):
                                    mw = (l0w == (j_w - uw)) \
                                        .astype(jnp.float32)
                                    for fam in range(nfam):
                                        selw_ref[fam * Sp + uw] += \
                                            mw * vals[fam]
                            if predicate:
                                pl.when(col_live(j_h, j_w))(col_body)
                            else:
                                col_body()
                    for uh in range(Sp):
                        mh = (l0hz == (r - uh)).astype(jnp.float32)
                        for fam in range(nfam):
                            for uw in range(Sp):
                                k = (fam * Sp + uh) * Sp + uw
                                acc_ref[k] += mh * selw_ref[fam * Sp + uw]
                if predicate:
                    pl.when(row_live(j_h))(row_body)
                else:
                    row_body()
            return 0

        if save_acc:
            def accv(fam, uh, uw):
                return accin_ref[0, 0, 0, (fam * Sp + uh) * Sp + uw]
        else:
            if "a" not in bskip:
                lax.fori_loop(0, ZL, fwd_sel_body, 0)

            def accv(fam, uh, uw):
                return acc_ref[(fam * Sp + uh) * Sp + uw]

        # ---------------- B. assembly backward ----------------
        th = th_ref[0, 0, 0]
        tw = tw_ref[0, 0, 0]
        ctrh = ctrh_ref[0, 0, 0]
        ctrw = ctrw_ref[0, 0, 0]
        offh = offh_ref[0, 0, 0]
        offw = offw_ref[0, 0, 0]
        whc = (1. - th, th)
        wvc = (1. - tw, tw)
        dwh = (-1., 1.)
        gacc_ref[:] = jnp.zeros_like(gacc_ref)
        g_th = jnp.zeros((TH, TW), jnp.float32)
        g_tw = jnp.zeros((TH, TW), jnp.float32)
        g_ps0 = jnp.zeros((TH, TW), jnp.float32)

        if emit == "topk":
            st = p % W_t
            gplanes = [gd_ref[0, 0, 0, s] for s in range(n_slots)]
            cplanes = [cells_ref[0, 0, 0, s] for s in range(n_slots)]
            outl_m = outl_ref[0, 0, 0] != 0
            if anchor:
                gselfp = gs_ref[0, 0, 0]
                selfpl = selfid_ref[0, 0, 0]

            def read_gm(i, j):
                sid = st * (ws * ws) + (i * ws + j)
                acc = None
                for s in range(n_slots):
                    v = jnp.where(cplanes[s] == sid, gplanes[s], 0.)
                    acc = v if acc is None else acc + v
                if anchor:
                    acc = acc + jnp.where(selfpl == sid, gselfp, 0.)
                return jnp.where(outl_m, 0., acc)
        else:
            def read_gm(i, j):
                return g_ref[0, 0, 0, i * ws + j]

        for i in range(ws):
            ph = ctrh + s1 * (i - offh)
            vh = jnp.logical_and(ph >= 0., ph <= float(H - 1))
            for j in range(ws):
                pw = ctrw + s1 * (j - offw)
                vw = jnp.logical_and(pw >= 0., pw <= float(W - 1))
                valid = jnp.logical_and(vh, vw)
                gm = jnp.where(valid, read_gm(i, j), 0.)
                oh, ow = su * i, su * j
                if dist_is_l2:
                    g_ps0 = g_ps0 + gm
                sgn = -2. if dist_is_l2 else 1.
                for (ch, cw) in cc_terms:
                    k = (0 * Sp + oh + ch) * Sp + ow + cw
                    if is_int:
                        gacc_ref[k] += sgn * gm
                    else:
                        gacc_ref[k] += sgn * whc[ch] * wvc[cw] * gm
                        ccv = accv(0, oh + ch, ow + cw)
                        g_th = g_th + sgn * dwh[ch] * wvc[cw] * ccv * gm
                        g_tw = g_tw + sgn * whc[ch] * dwh[cw] * ccv * gm
                if dist_is_l2:
                    for (ch, cw, ch2, cw2, c_use, fam) in x_terms:
                        k = (fam * Sp + oh + c_use[0]) * Sp + ow + c_use[1]
                        if is_int:
                            gacc_ref[k] += gm
                        else:
                            w4 = whc[ch] * wvc[cw] * whc[ch2] * wvc[cw2]
                            gacc_ref[k] += w4 * gm
                            xv = accv(fam, oh + c_use[0], ow + c_use[1])
                            dth = (dwh[ch] * wvc[cw] * whc[ch2] * wvc[cw2]
                                   + whc[ch] * wvc[cw] * dwh[ch2] * wvc[cw2])
                            dtw = (whc[ch] * dwh[cw] * whc[ch2] * wvc[cw2]
                                   + whc[ch] * wvc[cw] * whc[ch2] * dwh[cw2])
                            g_th = g_th + dth * xv * gm
                            g_tw = g_tw + dtw * xv * gm
        gth_ref[0, 0, 0] = g_th
        gtw_ref[0, 0, 0] = g_tw

        # ---------------- C. selection / product backward ----------------
        gv0w_ref[:] = jnp.zeros_like(gv0w_ref)
        gast_ref[:] = jnp.zeros_like(gast_ref)
        gxst_ref[:] = jnp.zeros_like(gxst_ref)

        def bwd_sel_body(zzh, _):
            l0hz = l0h - m * zzh      # static selection compares (see fwd)
            for r in range(m):
                j_h = r + m * zzh

                def row_body(r=r, j_h=j_h):
                    # row-selected cotangents per (fam, uw)
                    grow = [[None] * Sp for _ in range(nfam)]
                    for uh in range(Sp):
                        mh = (l0hz == (r - uh)).astype(jnp.float32)
                        for fam in range(nfam):
                            for uw in range(Sp):
                                k = (fam * Sp + uh) * Sp + uw
                                v = mh * gacc_ref[k]
                                cur = grow[fam][uw]
                                grow[fam][uw] = (v if cur is None
                                                 else cur + v)
                    for sv in range(m):
                        aidx = r * NS + s_pos[sv]
                        asl = ast_ref[aidx, pl.ds(zzh, TPHx)]
                        for zzw in range(ZLc):
                            j_w = sv + m * zzw

                            def col_body(asl=asl, zzw=zzw, j_w=j_w,
                                         sv=sv, r=r, grow=grow):
                                gcc = None
                                gxs = [None] * nX
                                for uw in range(Sp):
                                    mw = (l0w == (j_w - uw)) \
                                        .astype(jnp.float32)
                                    v = mw * grow[0][uw]
                                    gcc = v if gcc is None else gcc + v
                                    for ei in range(nX):
                                        vx = mw * grow[1 + ei][uw]
                                        gxs[ei] = vx if gxs[ei] is None \
                                            else gxs[ei] + vx
                                # CC backward: transpose tap-sum + product
                                gp = tapsum_T(gcc, TPHx, TPWx)[:, None, :]
                                a_sl = asl[:, :, zzw:zzw + TPWx]
                                gv0w_ref[:, :, c_lo:c_lo + TPWx] += \
                                    gp * a_sl
                                gprev = gast_ref[aidx, pl.ds(zzh, TPHx), :,
                                                 zzw:zzw + TPWx]
                                gast_ref[aidx, pl.ds(zzh, TPHx), :,
                                         zzw:zzw + TPWx] = gprev + gp * v0w
                                # X backward into the field cotangent
                                for ei in range(nX):
                                    xidx = (ei * m + r) * m + sv
                                    gxp = gxst_ref[pl.ds(zzh, TPH), xidx,
                                                   zzw:zzw + TPW]
                                    gxst_ref[pl.ds(zzh, TPH), xidx,
                                             zzw:zzw + TPW] = \
                                        gxp + dilate_queries(gxs[ei])
                            if predicate:
                                pl.when(col_live(j_h, j_w))(col_body)
                            else:
                                col_body()
                if predicate:
                    pl.when(row_live(j_h))(row_body)
                else:
                    row_body()
            return 0

        if "c" not in bskip:
            lax.fori_loop(0, ZL, bwd_sel_body, 0)

        # ---------------- D. X-field backward ----------------
        for ei, e in enumerate([] if "d" in bskip else x_es):
            for r in range(m):
                for sv in range(m):
                    gfe = gxst_ref[:, (ei * m + r) * m + sv, :]
                    # transpose of the field tap-sum
                    gxe = None
                    for a in taps:
                        ia = a + t0s
                        for b in taps:
                            ib = b + t0s
                            v = jnp.pad(gfe, ((ia, AH - XFH - ia),
                                              (ib, AW - XFW - ib)))
                            gxe = v if gxe is None else gxe + v
                    gxe = gxe[:, None, :]
                    i0 = r_pos[r] * NS + s_pos[sv]
                    i1 = r_pos[r + e[0]] * NS + s_pos[sv + e[1]]
                    a0 = ast_ref[i0]
                    a1 = ast_ref[i1]
                    gast_ref[i0] += gxe * a1
                    if i1 == i0:
                        gast_ref[i0] += gxe * a0
                    else:
                        gast_ref[i1] += gxe * a0

        # ps0 backward
        if dist_is_l2:
            gp0 = tapsum_T(g_ps0, TPHx, TPWx)[:, None, :]
            gv0w_ref[:, :, c_lo:c_lo + TPWx] += 2. * gp0 * v0w

        # ---------------- E. phase-image build backward ----------------
        gbst_ref[:] = jnp.zeros_like(gbst_ref)
        for r in (r_need if "e" not in bskip else []):
            for sv in s_need:
                wc = _hat_weights_scalar(wmodw + sv, m, (0, 1, 2, 3))
                ga = gast_ref[r_pos[r] * NS + s_pos[sv]]
                for c in (0, 1, 2, 3):
                    gbst_ref[r_pos[r], :, :, c:c + AW] += wc[c] * ga
        graw_ref[:] = jnp.zeros_like(graw_ref)
        for r in (r_need if "e" not in bskip else []):
            wh = _hat_weights_scalar(wmodh + r, m, (1, 2, 3))
            gb = gbst_ref[r_pos[r]]
            for k in (1, 2, 3):
                graw_ref[k:k + AH, :, 0:AWb] += wh[k - 1] * gb
        # un-rebase columns: the grads above live in rolled coordinates
        graw_ref[...] = pltpu.roll(graw_ref[...], shift=cw0r, axis=2)
        gv0w_ref[...] = pltpu.roll(gv0w_ref[...], shift=cv0r, axis=2)

        # ---------------- F. RMW accumulation into HBM ----------------
        def rmw(hbm_at, local_ref, tmp_shape, sem_a, sem_b):
            def inner(tmp):
                rd = pltpu.make_async_copy(hbm_at, tmp, sem_a)
                rd.start()
                rd.wait()
                tmp[:] = tmp[:] + local_ref[:]
                wr = pltpu.make_async_copy(tmp, hbm_at, sem_b)
                wr.start()
                wr.wait()
            pl.run_scoped(inner, pltpu.VMEM(tmp_shape, jnp.float32))

        rmw(gv0_ref.at[bh, ti, pl.ds(tyv, TPHx), slice(None),
                       pl.ds(dc0 * 128, VWc)], gv0w_ref,
            (TPHx, F, VWc), sem2, sem3)
        rmw(gv1_ref.at[bh, tj, pl.ds(r0, RH), slice(None),
                       pl.ds(dc1 * 128, RWc)], graw_ref,
            (RH, F, RWc), sem2, sem3)

    return kernel, dm


def _bwd_scratch(cfg, dm):
    TH, TW, F = cfg["TH"], cfg["TW"], cfg["F"]
    return [
        pltpu.VMEM((dm["TPHx"], F, dm["VWc"]), jnp.float32),
        pltpu.VMEM((dm["RH"], F, dm["RWc"]), jnp.float32),
        pltpu.VMEM((dm["NR"], dm["AH"], F, dm["AWb"]), jnp.float32),
        pltpu.VMEM((dm["NR"] * dm["NS"], dm["AH"], F, dm["AW"]),
                   jnp.float32),
        pltpu.VMEM((dm["XFH"], dm["NXST"], dm["XFW"]), jnp.float32),
        pltpu.VMEM((dm["nfam"] * cfg["Sp"] * cfg["Sp"], TH, TW),
                   jnp.float32),
        pltpu.VMEM((dm["TPHx"], F, dm["VWc"]), jnp.float32),
        pltpu.VMEM((dm["NR"] * dm["NS"], dm["AH"], F, dm["AW"]),
                   jnp.float32),
        pltpu.VMEM((dm["XFH"], dm["NXST"], dm["XFW"]), jnp.float32),
        pltpu.VMEM((dm["nfam"] * cfg["Sp"] * cfg["Sp"], TH, TW),
                   jnp.float32),
        pltpu.VMEM((dm["nfam"] * cfg["Sp"], TH, TW), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    ]


def topk_bwd_pallas(cfg, interpret, g_d, g_s, cells_pl, selfidp, outlp,
                    v0e, v1p, scal, jbits, l0h, l0w, th, tw, ctrh, ctrw,
                    offh, offw, accsaved=None):
    """Backward for the fused in-kernel top-K forward: the cotangent is
    K-sparse (per-winner grads g_d + winner cell ids + the anchor self
    plane); phase B reconstructs each window cell's gm by id compare.
    Returns (g_v0e, g_v1p, g_th, g_tw)."""
    BH, P, nT = cfg["BH"], cfg["P"], cfg["nTg"]
    TH, TW, F = cfg["TH"], cfg["TW"], cfg["F"]
    ws = cfg["ws"]
    W_t = cfg["W_t"]
    n_slots = cfg["n_slots"]
    save_acc = bool(cfg.get("save_acc", False)) and accsaved is not None
    cfg = dict(cfg, save_acc=save_acc, emit="topk")
    kernel, dm = _make_bwd_kernel(cfg)
    qspec = pl.BlockSpec((1, 1, 1, TH, TW),
                         lambda bh, p, t, *_: (bh, p, t, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec(
        (1, 1, 1, n_slots, TH, TW),
        lambda bh, p, t, *_: (bh, p // W_t, t, 0, 0, 0),
        memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(
        (1, 1, 1, TH, TW),
        lambda bh, p, t, *_: (bh, p // W_t, t, 0, 0),
        memory_space=pltpu.VMEM)
    nacc = dm["nfam"] * cfg["Sp"] * cfg["Sp"]
    accspec = pl.BlockSpec((1, 1, 1, nacc, TH, TW),
                           lambda bh, p, t, *_: (bh, p, t, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BH, P, nT),
        in_specs=[kspec, sspec, kspec, sspec, qspec,        # gd gs cells
                  any_spec, any_spec, any_spec, any_spec,   # self outl
                  qspec, qspec, qspec, qspec, qspec, qspec, qspec, qspec]
        + ([accspec] if save_acc else []),
        out_specs=(any_spec, any_spec,
                   pl.BlockSpec((1, 1, 1, TH, TW),
                                lambda bh, p, t, *_: (bh, p, t, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, 1, TH, TW),
                                lambda bh, p, t, *_: (bh, p, t, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=_bwd_scratch(cfg, dm))
    out_shape = (
        jax.ShapeDtypeStruct(v0e.shape, jnp.float32),
        jax.ShapeDtypeStruct(v1p.shape, jnp.float32),
        jax.ShapeDtypeStruct((BH, P, nT, TH, TW), jnp.float32),
        jax.ShapeDtypeStruct((BH, P, nT, TH, TW), jnp.float32),
    )
    gv0_zero = jnp.zeros(v0e.shape, jnp.float32)
    gv1_zero = jnp.zeros(v1p.shape, jnp.float32)
    # operand indices (scal=0, jbits=1): 2=g_d 3=g_s 4=cells 5=selfid
    # 6=outl 7=v0e 8=v1p 9=gv0_zero 10=gv1_zero -> aliased onto outputs
    # 0, 1
    operands = [scal, jbits, g_d.astype(jnp.float32),
                g_s.astype(jnp.float32),
                cells_pl, selfidp, outlp, v0e, v1p, gv0_zero, gv1_zero,
                l0h, l0w, th, tw, ctrh, ctrw, offh, offw]
    if save_acc:
        operands.append(accsaved)
    g_v0e, g_v1p, g_th_t, g_tw_t = pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        input_output_aliases={9: 0, 10: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return g_v0e, g_v1p, g_th_t, g_tw_t


def vol_bwd_pallas(cfg, interpret, g, v0e, v1p, scal, jbits, l0h, l0w,
                   th, tw, ctrh, ctrw, offh, offw, accsaved=None):
    """Returns (g_v0e, g_v1p, g_th, g_tw)."""
    BH, P, nT = cfg["BH"], cfg["P"], cfg["nTg"]
    TH, TW, F = cfg["TH"], cfg["TW"], cfg["F"]
    ws = cfg["ws"]
    save_acc = bool(cfg.get("save_acc", False)) and accsaved is not None
    cfg = dict(cfg, save_acc=save_acc)
    kernel, dm = _make_bwd_kernel(cfg)
    qspec = pl.BlockSpec((1, 1, 1, TH, TW),
                         lambda bh, p, t, *_: (bh, p, t, 0, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((1, 1, 1, ws * ws, TH, TW),
                         lambda bh, p, t, *_: (bh, p, t, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    nacc = dm["nfam"] * cfg["Sp"] * cfg["Sp"]
    accspec = pl.BlockSpec((1, 1, 1, nacc, TH, TW),
                           lambda bh, p, t, *_: (bh, p, t, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BH, P, nT),
        in_specs=[gspec, any_spec, any_spec, any_spec, any_spec,
                  qspec, qspec, qspec, qspec, qspec, qspec, qspec, qspec]
        + ([accspec] if save_acc else []),
        out_specs=(any_spec, any_spec,
                   pl.BlockSpec((1, 1, 1, TH, TW),
                                lambda bh, p, t, *_: (bh, p, t, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, 1, TH, TW),
                                lambda bh, p, t, *_: (bh, p, t, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=_bwd_scratch(cfg, dm))
    out_shape = (
        jax.ShapeDtypeStruct(v0e.shape, jnp.float32),
        jax.ShapeDtypeStruct(v1p.shape, jnp.float32),
        jax.ShapeDtypeStruct((BH, P, nT, TH, TW), jnp.float32),
        jax.ShapeDtypeStruct((BH, P, nT, TH, TW), jnp.float32),
    )
    gv0_zero = jnp.zeros(v0e.shape, jnp.float32)
    gv1_zero = jnp.zeros(v1p.shape, jnp.float32)
    # operand indices (scal=0, jbits=1): 2 = g, 3 = v0e, 4 = v1p,
    # 5 = gv0_zero, 6 = gv1_zero -> aliased onto outputs 0, 1
    operands = [scal, jbits, g.astype(jnp.float32), v0e, v1p, gv0_zero,
                gv1_zero, l0h, l0w, th, tw, ctrh, ctrw, offh, offw]
    if save_acc:
        operands.append(accsaved)
    g_v0e, g_v1p, g_th_t, g_tw_t = pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    # g_th arrives per-(pair, tile); the fwd consumed th in the same tiled
    # layout, so return as-is.
    return g_v0e, g_v1p, g_th_t, g_tw_t
