"""Fused Pallas TPU kernel for the non-local search volume.

This is the speed-of-light path promised by the blueprint (SURVEY §7): one
fused kernel per (batch·head, frame-pair, query-row-block) that

  1. DMAs a *flow-rebased* full-width row window of the reflect-padded key
     video from HBM into VMEM (the row origin is a per-tile prefetched
     scalar; rows live on an untiled axis so Mosaic allows the dynamic
     offset — columns use a static global domain instead, since dynamic
     offsets on the (sublane, lane) tiled dims are not lowerable),
  2. builds the subpixel phase images of the piecewise-bilinear surface in
     VMEM via separable hat-weight interpolation with static slices
     (stride1 = su/m is exact: the surface has no kink strictly inside a
     1/m cell),
  3. accumulates dense shifted products — the cross-correlation family CC
     and, for L2, the surface self-product families X_e — with ps x ps
     tap-sums, entirely on the VPU with ZERO gather/scatter ops,
  4. selects each query's Sp x Sp candidate window by one-hot compares
     against its lattice anchor (dense compare+FMA, no gather),
  5. assembles bilinear-corner distances and writes the [ws,ws] volume.

Semantics match ops.nls.nls_search_volume (and the reference CUDA kernels
lib/csrc/search/non_local_search_bilin2d_kernel.cu, nls_int.cu,
shared_kernel.cu:248-287) for: itype in {float,int}, dist in {l2,prod},
uniform stride1 (su/m), pt=1, reflect_bounds=True, off_Hq=off_Wq=0,
strideQ=stride0. Out-of-budget flows are flagged `outliers` and carry
init-valued dists (see ops.nls_cv for the budget discussion).

The backward is a second Pallas kernel registered via jax.custom_vjp
(ops/nls_pallas_bwd.py): it recomputes the forward's windows
(checkpoint-style) and emits grads to vid0, vid1 (via deterministic
shifted adds — the TPU replacement for the reference's atomicAdd,
nls_bilin2d.cu:171-180) and to the bilinear corner weights th/tw, which
autodiff outside chains to the flows (reflection sign flips included,
matching shared_kernel.cu:918-965).

Cross-validated against ops.nls.nls_search_volume in
tests/search/test_pallas_path.py.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stnls_tpu.ops.geometry import (
    reflect_bounds, num_queries, time_window_frames, search_offsets,
)
from stnls_tpu.ops.nls import dist_type_select, _expand_flow_heads
from stnls_tpu.ops.nls_cv import cv_step

# L2 self-product offsets e (up-grid), canonical half-space
X_E = [(0, 0), (0, 1), (1, 0), (1, 1), (1, -1)]


def _largest_divisor_leq(n, cap):
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


def pack_joint_bits(rowhit, colhit, Dkc):
    """Pack per-query (row, col) shift hit sets into the per-tile joint
    activity table the kernels pl.when on.

    rowhit [..., Dloc, N] / colhit [..., Dkc, N] (bool; N = queries per
    tile) -> int32 [prod(...) * Dloc * (1 + ceil(Dkc/32))] where each
    (tile, j_h) row holds [any-col-live flag, col-bit words]. The joint
    live set is the einsum rowhit @ colhit^T (query counts < 2^24, exact
    in f32)."""
    rh = rowhit.astype(jnp.float32)
    ch = colhit.astype(jnp.float32)
    joint = jnp.einsum("...dn,...cn->...dc", rh, ch) > 0.5
    nww = -(-Dkc // 32)
    pad = nww * 32 - Dkc
    jp = jnp.pad(joint, ((0, 0),) * (joint.ndim - 1) + ((0, pad),))
    jp = jp.reshape(jp.shape[:-1] + (nww, 32))
    w = jnp.sum(
        jnp.where(jp, jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32),
                  jnp.uint32(0)), axis=-1, dtype=jnp.uint32)
    words = lax.bitcast_convert_type(w, jnp.int32)
    rowflag = jnp.any(joint, axis=-1).astype(jnp.int32)[..., None]
    return jnp.concatenate([rowflag, words], axis=-1).reshape(-1)


def pallas_geometry(*, ws, ps, stride1, dilation, flow_budget,
                    spread_budget, use_adj):
    """Static geometry shared by fwd and bwd kernels.

    Rows AND columns use per-tile rebasing with a local window of ZL(c)
    pixel shifts (Dloc/Dkc = m*ZL(c) up-grid shifts); tiles whose k0
    spread exceeds it spill to `outliers`. Rows apply the tile origin at
    the DMA (dynamic row offset); columns apply it with a dynamic lane
    roll of the raw window (pltpu.roll — dynamic lane *slices* are not
    lowerable, rolls are). The global clip range ZMAXc (from flow_budget)
    bounds per-query offsets; spread_budget bounds in-tile variation.
    """
    m, su = cv_step(stride1)
    wspan = su * (ws - 1)
    Sp = wspan + 2
    ZMAXc = -(-(m * flow_budget + wspan + 2) // m)
    if isinstance(spread_budget, (tuple, list)):
        sb_r, sb_c = spread_budget
    else:
        sb_r = sb_c = spread_budget
    ZL = sb_r + -(-(Sp + 1) // m)
    ZLc = sb_c + -(-(Sp + 1) // m)  # columns rebase too (lane roll)
    ZMAX = max(ZMAXc, ZL)       # row domain must fit the rebase window
    Dloc = m * ZL
    Dkc = m * ZLc
    patch_offset = 0 if use_adj else -(ps // 2)
    taps = [dilation * (p + patch_offset) for p in range(ps)]
    t0s = -min(taps)
    Eh = dilation * (ps - 1)
    pad0 = Eh + 1
    pad1 = ZMAX + Eh + max(ZL, ZLc) + 5
    return dict(m=m, su=su, wspan=wspan, Sp=Sp, ZMAX=ZMAX, ZMAXc=ZMAXc,
                ZL=ZL, ZLc=ZLc, Dloc=Dloc, Dkc=Dkc, taps=taps, t0s=t0s,
                Eh=Eh, pad0=pad0, pad1=pad1)


def fwd_vmem_bytes(*, ws, ps, stride0, stride1, dilation, flow_budget,
                   spread_budget, use_adj, itype, dist_type, F, H, W,
                   TH, TW, k=0):
    """Estimated VMEM scratch footprint of the fwd kernel for a (TH, TW)
    query tile — used by the banding heuristic to bound band width."""
    if itype == "int":
        stride1 = float(max(1, int(stride1)))
    geo = pallas_geometry(ws=ws, ps=ps, stride1=float(stride1),
                          dilation=dilation, flow_budget=flow_budget,
                          spread_budget=spread_budget, use_adj=use_adj)
    Fp = -(-F // 8) * 8
    cfg = dict(geo, ws=ws, ps=ps, stride0=stride0, stride1=float(stride1),
               dist_type=dist_type, is_int=(itype == "int"), TH=TH, TW=TW,
               F=Fp, H=H, W=W)
    dm = kernel_dims(cfg)
    Sp = geo["Sp"]

    def lane(n):
        return -(-n // 128) * 128

    b = 4 * (dm["TPHx"] * Fp * lane(dm["VWc"])
             + dm["RH"] * Fp * lane(dm["RWc"])
             + dm["NR"] * dm["AH"] * Fp * lane(dm["AWb"])
             + dm["NR"] * dm["NS"] * dm["AH"] * Fp * lane(dm["AW"])
             + dm["XFH"] * dm["NXST"] * lane(dm["XFW"])
             + dm["nfam"] * Sp * Sp * TH * lane(TW)
             + dm["nfam"] * Sp * TH * lane(TW)
             + (2 * k + 2) * TH * lane(TW))
    return b


def pallas_supported(*, itype, pt, stride1, reflect_bounds, ws, ps,
                     dilation, off_Hq, off_Wq, H, W, stride0, strideQ):
    if pt != 1 or not reflect_bounds or off_Hq != 0 or off_Wq != 0:
        return False
    if strideQ not in (None, stride0):
        return False
    if itype == "int":
        stride1 = max(1, int(stride1))
    if cv_step(stride1) is None:
        return False
    nH, nW = num_queries(H, W, stride0)
    if _largest_divisor_leq(nH, 16) == 1 and nH > 16:
        return False
    return min(H, W) >= 2 * dilation * (ps - 1) + 2


def _hat(x):
    """Static hat weight max(0, 1 - |x|) for python-float x."""
    return max(0.0, 1.0 - abs(x))


def _hat_weights_scalar(u, m, ks):
    """Traced hat weights w_k = max(0, 1 - |u/m - (k-1)|); u traced int."""
    uf = u.astype(jnp.float32) / float(m)
    return [jnp.maximum(0., 1. - jnp.abs(uf - float(k - 1))) for k in ks]


def _tapsum_to_queries(img, *, taps, t0s, TH, TW, stride0):
    """Patch tap-sum + query subsample: img [.., TPHx, TPWx] pixel field
    (index a + t0s holds pixel offset a) -> [.., TH, TW].

    For ps >= 3 the box sum is separable (column partial sums first):
    2*ps slice-adds instead of ps^2 — the classic box-filter split; at
    ps=7 (the reference pool default) this is 3.5x fewer adds."""
    if len(taps) >= 3:
        cacc = None
        for b in taps:
            ib = b + t0s
            v = img[..., ib:ib + (TW - 1) * stride0 + 1:stride0]
            cacc = v if cacc is None else cacc + v
        acc = None
        for a in taps:
            ia = a + t0s
            v = cacc[..., ia:ia + (TH - 1) * stride0 + 1:stride0, :]
            acc = v if acc is None else acc + v
        return acc
    acc = None
    for a in taps:
        ia = a + t0s
        ya = img[..., ia:ia + (TH - 1) * stride0 + 1:stride0, :]
        for b in taps:
            ib = b + t0s
            v = ya[..., ib:ib + (TW - 1) * stride0 + 1:stride0]
            acc = v if acc is None else acc + v
    return acc


def _fam_index(e):
    return 1 + X_E.index(e)


def _corner_terms(is_int, dist_is_l2):
    """Static assembly term lists."""
    ncr = 1 if is_int else 2
    cc_terms = [(ch, cw) for ch in range(ncr) for cw in range(ncr)]
    x_terms = []
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
                        x_terms.append((ch, cw, ch2, cw2, c_use,
                                        _fam_index(e)))
    return ncr, cc_terms, x_terms


def kernel_dims(cfg):
    """Static derived dimensions for the kernel."""
    m, Sp, ZL, ZLc = cfg["m"], cfg["Sp"], cfg["ZL"], cfg["ZLc"]
    Eh = cfg["Eh"]
    stride0 = cfg["stride0"]
    TH, TW, F = cfg["TH"], cfg["TW"], cfg["F"]
    W = cfg["W"]
    dist_is_l2 = (cfg["dist_type"] == "l2")
    is_int = cfg["is_int"]
    x_es = ([(0, 0)] if is_int else list(X_E)) if dist_is_l2 else []
    TPH = (TH - 1) * stride0 + 1
    TPW = (TW - 1) * stride0 + 1
    TPHx, TPWx = TPH + Eh, TPW + Eh
    RH = TPHx + ZL + 4                 # raw rows (rows rebased per tile)
    RW = -(-(W + 2 * cfg["pad1"]) // 128) * 128   # full padded width
    AH = TPHx + ZL + 1
    AW = TPWx + ZLc + 1
    XFH = ZL + TPH
    XFW = ZLc + TPW
    # column-window widths: DMAs fetch a 128-aligned col block (dynamic
    # minor-dim offsets must be provably 128-divisible; the block index
    # is constant per call — varying it across grid steps faults the TPU
    # worker) + fine lane roll that absorbs the per-tile origin span
    m_ = cfg["m"]
    span_px = (m_ * (2 * cfg["ZMAXc"] + 1) - m_ * ZLc) // m_ + 2
    RWc = min(RW, -(-(AW + 4 + 384 + max(0, span_px)) // 128) * 128)
    VWc = min(-(-(W + 2 * cfg["pad0"]) // 128) * 128,
              -(-(TPWx + 1 + 128) // 128) * 128)     # v0 window
    AWb = min(RWc, -(-(AW + 4) // 128) * 128)        # bst width
    r_need = sorted({r for r in range(m)}
                    | {r + e[0] for r in range(m) for e in x_es})
    s_need = sorted({s for s in range(m)}
                    | {s + e[1] for s in range(m) for e in x_es})
    nfam = 1 + len(x_es)
    return dict(TPH=TPH, TPW=TPW, TPHx=TPHx, TPWx=TPWx, RH=RH, RW=RW,
                RWc=RWc, VWc=VWc, AWb=AWb,
                AH=AH, AW=AW, XFH=XFH, XFW=XFW, r_need=r_need,
                s_need=s_need, NR=len(r_need), NS=len(s_need),
                nfam=nfam, x_es=x_es, nX=len(x_es),
                dist_is_l2=dist_is_l2, is_int=is_int,
                NXST=max(1, len(x_es) * m * m))


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _make_fwd_kernel(cfg):
    m, su, Sp, ZL, ZLc = (cfg["m"], cfg["su"], cfg["Sp"], cfg["ZL"],
                          cfg["ZLc"])
    taps, t0s = cfg["taps"], cfg["t0s"]
    ws, stride0 = cfg["ws"], cfg["stride0"]
    TH, TW, F = cfg["TH"], cfg["TW"], cfg["F"]
    H, W = cfg["H"], cfg["W"]
    pad0 = cfg["pad0"]
    s1 = float(cfg["stride1"])
    init_val = float(dist_type_select(cfg["dist_type"])[2])
    # emit="topk": fused in-kernel top-K over the W_t x ws x ws candidate
    # set (grid gains an st axis; the running K-list lives in VMEM and the
    # [ws,ws] volume never reaches HBM) — the SURVEY §7 design promise,
    # replacing the reference's separate torch argsort
    # (lib/stnls/search/impl/non_local_search.py:118-134).
    emit = cfg.get("emit", "volume")
    W_t = cfg.get("W_t", None)
    n_slots = cfg.get("n_slots", 0)
    anchor = bool(cfg.get("anchor", False))
    descending = dist_type_select(cfg["dist_type"])[1]
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
    ncr, cc_terms, x_terms = _corner_terms(is_int, dist_is_l2)
    tapsum = functools.partial(_tapsum_to_queries, taps=taps, t0s=t0s,
                               TH=TH, TW=TW, stride0=stride0)

    RWc, VWc, AWb = dm["RWc"], dm["VWc"], dm["AWb"]

    save_acc = bool(cfg.get("save_acc", False))

    def kernel(scal_ref, jbits_ref, v0_ref, v1_ref, l0h_ref, l0w_ref,
               th_ref, tw_ref, ctrh_ref, ctrw_ref, offh_ref, offw_ref,
               *rest):
        if emit == "topk":
            outl_ref, selfid_ref = rest[0], rest[1]
            outd_ref, outi_ref, outs_ref = rest[2], rest[3], rest[4]
            rest = rest[5:]
        else:
            out_ref, rest = rest[0], rest[1:]
        # with save_acc the selected corner-window volume is emitted as a
        # residual so the backward kernel can skip its recompute sweep
        if save_acc:
            accout_ref, rest = rest[0], rest[1:]
        if emit == "topk":
            (tkv_ref, tki_ref, selfv_ref, d0v_ref) = rest[:4]
            rest = rest[4:]
        (v0w_ref, rawscr_ref, bst_ref, ast_ref, xst_ref, acc_ref,
         selw_ref, sem0, sem1) = rest
        bh = pl.program_id(0)
        if emit == "topk":
            ti = pl.program_id(1)
            t = pl.program_id(2)
            st = pl.program_id(3)
            p = ti * W_t + st
        else:
            p = pl.program_id(1)
            t = pl.program_id(2)
        # scal is flattened 1-D in SMEM (tile padding of a 4-D prefetch
        # operand overflows the 1 MB SMEM at 1080p band sizes)
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

        # -- DMA the two row x col-block windows (dynamic row offsets;
        # col offsets provably 128-aligned, fine part via lane roll) --
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
        v0w = v0w_ref[:, :, 0:TPWx]
        # column rebase: align the per-tile window origin to local col 0
        # (dynamic lane roll — dynamic lane slices are not lowerable)
        rawscr_ref[...] = pltpu.roll(rawscr_ref[...], shift=-cw0r, axis=2)

        # -- phase images: separable hat-weight interp, static slices.
        #    Row AND column weights are traced scalars (both origins are
        #    per-tile rebased). --
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

        # -- L2 self-product fields, tap-summed once --
        for ei, e in enumerate(x_es):
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
        acc_ref[:] = jnp.zeros_like(acc_ref)

        # -- dense volume + separable one-hot selection; fori over the
        #    pixel row shift, phases/column shifts unrolled (static).
        #    Row/col shifts that match NO query in the tile (smooth flows
        #    make most combos empty) are skipped via prefetched per-tile
        #    activity bits + pl.when — the data-adaptive pruning the
        #    reference gets for free from its one-thread-per-(query,cell)
        #    launch (non_local_search_int_kernel.cu:208-223).
        #    _stage is a perf-bisect debug knob (wrong results except
        #    "full"): "skipfori" drops the sweep, "prodonly" drops the
        #    one-hot selection --
        stage = cfg.get("_stage", "full")
        predicate = cfg.get("predicate", True) and stage == "full"
        joint = bool(cfg.get("joint", False)) and predicate
        NSC = 10
        Dloc = m * ZL
        NJW = cfg.get("NJW", 1)
        # joint activity table base for this tile (see pack_joint_bits)
        jtb = ((bh * cfg["P"] + p) * cfg["nTg"] + t) * (Dloc * NJW)

        def row_live(j_h):
            return jbits_ref[jtb + j_h * NJW] != 0 if joint \
                else sread(NSC + j_h) != 0

        def col_live(j_h, j_w):
            if not joint:
                return sread(NSC + Dloc + j_w) != 0
            word = jbits_ref[jtb + j_h * NJW + 1 + (j_w // 32)]
            return ((word >> (j_w % 32)) & 1) != 0

        def zzh_body(zzh, _):
            # hoist the traced shift: selection compares below become
            # compares against STATIC constants (traced-scalar broadcasts
            # measured ~30x slower per compare, probe_r5_mxu2 piece D)
            l0hz = l0h - m * zzh
            for r in range(m):
                j_h = r + m * zzh

                def row_body(r=r, j_h=j_h):
                    if stage != "prodonly":
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
                                if stage == "prodonly":
                                    for fam in range(nfam):
                                        acc_ref[fam * Sp * Sp] += vals[fam]
                                    return
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
                    if stage == "prodonly":
                        return
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

        if stage != "skipfori":
            lax.fori_loop(0, ZL, zzh_body, 0)

        def accv(fam, uh, uw):
            return acc_ref[(fam * Sp + uh) * Sp + uw]

        # -- assembly --
        th = th_ref[0, 0, 0]
        tw = tw_ref[0, 0, 0]
        ctrh = ctrh_ref[0, 0, 0]
        ctrw = ctrw_ref[0, 0, 0]
        offh = offh_ref[0, 0, 0]
        offw = offw_ref[0, 0, 0]
        whc = (1. - th, th)
        wvc = (1. - tw, tw)
        if emit == "topk":
            # reset the running K-list at the start of each query frame's
            # temporal window
            @pl.when(st == 0)
            def _():
                tkv_ref[:] = jnp.full_like(tkv_ref, init_val)
                # empty slots carry a +huge id sentinel: under the
                # value-then-id tie rule in insert() any REAL candidate
                # (even one carrying init_val, e.g. out-of-frame cells)
                # displaces them, and since every cell is inserted and
                # S >= n_slots, no sentinel survives to the output
                # (ADVICE r4 #2).
                tki_ref[:] = jnp.full_like(tki_ref, 1 << 30)
                selfv_ref[:] = jnp.full_like(selfv_ref, init_val)
                if anchor:
                    d0v_ref[:] = jnp.full_like(d0v_ref, init_val)
            outl_b = outl_ref[0, 0, 0] != 0
            if anchor:
                selfid = selfid_ref[0, 0, 0]

            def insert(cand, sid):
                """Bubble the candidate plane into the sorted K-list.

                Tie rule: on equal values the LOWER cell id wins —
                exactly lax.top_k's stable lowest-index-first order.
                (A bare strict compare is NOT enough: a finite candidate
                arriving after several init-valued ones displaces the
                init run's head, which would then re-insert at the run's
                tail, scrambling the init-tail order the lazy path
                reports. The id tie-break keeps displaced entries in
                position, and lets real init-valued candidates claim the
                +huge-id sentinel slots.)"""
                carry_v = cand
                carry_i = jnp.zeros((TH, TW), jnp.int32) + sid
                for s in range(n_slots):
                    inc_v = tkv_ref[s]
                    inc_i = tki_ref[s]
                    b = (carry_v > inc_v) if descending \
                        else (carry_v < inc_v)
                    b = b | ((carry_v == inc_v) & (carry_i < inc_i))
                    tkv_ref[s] = jnp.where(b, carry_v, inc_v)
                    tki_ref[s] = jnp.where(b, carry_i, inc_i)
                    carry_v = jnp.where(b, inc_v, carry_v)
                    carry_i = jnp.where(b, inc_i, carry_i)

        if dist_is_l2:
            ps0 = tapsum(jnp.sum(v0w * v0w, axis=1))
        for i in range(ws):
            ph = ctrh + s1 * (i - offh)
            vh = jnp.logical_and(ph >= 0., ph <= float(H - 1))
            for j in range(ws):
                pw = ctrw + s1 * (j - offw)
                vw = jnp.logical_and(pw >= 0., pw <= float(W - 1))
                oh, ow = su * i, su * j
                d = ps0 if dist_is_l2 else None
                for (ch, cw) in cc_terms:
                    ccv = accv(0, oh + ch, ow + cw)
                    term = ccv if is_int else whc[ch] * wvc[cw] * ccv
                    if dist_is_l2:
                        d = d - 2. * term
                    else:
                        d = term if d is None else d + term
                if dist_is_l2:
                    for (ch, cw, ch2, cw2, c_use, fam) in x_terms:
                        xv = accv(fam, oh + c_use[0], ow + c_use[1])
                        if is_int:
                            d = d + xv
                        else:
                            wgt = (whc[ch] * wvc[cw]
                                   * whc[ch2] * wvc[cw2])
                            d = d + wgt * xv
                valid = jnp.logical_and(vh, vw)
                d = jnp.where(valid, d, init_val)
                if emit == "volume":
                    out_ref[0, 0, 0, i * ws + j] = d
                    continue
                # ---- fused top-K emission ----
                d_m = jnp.where(outl_b, init_val, d)
                sid = st * (ws * ws) + (i * ws + j)
                if anchor:
                    # mirror of the lazy path's d_anch (non_local_search.
                    # _pallas_topk_aux): the self cell is pulled out to
                    # slot 0, its position holds the original cell-0
                    # value, and position 0 is excluded from ranking
                    is_self = selfid == sid
                    selfv_ref[:] = jnp.where(is_self, d_m, selfv_ref[:])
                    if i == 0 and j == 0:
                        @pl.when(st == 0)
                        def _():
                            d0v_ref[:] = d_m

                        @pl.when(st != 0)
                        def _():
                            insert(jnp.where(is_self, d0v_ref[:], d_m),
                                   sid)
                    else:
                        insert(jnp.where(is_self, d0v_ref[:], d_m), sid)
                else:
                    insert(d_m, sid)

        if emit == "topk":
            @pl.when(st == W_t - 1)
            def _():
                for s in range(n_slots):
                    outd_ref[0, 0, 0, s] = tkv_ref[s]
                    outi_ref[0, 0, 0, s] = tki_ref[s]
                outs_ref[0, 0, 0] = selfv_ref[:]

        if save_acc:
            accout_ref[0, 0, 0] = acc_ref[...]

    return kernel, dm


def _fwd_pallas_call(cfg, v0e, v1p, scal, jbits, l0h, l0w, th, tw, ctrh,
                     ctrw, offh, offw, interpret, outlp=None,
                     selfidp=None):
    BH, P, nT = cfg["BH"], cfg["P"], cfg["nTg"]
    TH, TW, F = cfg["TH"], cfg["TW"], cfg["F"]
    ws = cfg["ws"]
    emit = cfg.get("emit", "volume")
    kernel, dm = _make_fwd_kernel(cfg)
    save_acc = bool(cfg.get("save_acc", False))
    nacc = dm["nfam"] * cfg["Sp"] * cfg["Sp"]
    scratch = [
        pltpu.VMEM((dm["TPHx"], F, dm["VWc"]), jnp.float32),
        pltpu.VMEM((dm["RH"], F, dm["RWc"]), jnp.float32),
        pltpu.VMEM((dm["NR"], dm["AH"], F, dm["AWb"]), jnp.float32),
        pltpu.VMEM((dm["NR"] * dm["NS"], dm["AH"], F, dm["AW"]),
                   jnp.float32),
        pltpu.VMEM((dm["XFH"], dm["NXST"], dm["XFW"]), jnp.float32),
        pltpu.VMEM((dm["nfam"] * cfg["Sp"] * cfg["Sp"], TH, TW),
                   jnp.float32),
        pltpu.VMEM((dm["nfam"] * cfg["Sp"], TH, TW), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    ]
    if emit == "volume":
        qspec = pl.BlockSpec((1, 1, 1, TH, TW),
                             lambda bh, p, t, *_: (bh, p, t, 0, 0),
                             memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec(
            (1, 1, 1, ws * ws, TH, TW),
            lambda bh, p, t, *_: (bh, p, t, 0, 0, 0),
            memory_space=pltpu.VMEM)
        accspec = pl.BlockSpec(
            (1, 1, 1, nacc, TH, TW),
            lambda bh, p, t, *_: (bh, p, t, 0, 0, 0),
            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(BH, P, nT),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # v0e
                pl.BlockSpec(memory_space=pl.ANY),   # v1p
                qspec, qspec, qspec, qspec, qspec, qspec, qspec, qspec,
            ],
            out_specs=(dspec, accspec) if save_acc else dspec,
            scratch_shapes=scratch)
        out_shape = jax.ShapeDtypeStruct((BH, P, nT, ws * ws, TH, TW),
                                         jnp.float32)
        if save_acc:
            out_shape = (out_shape,
                         jax.ShapeDtypeStruct((BH, P, nT, nacc, TH, TW),
                                              jnp.float32))
        return pl.pallas_call(
            kernel, out_shape=out_shape, grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=interpret,
        )(scal, jbits, v0e, v1p, l0h, l0w, th, tw, ctrh, ctrw, offh, offw)

    # ---- emit == "topk": grid (BH, Tq, nT, W_t), st minor so the
    # running K-list accumulates across the temporal window ----
    W_t = cfg["W_t"]
    n_slots = cfg["n_slots"]
    Tq = P // W_t
    assert Tq * W_t == P

    def pair_ix(bh, ti, t, st, *_):
        return (bh, ti * W_t + st, t, 0, 0)

    qspec = pl.BlockSpec((1, 1, 1, TH, TW), pair_ix,
                         memory_space=pltpu.VMEM)
    selfspec = pl.BlockSpec((1, 1, 1, TH, TW),
                            lambda bh, ti, t, st, *_: (bh, ti, t, 0, 0),
                            memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec(
        (1, 1, 1, n_slots, TH, TW),
        lambda bh, ti, t, st, *_: (bh, ti, t, 0, 0, 0),
        memory_space=pltpu.VMEM)
    accspec = pl.BlockSpec(
        (1, 1, 1, nacc, TH, TW),
        lambda bh, ti, t, st, *_: (bh, ti * W_t + st, t, 0, 0, 0),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BH, Tq, nT, W_t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # v0e
            pl.BlockSpec(memory_space=pl.ANY),   # v1p
            qspec, qspec, qspec, qspec, qspec, qspec, qspec, qspec,
            qspec,                               # outlp [BH,P,nT,TH,TW]
            selfspec,                            # selfidp [BH,Tq,nT,TH,TW]
        ],
        out_specs=(kspec, kspec, selfspec) + ((accspec,) if save_acc
                                              else ()),
        scratch_shapes=[
            pltpu.VMEM((n_slots, TH, TW), jnp.float32),   # tkv
            pltpu.VMEM((n_slots, TH, TW), jnp.int32),     # tki
            pltpu.VMEM((TH, TW), jnp.float32),            # selfv
            pltpu.VMEM((TH, TW), jnp.float32),            # d0v
        ] + scratch)
    out_shape = (
        jax.ShapeDtypeStruct((BH, Tq, nT, n_slots, TH, TW), jnp.float32),
        jax.ShapeDtypeStruct((BH, Tq, nT, n_slots, TH, TW), jnp.int32),
        jax.ShapeDtypeStruct((BH, Tq, nT, TH, TW), jnp.float32),
    )
    if save_acc:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((BH, P, nT, nacc, TH, TW), jnp.float32),)
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(scal, jbits, v0e, v1p, l0h, l0w, th, tw, ctrh, ctrw, offh, offw,
      outlp, selfidp)


# ---------------------------------------------------------------------------
# full wrapper: flows -> per-query prep -> kernel -> volume layout
# ---------------------------------------------------------------------------

def pallas_outliers(vid_shape, flows, *, ws, wt, ps, stride0, stride1,
                    dist_type="l2", dilation=1, full_ws=True,
                    use_adj=False, itype="float", flow_budget=8,
                    spread_budget=8, tile=None, row0=0, col0=0):
    """Outlier mask [B,HD,T,W_t,nH,nW] the kernel WOULD flag for these
    flows — pure jnp prep, no Pallas call/compile. Used by exactness
    guards (bench.py) to validate a flow budget cheaply. row0/col0 +
    band-sliced flows reproduce a streaming band's exact tiling (the
    spill condition depends on the band's own tile grid — ADVICE r3 #1)."""
    B, HD, T, F, H, W = vid_shape
    return _pallas_prep(vid_shape, flows, ws=ws, wt=wt, ps=ps,
                        stride0=stride0, stride1=stride1,
                        dilation=dilation, full_ws=full_ws, use_adj=use_adj,
                        itype=itype, flow_budget=flow_budget,
                        spread_budget=spread_budget, tile=tile,
                        row0=row0, col0=col0)["outliers"]


def _pallas_prep(vid_shape, flows, *, ws, wt, ps, stride0, stride1,
                 dilation, full_ws, use_adj, itype, flow_budget,
                 spread_budget, tile, row0=0, col0=0, T_win=None):
    """Shared geometry prep (centers, window offsets, lattice anchors,
    per-tile row rebasing, outlier flags) — pure jnp, no Pallas call.

    row0/col0: first query-grid row/col of this band (global units);
    flows carry only the band's rows/cols, so nH/nW come from flows, not
    the video."""
    B, HD, T, F, H, W = vid_shape
    is_int = (itype == "int")
    if is_int:
        stride1 = float(max(1, int(stride1)))
        flows = jnp.round(flows).astype(jnp.float32) \
            if jnp.issubdtype(flows.dtype, jnp.floating) \
            else flows.astype(jnp.float32)
    else:
        stride1 = float(stride1)
    geo = pallas_geometry(ws=ws, ps=ps, stride1=stride1, dilation=dilation,
                          flow_budget=flow_budget,
                          spread_budget=spread_budget, use_adj=use_adj)
    m, su, Sp = geo["m"], geo["su"], geo["Sp"]
    ZMAX, ZMAXc, Dloc, Dkc = (geo["ZMAX"], geo["ZMAXc"], geo["Dloc"],
                              geo["Dkc"])
    KLO = -m * ZMAX
    KHI = KLO + m * (2 * ZMAX + 1) - 1
    KLOc = -m * ZMAXc
    KHIc = KLOc + m * (2 * ZMAXc + 1) - 1   # global clip (flow budget)
    Tq = flows.shape[2]           # query frames (== T unless time-chunked)
    W_t = min(2 * wt + 1, T if T_win is None else T_win)
    nHq, nWq = num_queries(H, W, stride0)
    nH = flows.shape[-2]          # band rows (== nHq when unbanded)
    nW = flows.shape[-1]          # band cols (== nWq when unbanded)
    assert nH <= nHq and nW <= nWq
    if tile is None:
        # 16-row tiles halve the per-step count and amortize the window
        # DMAs (measured ~12% on the fwd kernel); row counts not
        # divisible by 16 fall back to <=8 (odd TH pads sublanes)
        if nH >= 32 and nH % 16 == 0:
            TH = 16
        else:
            TH = _largest_divisor_leq(nH, 8)
    else:
        TH = tile[0] if isinstance(tile, (tuple, list)) else tile
    assert nH % TH == 0
    nT = nH // TH
    BH = B * HD
    st_offset = W_t - flows.shape[3]
    assert st_offset in (0, 1)
    flows = _expand_flow_heads(flows, HD)
    dtype = jnp.float32
    ref_h = ((row0 + jnp.arange(nH, dtype=jnp.int32)) * stride0) % H
    ref_w = ((col0 + jnp.arange(nW, dtype=jnp.int32)) * stride0) % W
    base_h = ref_h[None, None, None, None, :, None].astype(dtype)
    base_w = ref_w[None, None, None, None, None, :].astype(dtype)
    fH = flows[:, :, :, :, 1]
    fW = flows[:, :, :, :, 0]
    if st_offset == 1:
        zshape = fH.shape[:3] + (1,) + fH.shape[4:]
        zero = jnp.zeros(zshape, fH.dtype)
        fH = jnp.concatenate([zero, fH], axis=3)
        fW = jnp.concatenate([zero, fW], axis=3)
    ctr_h = reflect_bounds(base_h + fH, H)
    ctr_w = reflect_bounds(base_w + fW, W)
    off_h, off_w = search_offsets(ctr_h, ctr_w, stride1, ws, H, W,
                                  full_ws, False)
    rho_h = m * (ctr_h - base_h) - su * off_h
    rho_w = m * (ctr_w - base_w) - su * off_w
    k0h_f = jnp.floor(lax.stop_gradient(rho_h))
    k0w_f = jnp.floor(lax.stop_gradient(rho_w))
    th = (rho_h - k0h_f).astype(dtype)
    tw = (rho_w - k0w_f).astype(dtype)
    k0h = k0h_f.astype(jnp.int32)
    k0w = k0w_f.astype(jnp.int32)
    out_h = (k0h < KLO) | (k0h + Sp - 1 > KHI)
    out_w = (k0w < KLOc) | (k0w + Sp - 1 > KHIc)
    outliers = out_h | out_w
    k0h = jnp.clip(k0h, KLO, KHI - Sp + 1)
    k0w = jnp.clip(k0w, KLOc, KHIc - Sp + 1)
    if is_int:
        th = jnp.zeros_like(th)
        tw = jnp.zeros_like(tw)
    P = Tq * W_t
    Dkc = geo["Dkc"]
    k0h_t = k0h.reshape(BH, P, nT, TH, nW)
    oh_t = jnp.clip(jnp.min(k0h_t, axis=(3, 4)), KLO, KHI - Dloc + 1)
    l0h = k0h_t - oh_t[..., None, None]
    spill = (l0h < 0) | (l0h > Dloc - Sp)
    l0h = jnp.clip(l0h, 0, Dloc - Sp)
    # column rebasing (mirror of rows; origin applied in-kernel via a
    # dynamic lane roll of the raw window)
    k0w_t = k0w.reshape(BH, P, nT, TH, nW)
    ow_t = jnp.clip(jnp.min(k0w_t, axis=(3, 4)), KLOc, KHIc - Dkc + 1)
    l0w = k0w_t - ow_t[..., None, None]
    spill_c = (l0w < 0) | (l0w > Dkc - Sp)
    l0w = jnp.clip(l0w, 0, Dkc - Sp)
    outliers = outliers | (spill | spill_c).reshape(B, HD, Tq, W_t, nH, nW)
    return dict(geo=geo, stride1=stride1, is_int=is_int, W_t=W_t, nH=nH,
                nW=nW, TH=TH, nT=nT, BH=BH, P=P, ctr_h=ctr_h, ctr_w=ctr_w,
                off_h=off_h, off_w=off_w, th=th, tw=tw, l0h=l0h,
                l0w=l0w, oh_t=oh_t, ow_t=ow_t, outliers=outliers,
                base_h=base_h, base_w=base_w)


def _pad_vids(vid0, vid1, pad0, pad1):
    """Reflect-pad + rows-major relayout [BH, T, Hp, F, Wp].

    DMA slice shapes must respect the (8, 128) HBM tiling: round the
    channel dim up to 8 and the minor (width) dim up to 128 with zeros
    (zero channels/columns contribute nothing to any distance term)."""
    B, HD, T, F, H, W = vid0.shape
    BH = B * HD
    Fp = -(-F // 8) * 8
    v0p = jnp.pad(vid0.astype(jnp.float32),
                  ((0, 0),) * 4 + ((pad0, pad0), (pad0, pad0)),
                  mode="reflect").reshape(BH, T, F, H + 2 * pad0,
                                          W + 2 * pad0)
    v0p = jnp.transpose(v0p, (0, 1, 3, 2, 4))
    W0r = -(-(W + 2 * pad0) // 128) * 128 - (W + 2 * pad0)
    v0p = jnp.pad(v0p, ((0, 0), (0, 0), (0, 0), (0, Fp - F), (0, W0r)))
    v1p = jnp.pad(vid1.astype(jnp.float32),
                  ((0, 0),) * 4 + ((pad1, pad1), (pad1, pad1)),
                  mode="reflect").reshape(BH, T, F, H + 2 * pad1,
                                          W + 2 * pad1)
    v1p = jnp.transpose(v1p, (0, 1, 3, 2, 4))
    W1r = -(-(W + 2 * pad1) // 128) * 128 - (W + 2 * pad1)
    v1p = jnp.pad(v1p, ((0, 0), (0, 0), (0, 0), (0, Fp - F), (0, W1r)))
    return v0p, v1p


def pallas_pad_vids(vid0, vid1, *, ws, ps, stride1, dilation=1,
                    flow_budget=8, spread_budget=8, use_adj=False,
                    itype="float"):
    """Public pad helper for the banded streaming path: pad once, pass
    via nls_pallas_volume(padded_vids=...) for every band."""
    if itype == "int":
        stride1 = float(max(1, int(stride1)))
    geo = pallas_geometry(ws=ws, ps=ps, stride1=float(stride1),
                          dilation=dilation, flow_budget=flow_budget,
                          spread_budget=spread_budget, use_adj=use_adj)
    return _pad_vids(vid0, vid1, geo["pad0"], geo["pad1"])


def _build_inputs(vid0, vid1, flows, *, ws, wt, ps, stride0, stride1,
                  dist_type, dilation, full_ws, use_adj, itype,
                  flow_budget, spread_budget, tile, row0, col0,
                  padded_vids, query_t0, T_global, _stage="full",
                  _bskip="", predicate=True):
    """Shared geometry/DMA-scalar setup for the volume and fused-top-K
    entry points. Returns everything the kernel calls need."""
    B, HD, T, F, H, W = vid0.shape
    assert vid1.shape[-2:] == (H, W)

    # ---- per-query center / window / lattice-anchor prep (differentiable
    # where the reference is: th/tw carry the flow gradient) ----
    prep = _pallas_prep(vid0.shape, flows, ws=ws, wt=wt, ps=ps,
                        stride0=stride0, stride1=stride1, dilation=dilation,
                        full_ws=full_ws, use_adj=use_adj, itype=itype,
                        flow_budget=flow_budget, spread_budget=spread_budget,
                        tile=tile, row0=row0, col0=col0, T_win=T_global)
    geo, stride1, is_int = prep["geo"], prep["stride1"], prep["is_int"]
    W_t, nH, nW = prep["W_t"], prep["nH"], prep["nW"]
    TH, nT, BH, P = prep["TH"], prep["nT"], prep["BH"], prep["P"]
    TW = nW      # full query rows (columns are not tiled)
    ctr_h, ctr_w = prep["ctr_h"], prep["ctr_w"]
    off_h, off_w = prep["off_h"], prep["off_w"]
    l0h, oh_t = prep["l0h"], prep["oh_t"]
    m, su, Sp = geo["m"], geo["su"], geo["Sp"]
    pad0, pad1, t0s = geo["pad0"], geo["pad1"], geo["t0s"]
    dtype = jnp.float32

    def to_tiles(x):
        """[B,HD,T,W_t,nH,nW] -> [BH, P, nT, TH, TW]."""
        return x.reshape(BH, P, nT, TH, TW)

    # ---- per-tile DMA scalars + frame-pair tables ----
    Tq = flows.shape[2] if flows.ndim >= 7 else T
    if query_t0 is None:
        tj_table = time_window_frames(T, wt)      # [T, W_t] np
        t_tab = np.repeat(np.arange(T), W_t).astype(np.int32)
        tj_tab = np.asarray(tj_table).reshape(-1).astype(np.int32)
        dt_tab = jnp.asarray(np.asarray(tj_table)
                             - np.arange(T)[:, None])
    else:
        # temporal chunk: window tables in GLOBAL frame coordinates,
        # translated to local (halo-padded) indices; traced is fine — the
        # kernel reads ti/tj from the prefetched scal
        from stnls_tpu.ops.nls import time_window_frames_jnp
        halo_t = (T - Tq) // 2
        tq = query_t0 + jnp.arange(Tq, dtype=jnp.int32)
        tjg = time_window_frames_jnp(tq, wt, T_global)   # [Tq, W_t]
        t_tab = jnp.repeat(halo_t + jnp.arange(Tq, dtype=jnp.int32), W_t)
        tj_tab = (tjg - query_t0 + halo_t).reshape(-1).astype(jnp.int32)
        dt_tab = tjg - tq[:, None]

    # ---- padded videos, rows-major layout [BH, T, Hp, F, Wp] ----
    if padded_vids is None:
        v0p, v1p = _pad_vids(vid0, vid1, pad0, pad1)
    else:
        v0p, v1p = padded_vids
    Fp = v0p.shape[3]

    cfg = dict(geo, ws=ws, ps=ps, stride0=stride0, stride1=stride1,
               dist_type=dist_type, is_int=is_int, TH=TH, TW=TW, F=Fp,
               H=H, W=W, _stage=_stage, _bskip=_bskip,
               predicate=predicate)
    dmw = kernel_dims(cfg)

    ty0 = (row0 + jnp.arange(nT, dtype=jnp.int32) * TH) * stride0
    WINh = m * (ty0[None, None] - t0s) + oh_t     # [BH, P, nT]
    r0 = jnp.floor_divide(WINh, m) + (pad1 - 1)
    wmodh = WINh - m * jnp.floor_divide(WINh, m)
    tyv = ty0 - t0s + pad0                        # v0 window origin [nT]
    # per-tile column window origin: 128-aligned DMA block + fine roll
    ow_t = prep["ow_t"]
    WINw = m * (col0 * stride0 - t0s) + ow_t      # [BH, P, nT]
    cw0 = jnp.floor_divide(WINw, m) + (pad1 - 1)
    wmodw = WINw - m * jnp.floor_divide(WINw, m)
    # the 128-block index must be CONSTANT per call (a varying col-block
    # DMA offset across grid steps faults the TPU worker); anchor it at
    # the minimum possible origin and absorb the per-tile span in the roll
    KLOc_ = -m * geo["ZMAXc"]
    WINw_min = m * (col0 * stride0 - t0s) + KLOc_
    cw0_min = WINw_min // m + (pad1 - 1)
    dc1s = jnp.clip(jnp.asarray(cw0_min // 128, jnp.int32), 0,
                    (v1p.shape[-1] - dmw["RWc"]) // 128)
    dc1 = jnp.broadcast_to(dc1s, cw0.shape)
    cw0r = cw0 - 128 * dc1
    cstart = col0 * stride0 + pad0 - t0s
    dc0v = min(max(int(cstart) // 128, 0),
               (v0p.shape[-1] - dmw["VWc"]) // 128) \
        if not hasattr(cstart, "dtype") else jnp.clip(
            cstart // 128, 0, (v0p.shape[-1] - dmw["VWc"]) // 128)
    cv0r = cstart - 128 * dc0v
    ti_b = jnp.broadcast_to(jnp.asarray(t_tab)[None, :, None], r0.shape)
    tj_b = jnp.broadcast_to(jnp.asarray(tj_tab)[None, :, None], r0.shape)
    tyv_b = jnp.broadcast_to(tyv[None, None, :], r0.shape)
    dc0_b = jnp.broadcast_to(jnp.asarray(dc0v, jnp.int32), r0.shape)
    cv0_b = jnp.broadcast_to(jnp.asarray(cv0r, jnp.int32), r0.shape)
    scal = jnp.stack([r0, wmodh, ti_b, tj_b, tyv_b, cw0r, wmodw,
                      dc1, dc0_b, cv0_b], axis=-1).astype(jnp.int32)
    # per-tile shift-activity bits. Default: JOINT (row, col) activity —
    # combo (j_h, j_w) is live iff SOME query in the tile needs both
    # (l0h in (j_h-Sp, j_h] AND l0w in (j_w-Sp, j_w]). The marginal
    # product over-approximates the live set ~2-3x for smooth flows
    # (queries lie on a smooth curve in shift space, not a box); the
    # K-sparse backward sharpens further with winner-only bits
    # (nls_pallas_bwd.winner_joint_bits). Packed 32 col-shifts per int32
    # word + a per-row any() flag, flattened 1-D for SMEM; falls back to
    # the marginal bits when the packed table would crowd the 1 MB SMEM.
    Dloc_, Dkc_ = geo["Dloc"], geo["Dkc"]
    l0hf = l0h.reshape(BH, P, nT, -1)
    l0wf = prep["l0w"].reshape(BH, P, nT, -1)
    nww = -(-Dkc_ // 32)
    NJW = 1 + nww
    joint_ok = bool(cfg.get("predicate", True)) and (
        (10 * BH * P * nT + BH * P * nT * Dloc_ * NJW) * 4 <= (768 << 10))
    cfg.update(joint=joint_ok, NJW=NJW)
    if joint_ok:
        rowhit = ((l0hf[:, :, :, None, :]
                   > jnp.arange(Dloc_)[:, None] - Sp)
                  & (l0hf[:, :, :, None, :]
                     <= jnp.arange(Dloc_)[:, None]))
        colhit = ((l0wf[:, :, :, None, :]
                   > jnp.arange(Dkc_)[:, None] - Sp)
                  & (l0wf[:, :, :, None, :]
                     <= jnp.arange(Dkc_)[:, None]))
        jbits = pack_joint_bits(rowhit, colhit, Dkc_)
    else:
        rowact = jnp.stack(
            [jnp.any((l0hf > j - Sp) & (l0hf <= j), axis=-1)
             for j in range(Dloc_)], axis=-1)
        colact = jnp.stack(
            [jnp.any((l0wf > j - Sp) & (l0wf <= j), axis=-1)
             for j in range(Dkc_)], axis=-1)
        scal = jnp.concatenate(
            [scal, rowact.astype(jnp.int32), colact.astype(jnp.int32)],
            axis=-1)
        jbits = jnp.zeros((1,), jnp.int32)
    # flatten to 1-D for SMEM: a [BH,P,nT,NSCAL] prefetch operand gets
    # (sublane, lane) tile padding to (16,128) in SMEM, overflowing the
    # 1 MB budget at 1080p band sizes; the flat form stays at true size
    cfg.update(BH=BH, P=P, nTg=nT, NSCAL=int(scal.shape[-1]))
    scal = scal.reshape(-1)

    # ---- separable offset factors (identical to the other paths):
    # dt depends on (t, wt) only, dh on (.., wt, wi, y, x), dw on
    # (.., wt, wj, y, x) — the full [3, ...] offset volume is only
    # materialized on demand (aux_to_inds3); top-K pipelines gather the
    # K selected offsets straight from these small factors ----
    cdtype = jnp.int32 if is_int else vid0.dtype
    cells = jnp.arange(ws, dtype=dtype)
    s1c = jnp.asarray(stride1, dtype)
    base_h, base_w = prep["base_h"], prep["base_w"]
    prop_h = ctr_h[:, :, :, :, None] + s1c * (cells[:, None, None]
                                              - off_h[:, :, :, :, None])
    prop_w = ctr_w[:, :, :, :, None] + s1c * (cells[:, None, None]
                                              - off_w[:, :, :, :, None])
    dt = dt_tab.astype(cdtype)                 # [Tq, W_t]
    dh_s = prop_h - base_h[:, :, :, :, None]   # [B,HD,Tq,W_t,ws,nH,nW]
    dw_s = prop_w - base_w[:, :, :, :, None]
    if is_int:
        dh_s = dh_s.astype(cdtype)
        dw_s = dw_s.astype(cdtype)
    aux = dict(dt_tab=dt, dh=dh_s, dw=dw_s, cdtype=cdtype)

    op_args = (v0p, v1p, scal, jbits, l0h, prep["l0w"],
               to_tiles(prep["th"]), to_tiles(prep["tw"]),
               to_tiles(ctr_h), to_tiles(ctr_w),
               to_tiles(off_h.astype(dtype)),
               to_tiles(off_w.astype(dtype)))
    dims = dict(B=B, HD=HD, T=T, Tq=Tq, W_t=W_t, nH=nH, nW=nW, TH=TH,
                TW=TW, nT=nT, BH=BH, P=P)
    return dict(cfg=cfg, dmw=dmw, prep=prep, aux=aux, dims=dims,
                op_args=op_args, to_tiles=to_tiles,
                outliers=prep["outliers"])


def _resolve_save_acc(save_acc, cfg, dmw, dims):
    if save_acc == "auto":
        # save the selected corner-window volume as a bwd residual when it
        # fits comfortably in HBM (skips the bwd's recompute sweep);
        # callers with many streamed bands pass an explicit bool
        acc_bytes = (dims["BH"] * dims["P"] * dims["nT"] * dmw["nfam"]
                     * cfg["Sp"] ** 2 * dims["TH"] * dims["TW"] * 4)
        save_acc = acc_bytes <= (3 << 29)       # 1.5 GB
    return bool(save_acc)


def nls_pallas_volume(vid0, vid1, flows, *, ws, wt, ps, stride0, stride1,
                      dist_type="l2", dilation=1, full_ws=True,
                      use_adj=False, itype="float", flow_budget=8,
                      spread_budget=8, tile=None, interpret=None,
                      row0=0, col0=0, padded_vids=None, save_acc="auto",
                      _stage="full", _bskip="", predicate=True,
                      return_aux=False, query_t0=None, T_global=None):
    """Pallas-kernel NLS volume. Returns (dists [B,HD,T,W_t,ws,ws,nH,nW],
    inds3 [3,...], outliers [B,HD,T,W_t,nH,nW]).

    row0 + banded flows (nH_band rows) restrict the query grid to a row
    band — the memory-bounded streaming path (SURVEY hard part #5) maps
    over bands so nothing search-volume-sized for the full frame is ever
    materialized. padded_vids (from pallas_pad_vids) lets the band loop
    reuse one padded copy of the videos across bands.

    query_t0 + T_global: temporal-chunk mode for time sharding (the
    TPU-native analog of the reference's paired_vids streaming,
    search/utils.py:339-382). vid0/vid1 then hold T_local + 2*halo local
    frames, flows cover only the T_local query frames, and query_t0 (a
    possibly-traced global index of the first local frame) drives the
    boundary-shifted window tables — queries stay local, only the halo
    rides the ICI ring (parallel/shard.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bi = _build_inputs(vid0, vid1, flows, ws=ws, wt=wt, ps=ps,
                       stride0=stride0, stride1=stride1,
                       dist_type=dist_type, dilation=dilation,
                       full_ws=full_ws, use_adj=use_adj, itype=itype,
                       flow_budget=flow_budget,
                       spread_budget=spread_budget, tile=tile, row0=row0,
                       col0=col0, padded_vids=padded_vids,
                       query_t0=query_t0, T_global=T_global,
                       _stage=_stage, _bskip=_bskip, predicate=predicate)
    cfg, dims, outliers = bi["cfg"], bi["dims"], bi["outliers"]
    cfg["save_acc"] = _resolve_save_acc(save_acc, cfg, bi["dmw"], dims)
    B, HD, Tq, W_t = dims["B"], dims["HD"], dims["Tq"], dims["W_t"]
    nH, nW, TH, TW = dims["nH"], dims["nW"], dims["TH"], dims["TW"]
    BH, P, nT = dims["BH"], dims["P"], dims["nT"]

    d_t = _vol_op(_freeze(cfg), bool(interpret), *bi["op_args"])

    # [BH, P, nT, ws*ws, TH, TW] -> [B,HD,Tq,W_t,ws,ws,nH,nW]
    d = jnp.transpose(d_t.reshape(BH, P, nT, ws, ws, TH, TW),
                      (0, 1, 3, 4, 2, 5, 6)).reshape(
        B, HD, Tq, W_t, ws, ws, nH, nW)

    _, _, init_val = dist_type_select(dist_type)
    inval = jnp.asarray(init_val, jnp.float32)
    d = jnp.where(outliers[:, :, :, :, None, None], inval, d)

    aux = bi["aux"]
    d = d.astype(vid0.dtype)
    if return_aux:
        return d, aux, outliers
    return d, aux_to_inds3(aux, d.shape), outliers


def aux_to_inds3(aux, shape8):
    """Materialize the full offset volume inds3 [3, B,HD,T,W_t,ws,ws,nH,nW]
    from its separable factors (back-compat / fallback path)."""
    cdtype = aux["cdtype"]
    dt, dh_s, dw_s = aux["dt_tab"], aux["dh"], aux["dw"]
    dh = dh_s[:, :, :, :, :, None]            # broadcast over wj
    dw = dw_s[:, :, :, :, None, :]            # broadcast over wi
    return jnp.stack([
        jnp.broadcast_to(dt[None, None, :, :, None, None, None, None],
                         shape8).astype(cdtype),
        jnp.broadcast_to(dh, shape8).astype(cdtype),
        jnp.broadcast_to(dw, shape8).astype(cdtype),
    ], axis=0)


class _Frozen:
    """Hashable wrapper for the static cfg dict."""

    def __init__(self, d):
        self.d = dict(d)
        self._key = tuple(sorted(
            (k, tuple(v) if isinstance(v, list) else v)
            for k, v in self.d.items()))

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _Frozen) and self._key == other._key

    def __getitem__(self, k):
        return self.d[k]


def _freeze(cfg):
    cfg = dict(cfg)
    cfg["taps"] = tuple(cfg["taps"])
    return _Frozen(cfg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _vol_op(cfg, interpret, v0e, v1p, scal, jbits, l0h, l0w, th, tw,
            ctrh, ctrw, offh, offw):
    # primal-only path: never emit the save_acc residual
    return _fwd_pallas_call(dict(cfg.d, save_acc=False), v0e, v1p, scal,
                            jbits, l0h, l0w, th, tw, ctrh, ctrw, offh,
                            offw, interpret)


def _vol_fwd(cfg, interpret, v0e, v1p, scal, jbits, l0h, l0w, th, tw,
             ctrh, ctrw, offh, offw):
    out = _fwd_pallas_call(cfg.d, v0e, v1p, scal, jbits, l0h, l0w, th, tw,
                           ctrh, ctrw, offh, offw, interpret)
    accsaved = None
    if cfg.d.get("save_acc", False):
        out, accsaved = out
    return out, (v0e, v1p, scal, jbits, l0h, l0w, th, tw, ctrh, ctrw,
                 offh, offw, accsaved)


def _vol_bwd(cfg, interpret, res, g):
    from stnls_tpu.ops.nls_pallas_bwd import vol_bwd_pallas
    (v0e, v1p, scal, jbits, l0h, l0w, th, tw, ctrh, ctrw, offh, offw,
     accsaved) = res
    g_v0e, g_v1p, g_th, g_tw = vol_bwd_pallas(
        cfg.d, interpret, g, v0e, v1p, scal, jbits, l0h, l0w, th, tw,
        ctrh, ctrw, offh, offw, accsaved=accsaved)
    return (g_v0e, g_v1p, None, None, None, None, g_th, g_tw, None, None,
            None, None)


_vol_op.defvjp(_vol_fwd, _vol_bwd)


# ---------------------------------------------------------------------------
# fused in-kernel top-K entry point
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _topk_op(cfg, interpret, v0e, v1p, scal, jbits, l0h, l0w, th, tw,
             ctrh, ctrw, offh, offw, outlp, selfidp):
    # primal-only path: never emit the save_acc residual
    return _fwd_pallas_call(dict(cfg.d, save_acc=False), v0e, v1p, scal,
                            jbits, l0h, l0w, th, tw, ctrh, ctrw, offh,
                            offw, interpret, outlp, selfidp)


def _topk_fwd(cfg, interpret, v0e, v1p, scal, jbits, l0h, l0w, th, tw,
              ctrh, ctrw, offh, offw, outlp, selfidp):
    out = _fwd_pallas_call(cfg.d, v0e, v1p, scal, jbits, l0h, l0w, th, tw,
                           ctrh, ctrw, offh, offw, interpret,
                           outlp, selfidp)
    accsaved = None
    if cfg.d.get("save_acc", False):
        d_pl, i_pl, s_pl, accsaved = out
    else:
        d_pl, i_pl, s_pl = out
    return (d_pl, i_pl, s_pl), (v0e, v1p, scal, jbits, l0h, l0w, th, tw,
                                ctrh, ctrw, offh, offw, outlp, selfidp,
                                i_pl, accsaved)


def _topk_bwd(cfg, interpret, res, g):
    from stnls_tpu.ops.nls_pallas_bwd import topk_bwd_pallas, \
        winner_joint_bits
    g_d, _g_i, g_s = g
    (v0e, v1p, scal, jbits, l0h, l0w, th, tw, ctrh, ctrw, offh, offw,
     outlp, selfidp, i_pl, accsaved) = res
    if cfg.d.get("anchor", False):
        # the slot whose id == self_id holds the relocated cell-0 value
        cells_pl = jnp.where(i_pl == selfidp[:, :, :, None], 0, i_pl)
    else:
        cells_pl = i_pl
    if cfg.d.get("joint", False):
        # K-sparse backward: the cotangent touches only the winners'
        # ~2x2 corner cells, so the bwd kernel sweeps winner-only joint
        # bits instead of the forward's full-window bits (VERDICT r4 #3).
        # (An A/B that reuses the forward bits when save_acc residuals
        # already skip the recompute measured the SAME wall time — the
        # ~7 ms winner-bits prep overlaps the kernel — so the sharper
        # bits are kept unconditionally; probe_r5_bwd_phases.)
        jbits = winner_joint_bits(cfg.d, cells_pl, selfidp, l0h, l0w)
    g_v0e, g_v1p, g_th, g_tw = topk_bwd_pallas(
        cfg.d, interpret, g_d, g_s, cells_pl, selfidp, outlp,
        v0e, v1p, scal, jbits, l0h, l0w, th, tw, ctrh, ctrw, offh, offw,
        accsaved=accsaved)
    return (g_v0e, g_v1p, None, None, None, None, g_th, g_tw, None, None,
            None, None, None, None)


_topk_op.defvjp(_topk_fwd, _topk_bwd)


def nls_pallas_topk(vid0, vid1, flows, *, ws, wt, ps, stride0, stride1,
                    k, anchor, dist_type="l2", dilation=1, full_ws=True,
                    use_adj=False, itype="float", flow_budget=8,
                    spread_budget=8, tile=None, interpret=None,
                    row0=0, col0=0, padded_vids=None, save_acc="auto",
                    predicate=True, query_t0=None, T_global=None):
    """Fused search + in-kernel top-K: the [W_t,ws,ws] candidate volume
    never reaches HBM — the kernel keeps a running sorted K-list in VMEM
    across the temporal-window grid axis and emits only the winners
    (replacing the reference's materialize-then-argsort,
    lib/stnls/search/impl/non_local_search.py:118-134).

    Semantics == nls_pallas_volume + search.non_local_search.
    _pallas_topk_aux with self_action in {None, "anchor"/"anchor_self"}
    (anchor=True), topk_mode="all".

    Returns (dists [B,HD,Tq,nH,nW,K], inds [B,HD,Tq,nH,nW,K,3],
    cells [B,HD,Tq,nH,nW,K] int32, outliers [B,HD,Tq,W_t,nH,nW])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bi = _build_inputs(vid0, vid1, flows, ws=ws, wt=wt, ps=ps,
                       stride0=stride0, stride1=stride1,
                       dist_type=dist_type, dilation=dilation,
                       full_ws=full_ws, use_adj=use_adj, itype=itype,
                       flow_budget=flow_budget,
                       spread_budget=spread_budget, tile=tile, row0=row0,
                       col0=col0, padded_vids=padded_vids,
                       query_t0=query_t0, T_global=T_global,
                       predicate=predicate)
    cfg, dims, aux, outliers = bi["cfg"], bi["dims"], bi["aux"], \
        bi["outliers"]
    B, HD, Tq, W_t = dims["B"], dims["HD"], dims["Tq"], dims["W_t"]
    nH, nW, TH, TW = dims["nH"], dims["nW"], dims["TH"], dims["TW"]
    BH, nT = dims["BH"], dims["nT"]
    S = W_t * ws * ws
    kk = min(k, S)
    n_slots = kk - 1 if anchor else kk
    assert n_slots >= 1, "use the lazy path for k==1 with anchor"
    cfg.update(emit="topk", W_t=W_t, n_slots=n_slots, anchor=bool(anchor))
    cfg["save_acc"] = _resolve_save_acc(save_acc, cfg, bi["dmw"], dims)

    outlp = bi["to_tiles"](outliers).astype(jnp.int32)
    dt_tab = aux["dt_tab"]

    def onehot_wt(sel, planes6):
        """Select planes6[.., st, y, x] per-element by sel [.., y, x, K]:
        dense one-hot over the tiny W_t axis (a take_along/gather here
        scalarizes on TPU, ~9 ns/element)."""
        acc = None
        for st_i in range(W_t):
            v = jnp.where(sel == st_i, planes6[:, :, :, st_i, :, :, None],
                          0.)
            acc = v if acc is None else acc + v
        return acc

    if anchor:
        # lexicographically-first argmin of |dt|+|dh|+|dw| (per-axis
        # first-argmins compose: the additive terms are axis-independent).
        # The per-cell offsets are re-evaluated on the fly per wi (same
        # fp32 ops/order as the aux dh/dw factors — bitwise identical,
        # incl. tie order via strict <) so nothing of size
        # [..,W_t,ws,nH,nW] is ever materialized (725 MB/band at 1080p).
        prep_ = bi["prep"]
        s1c_ = jnp.asarray(bi["cfg"]["stride1"], jnp.float32)
        bh6 = prep_["base_h"]                  # [1,1,1,1,nH,1]
        bw6 = prep_["base_w"]
        offh_f = prep_["off_h"].astype(jnp.float32)
        offw_f = prep_["off_w"].astype(jnp.float32)

        def axis_argmin(ctr, off, base):
            best, arg = None, None
            for wi_ in range(ws):
                d_ = jnp.abs((ctr + s1c_ * (float(wi_) - off)) - base)
                if best is None:
                    best, arg = d_, jnp.zeros_like(d_, jnp.int32)
                else:
                    m_ = d_ < best
                    best = jnp.where(m_, d_, best)
                    arg = jnp.where(m_, wi_, arg)
            return best, arg

        mh, ah = axis_argmin(prep_["ctr_h"], offh_f, bh6)
        mw, aw = axis_argmin(prep_["ctr_w"], offw_f, bw6)
        tot = jnp.abs(dt_tab.astype(jnp.float32)) \
            .reshape(1, 1, Tq, W_t, 1, 1) + mh + mw
        wts = jnp.argmin(tot, axis=3).astype(jnp.int32)  # [B,HD,Tq,nH,nW]
        ah_s = onehot_wt(wts[..., None], ah.astype(jnp.float32)) \
            .astype(jnp.int32)[..., 0]
        aw_s = onehot_wt(wts[..., None], aw.astype(jnp.float32)) \
            .astype(jnp.int32)[..., 0]
        self_idx = (wts * ws + ah_s) * ws + aw_s
        selfidp = self_idx.reshape(BH, Tq, nT, TH, TW)
    else:
        self_idx = None
        selfidp = jnp.zeros((BH, Tq, nT, TH, TW), jnp.int32)

    d_pl, i_pl, s_pl = _topk_op(_freeze(cfg), bool(interpret),
                                *bi["op_args"], outlp, selfidp)

    def untile_k(x):
        """[BH,Tq,nT,ns,TH,TW] -> [B,HD,Tq,nH,nW,ns]."""
        ns = x.shape[3]
        x = jnp.transpose(x, (0, 1, 2, 4, 5, 3))
        return x.reshape(B, HD, Tq, nH, nW, ns)

    d_rest = untile_k(d_pl)
    ids = jax.lax.stop_gradient(untile_k(i_pl))
    if anchor:
        self_d = s_pl.reshape(B, HD, Tq, nH, nW)
        cells = jnp.concatenate(
            [self_idx[..., None],
             jnp.where(ids == self_idx[..., None], 0, ids)], axis=-1)
        dists = jnp.concatenate([self_d[..., None], d_rest], axis=-1)
    else:
        cells = ids
        dists = d_rest

    # ---- offsets of the winners: per-element gathers scalarize on TPU,
    # so select the (ctr, off) factors by dense one-hot over the tiny W_t
    # axis and re-evaluate the offset formula (bitwise-identical to the
    # dh/dw factor values: same ops in the same order) ----
    prep = bi["prep"]
    wt_s = cells // (ws * ws)
    wi = (cells % (ws * ws)) // ws
    wj = cells % ws
    s1c = jnp.asarray(bi["cfg"]["stride1"], jnp.float32)
    ctrh_sel = onehot_wt(wt_s, prep["ctr_h"])
    offh_sel = onehot_wt(wt_s, prep["off_h"].astype(jnp.float32))
    ctrw_sel = onehot_wt(wt_s, prep["ctr_w"])
    offw_sel = onehot_wt(wt_s, prep["off_w"].astype(jnp.float32))
    base_h = prep["base_h"].reshape(1, 1, 1, nH, 1, 1)
    base_w = prep["base_w"].reshape(1, 1, 1, 1, nW, 1)
    i_h = (ctrh_sel + s1c * (wi.astype(jnp.float32) - offh_sel)) - base_h
    i_w = (ctrw_sel + s1c * (wj.astype(jnp.float32) - offw_sel)) - base_w
    dt_b = jnp.broadcast_to(
        dt_tab.astype(jnp.float32).reshape(1, 1, Tq, W_t, 1, 1),
        (B, HD, Tq, W_t, 1, 1))
    i_t = onehot_wt(wt_s, dt_b)
    if aux["cdtype"] == jnp.int32:
        i_h = i_h.astype(jnp.int32)
        i_w = i_w.astype(jnp.int32)
        i_t = i_t.astype(jnp.int32)
    inds = jnp.stack([i_t.astype(i_h.dtype), i_h, i_w], axis=-1)
    if anchor:
        # anchored slot-0 offsets are exact zeros (nn.anchor_self parity)
        inds = jnp.concatenate(
            [jnp.zeros_like(inds[..., :1, :]), inds[..., 1:, :]], axis=-2)
    inds = inds.astype(aux["cdtype"])
    return dists.astype(vid0.dtype), inds, cells, outliers
