"""Fused Pallas TPU kernels for NonLocalScatterAdd and PooledPatchSum.

The reference implements both with one CUDA thread per (query, k) and
atomicAdd into the output video (lib/csrc/agg/scatter_add_kernel.cu:62-140,
pool_int_kernel.cu:60-115). Round-4 measured the jnp `.at[].add` engines
3-7x off the fused gather kernel at the bench config (VERDICT r4 #4);
these kernels close that with the same dense shift-sweep machinery as
ops/agg_pallas.py — zero gathers, zero scatters, deterministic.

ScatterAdd (stride 1, int offsets — the reference rounds flows first):

    out[t+dt, c, x] += w_k(q) * vid[t, c, q + p]   where  x = nl_k(q) + p

With the patch taps folded, for a fixed shift cell z = nl - q:

    out[x] += MsTap_z[x - z] * vid[t, c, x - z]
    MsTap_z[u] = sum_p Ms_z[u - p],   Ms_z = sum_k w_k * D * R_z * C_z

i.e. the gather BACKWARD's value-grad sweep (agg_pallas_bwd.py) with the
ref-local video in place of the stack cotangent: one tap-summed mask
product and one [rows, F, cols] FMA per live cell, accumulated into a
shifted output window that is RMW'd into a padded HBM buffer (sequential
grid -> race-free). Write-side reflection (the reference reflects
nl + p, scatter_add_kernel.cu:121-127) is applied by folding the padded
margins back in afterwards; read-side out-of-frame taps are DROPPED by
the reference (in_bounds(rh)), reproduced by zero-padding the value
video.

The backward is gather-shaped and runs in one kernel:

    g_vid[u]  = sum_z MsTap_z[u] * g_out[u + z]
    g_w_k[q]  = D * R * C * tapsumT( sum_c vid[u, c] * g_out[u + z, c] )

Pool reads like the gather (vid at nl + p, reflect-padded) but emits
per-tap K-summed planes on the ps-upsampled grid:

    P[pa, pb, q] = sum_z Ms_z[q] * vid[t+dt, c, q + z + p]

placed host-side by pure relayout (out[qh*ps + 1 + pa, qw*ps + 1 + pb],
edge-clipped — pool_int_kernel.cu's psHalf shift with ps forced odd).

Cross-checked against ops.agg.nl_scatter_add / nl_pool in
tests/agg/test_agg_sp_pallas.py.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stnls_tpu.ops.geometry import reflect_bounds, num_queries
from stnls_tpu.ops.agg_pallas import (
    FLD, NFLD, agg_geometry, agg_pallas_prep, activity_words,
    n_cell_words, _pack_fields, _corner_masks, _largest_divisor_leq,
)


def sp_pallas_supported(*, ps, stride0, dilation, pt, reflect_bounds_,
                        budget, spread, H, W):
    geo = agg_geometry(ps=ps, dilation=dilation, use_adj=False,
                       budget=budget, spread=spread)
    # scatter pads: value by hh (zero), output by padO = R + hh + 2 —
    # the reflect fold assumes single reflection (padO < H); stride0 > 1
    # rides the stride-1 kernel via pixel-grid field dilation
    return (pt == 1 and reflect_bounds_ and stride0 >= 1
            and geo["R"] + geo["hh"] + 2 <= min(H, W) - 1
            and geo["ZL"] <= 31 and geo["ZLc"] <= 31)


def _pad_value_zero(vid, hh):
    """[B,HD,T,F,H,W] -> rows-major ZERO-padded [BH,T,H+2hh,Fp,Wv]:
    out-of-frame ref-side taps are dropped by the reference
    (scatter_add_kernel.cu in_bounds checks), so reads past the frame
    must contribute zero, not a reflection."""
    B, HD, T, F, H, W = vid.shape
    BH = B * HD
    Fp = -(-F // 8) * 8
    vp = jnp.pad(vid.astype(jnp.float32),
                 ((0, 0),) * 4 + ((hh, hh), (hh, hh))) \
        .reshape(BH, T, F, H + 2 * hh, W + 2 * hh)
    vp = jnp.transpose(vp, (0, 1, 3, 2, 4))
    Wv = -(-(W + 2 * hh) // 128) * 128
    vp = jnp.pad(vp, ((0, 0), (0, 0), (0, 0), (0, Fp - F),
                      (0, Wv - (W + 2 * hh))))
    return vp


def _fold_reflect(acc, pad, H, axis):
    """Fold a zero-based pad margin back under single reflection:
    out[v] += pad_lo[-v], out[H-1-v] += pad_hi[H-1+v] (v >= 1) — the
    write-side mirror of the reference's bounds() (shared_kernel.cu:50-60,
    applied at scatter destinations scatter_add_kernel.cu:121-127)."""
    n = acc.shape[axis]

    def sl(a, b):
        idx = [slice(None)] * acc.ndim
        idx[axis] = slice(a, b)
        return tuple(idx)

    core = acc[sl(pad, n - pad)]
    lo = acc[sl(0, pad)]
    hi = acc[sl(n - pad, n)]
    core = core.at[sl(1, pad + 1)].add(jnp.flip(lo, axis=axis))
    core = core.at[sl(H - 1 - pad, H - 1)].add(jnp.flip(hi, axis=axis))
    return core


# ---------------------------------------------------------------------------
# ScatterAdd forward kernel
# ---------------------------------------------------------------------------

def _tapsum_spread(Ms, taps, hh, THh, Wv):
    """MsTap[u] = sum_p Ms[u - p] over BOTH axes: Ms [TH, W] (the tile's
    own query rows, frame cols) -> [THh, Wv] (tap-spread, hh halo)."""
    TH, W = Ms.shape
    acc = None
    for a in taps:
        ra = hh + a
        v = jnp.pad(Ms, ((ra, THh - TH - ra), (0, 0)))
        acc = v if acc is None else acc + v
    out = None
    for b in taps:
        cb = hh + b
        v = jnp.pad(acc, ((0, 0), (cb, Wv - W - cb)))
        out = v if out is None else out + v
    return out


def _make_scatter_add_fwd_kernel(cfg):
    K, F, TH = cfg["K8"], cfg["F"], cfg["TH"]
    W = cfg["W"]
    ZL, ZLc = cfg["ZL"], cfg["ZLc"]
    taps, hh = cfg["taps"], cfg["hh"]
    W_t = cfg["W_t"]
    zt_vals = cfg["zt_vals"]
    padO = cfg["padO"]
    Wo = cfg["Wo"]
    Wv = cfg["Wv"]
    THh = TH + 2 * hh
    RHs = THh + ZL
    NSC = 3 + W_t
    NW = n_cell_words(ZL, ZLc)
    wtm = (W_t - 1) // 2
    assert tuple(zt_vals) == tuple(range(-wtm, wtm + 1))

    def kernel(scal_ref, v_ref, fld_ref, outz_ref, out_ref,
               vw_ref, fw_ref, gvw_ref, mtw_ref, sem0, sem1, sem2, sem3):
        del outz_ref
        bh = pl.program_id(0)
        t = pl.program_id(1)
        ti = pl.program_id(2)
        oh = scal_ref[bh, t, ti, 1]
        ow = scal_ref[bh, t, ti, 2]

        # fields for the tile rows (+ tap halo, zero there — only the
        # central TH rows are this tile's queries)
        cpf = pltpu.make_async_copy(
            fld_ref.at[bh, t, pl.ds(ti * TH, THh)], fw_ref, sem1)
        cpf.start()
        # ref-frame value rows u in tile +- hh (zero-padded video)
        cpv = pltpu.make_async_copy(
            v_ref.at[bh, t, pl.ds(ti * TH, THh)], vw_ref, sem0)
        cpv.start()
        cpf.wait()
        cpv.wait()

        def fld(name):
            # central TH rows only: halo rows belong to neighbor tiles
            return fw_ref[hh:hh + TH, FLD[name] * K:FLD[name] * K + K, :W]

        def rmw(hbm_at, local_ref, tmp_shape, sa, sb):
            def inner(tmp):
                rd = pltpu.make_async_copy(hbm_at, tmp, sa)
                rd.start()
                rd.wait()
                tmp[...] = tmp[...] + local_ref[...]
                wr = pltpu.make_async_copy(tmp, hbm_at, sb)
                wr.start()
                wr.wait()
            pl.run_scoped(inner, pltpu.VMEM(tmp_shape, jnp.float32))

        vloc = vw_ref[...]                       # [THh, F, Wv]

        def frame_body(s, base, colw):
            tj = scal_ref[bh, t, ti, 3 + s]
            ztv = float(zt_vals[s])
            A = fld("w") * (fld("dt") == ztv).astype(jnp.float32)
            gvw_ref[...] = jnp.zeros_like(gvw_ref)
            roww = scal_ref[bh, t, ti, base + 1]

            def zh_body(zh, _):
                @pl.when((roww >> zh) & 1 != 0)
                def _row():
                    ohf = (oh + zh).astype(jnp.float32)
                    _, _, rsel = _corner_masks(fld("fh"), ohf, None, True)
                    Rf = A * rsel                # [TH, K, W]
                    for zw in range(ZLc):
                        cidx = zh * ZLc + zw

                        def cell_body(zw=zw, cidx=cidx):
                            zwv = (ow + zw).astype(jnp.float32)
                            _, _, csel = _corner_masks(fld("fw"), zwv,
                                                       None, True)
                            Ms = jnp.sum(Rf * csel, axis=1)   # [TH, W]
                            mtw_ref[...] = _tapsum_spread(
                                Ms, taps, hh, THh, Wv)
                            contrib = mtw_ref[...][:, None, :] * vloc
                            cur = gvw_ref[pl.ds(zh, THh), :, zw:zw + Wv]
                            gvw_ref[pl.ds(zh, THh), :, zw:zw + Wv] = \
                                cur + contrib

                        word = scal_ref[bh, t, ti, base + 2 + cidx // 31]
                        pl.when((word >> (cidx % 31)) & 1 != 0)(cell_body)
                return 0

            lax.fori_loop(0, ZL, zh_body, 0)
            # local col j held global out col (padO - hh + ow + j);
            # roll right so col j -> global col j, then RMW full rows
            gvw_ref[...] = pltpu.roll(
                gvw_ref[...], shift=padO - hh + ow, axis=2)
            r0o = padO + ti * TH - hh + oh
            rmw(out_ref.at[bh, tj, pl.ds(r0o, RHs)], gvw_ref,
                (RHs, F, Wo), sem2, sem3)

        for s in range(W_t):
            base = NSC + s * (2 + NW)
            colw = scal_ref[bh, t, ti, base]

            @pl.when(colw != 0)
            def _frame(s=s, base=base, colw=colw):
                frame_body(s, base, colw)

    return kernel, dict(THh=THh, RHs=RHs)


def _scatter_add_fwd_call(cfg, v1p, fldp, scal, interpret):
    BH, T, nT = scal.shape[:3]
    K, F, TH = cfg["K8"], cfg["F"], cfg["TH"]
    kernel, dm = _make_scatter_add_fwd_kernel(cfg)
    # bottom margin past 2*padO: the RMW window [r0o, r0o + RHs) can
    # overhang when a tile's sweep range is mostly dead (all overhang
    # rows carry zeros, but a clamped DMA would shift the whole window)
    outHp = cfg["H"] + 2 * cfg["padO"] + cfg["ZL"] + cfg["R"] + 2
    Wo = cfg["Wo"]
    out_shape = jax.ShapeDtypeStruct((BH, T, outHp, F, Wo), jnp.float32)
    outz = jnp.zeros(out_shape.shape, jnp.float32)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, T, nT),
        in_specs=[any_spec, any_spec, any_spec],
        out_specs=any_spec,
        scratch_shapes=[
            pltpu.VMEM((dm["THh"], F, cfg["Wv"]), jnp.float32),
            pltpu.VMEM((dm["THh"], fldp.shape[3], fldp.shape[-1]),
                       jnp.float32),
            pltpu.VMEM((dm["RHs"], F, Wo), jnp.float32),
            pltpu.VMEM((dm["THh"], cfg["Wv"]), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ])
    # operand indices (scal=0): 1=v1p 2=fldp 3=outz -> aliased to output
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, v1p, fldp, outz)


# ---------------------------------------------------------------------------
# ScatterAdd backward kernel (gather-shaped)
# ---------------------------------------------------------------------------

def _make_scatter_add_bwd_kernel(cfg):
    K, F, TH = cfg["K8"], cfg["F"], cfg["TH"]
    W = cfg["W"]
    ZL, ZLc = cfg["ZL"], cfg["ZLc"]
    taps, hh = cfg["taps"], cfg["hh"]
    W_t = cfg["W_t"]
    zt_vals = cfg["zt_vals"]
    padO = cfg["padO"]
    Wo = cfg["Wo"]
    Wv = cfg["Wv"]
    THh = TH + 2 * hh
    RHs = THh + ZL
    NSC = 3 + W_t
    NW = n_cell_words(ZL, ZLc)
    wtm = (W_t - 1) // 2
    assert tuple(zt_vals) == tuple(range(-wtm, wtm + 1))

    def kernel(scal_ref, g_ref, v_ref, fld_ref, gvz_ref, gfz_ref,
               gv_ref, gf_ref,
               vw_ref, fw_ref, gw_ref, gvw_ref, gfw_ref,
               sem0, sem1, sem2, sem3):
        del gvz_ref, gfz_ref
        bh = pl.program_id(0)
        t = pl.program_id(1)
        ti = pl.program_id(2)
        oh = scal_ref[bh, t, ti, 1]
        ow = scal_ref[bh, t, ti, 2]

        cpf = pltpu.make_async_copy(
            fld_ref.at[bh, t, pl.ds(ti * TH, THh)], fw_ref, sem1)
        cpf.start()
        cpv = pltpu.make_async_copy(
            v_ref.at[bh, t, pl.ds(ti * TH, THh)], vw_ref, sem0)
        cpv.start()
        cpf.wait()
        cpv.wait()
        gvw_ref[...] = jnp.zeros_like(gvw_ref)
        gfw_ref[...] = jnp.zeros_like(gfw_ref)

        def fld(name):
            return fw_ref[hh:hh + TH, FLD[name] * K:FLD[name] * K + K, :W]

        def rmw(hbm_at, local_ref, tmp_shape, sa, sb):
            def inner(tmp):
                rd = pltpu.make_async_copy(hbm_at, tmp, sa)
                rd.start()
                rd.wait()
                tmp[...] = tmp[...] + local_ref[...]
                wr = pltpu.make_async_copy(tmp, hbm_at, sb)
                wr.start()
                wr.wait()
            pl.run_scoped(inner, pltpu.VMEM(tmp_shape, jnp.float32))

        vloc = vw_ref[...]                        # [THh, F, Wv]

        def frame_body(s, base, colw):
            tj = scal_ref[bh, t, ti, 3 + s]
            ztv = float(zt_vals[s])
            D = (fld("dt") == ztv).astype(jnp.float32)
            A = fld("w") * D
            # g_out window of frame tj: out rows [tile - hh + oh + 0..RHs)
            r0o = padO + ti * TH - hh + oh
            cpg = pltpu.make_async_copy(
                g_ref.at[bh, tj, pl.ds(r0o, RHs)], gw_ref, sem2)
            cpg.start()
            cpg.wait()
            # un-apply the global col origin: local col j = global
            # (padO - hh + ow + j), same frame as the fwd wrote
            gw_ref[...] = pltpu.roll(
                gw_ref[...], shift=-(padO - hh + ow), axis=2)
            roww = scal_ref[bh, t, ti, base + 1]

            def zh_body(zh, _):
                @pl.when((roww >> zh) & 1 != 0)
                def _row():
                    ohf = (oh + zh).astype(jnp.float32)
                    _, _, rsel = _corner_masks(fld("fh"), ohf, None, True)
                    Rf = A * rsel
                    for zw in range(ZLc):
                        cidx = zh * ZLc + zw

                        def cell_body(zw=zw, cidx=cidx):
                            zwv = (ow + zw).astype(jnp.float32)
                            _, _, csel = _corner_masks(fld("fw"), zwv,
                                                       None, True)
                            Ms = jnp.sum(Rf * csel, axis=1)   # [TH, W]
                            mt = _tapsum_spread(Ms, taps, hh, THh, Wv)
                            gsh = gw_ref[pl.ds(zh, THh), :, zw:zw + Wv]
                            # g_vid[u] += MsTap[u] * g_out[u + z]
                            gvw_ref[...] += mt[:, None, :] * gsh
                            # g_w: per-k mask * tapsumT(sum_c v * g_out)
                            G = jnp.sum(vloc * gsh, axis=1)   # [THh, Wv]
                            # gM[q] = sum_p G[q + p] on the central
                            # TH rows / W cols (separable)
                            cs = None
                            for b in taps:
                                cb = hh + b
                                vv = G[:, cb:cb + W]
                                cs = vv if cs is None else cs + vv
                            gM = None
                            for a in taps:
                                ra = hh + a
                                v = cs[ra:ra + TH, :]
                                gM = v if gM is None else gM + v
                            gfw_ref[hh:hh + TH,
                                    FLD["w"] * K:FLD["w"] * K + K, :W] += \
                                D * rsel * csel * gM[:, None, :]

                        word = scal_ref[bh, t, ti, base + 2 + cidx // 31]
                        pl.when((word >> (cidx % 31)) & 1 != 0)(cell_body)
                return 0

            lax.fori_loop(0, ZL, zh_body, 0)

        for s in range(W_t):
            base = NSC + s * (2 + NW)
            colw = scal_ref[bh, t, ti, base]

            @pl.when(colw != 0)
            def _frame(s=s, base=base, colw=colw):
                frame_body(s, base, colw)

        rmw(gv_ref.at[bh, t, pl.ds(ti * TH, THh)], gvw_ref,
            (THh, F, Wv), sem2, sem3)
        rmw(gf_ref.at[bh, t, pl.ds(ti * TH, THh)], gfw_ref,
            (THh, gfw_ref.shape[1], gfw_ref.shape[-1]), sem2, sem3)

    return kernel, dict(THh=THh, RHs=RHs)


def _scatter_add_bwd_call(cfg, g_pad, v1p, fldp, scal, interpret):
    BH, T, nT = scal.shape[:3]
    K, F, TH = cfg["K8"], cfg["F"], cfg["TH"]
    kernel, dm = _make_scatter_add_bwd_kernel(cfg)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, T, nT),
        in_specs=[any_spec, any_spec, any_spec, any_spec, any_spec],
        out_specs=(any_spec, any_spec),
        scratch_shapes=[
            pltpu.VMEM((dm["THh"], F, cfg["Wv"]), jnp.float32),
            pltpu.VMEM((dm["THh"], fldp.shape[3], fldp.shape[-1]),
                       jnp.float32),
            pltpu.VMEM((dm["RHs"], F, cfg["Wo"]), jnp.float32),
            pltpu.VMEM((dm["THh"], F, cfg["Wv"]), jnp.float32),
            pltpu.VMEM((dm["THh"], fldp.shape[3], fldp.shape[-1]),
                       jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ])
    out_shape = (jax.ShapeDtypeStruct(v1p.shape, jnp.float32),
                 jax.ShapeDtypeStruct(fldp.shape, jnp.float32))
    gv_zero = jnp.zeros(v1p.shape, jnp.float32)
    gf_zero = jnp.zeros(fldp.shape, jnp.float32)
    # operand indices (scal=0): 1=g 2=v1p 3=fldp 4=gv_zero 5=gf_zero
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, g_pad, v1p, fldp, gv_zero, gf_zero)


# ---------------------------------------------------------------------------
# wrapper + custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sadd_op(cfg, interpret, v1p, fldp, scal):
    return _scatter_add_fwd_call(cfg.d, v1p, fldp, scal, interpret)


def _sadd_fwd(cfg, interpret, v1p, fldp, scal):
    out = _scatter_add_fwd_call(cfg.d, v1p, fldp, scal, interpret)
    return out, (v1p, fldp, scal)


def _sadd_bwd(cfg, interpret, res, g):
    v1p, fldp, scal = res
    # the padded-out cotangent must carry the reflect-fold transpose:
    # handled by the caller (fold is outside this op), so g is already
    # the padded-buffer cotangent here
    g_v1p, g_fldp = _scatter_add_bwd_call(cfg.d, g.astype(jnp.float32),
                                          v1p, fldp, scal, interpret)
    return g_v1p, g_fldp, None


_sadd_op.defvjp(_sadd_fwd, _sadd_bwd)


class _Frozen:
    def __init__(self, d):
        self.d = dict(d)
        self._key = tuple(sorted(
            (k, tuple(v) if isinstance(v, (list, tuple)) else v)
            for k, v in self.d.items()))

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _Frozen) and self._key == other._key

    def __getitem__(self, k):
        return self.d[k]


def nl_scatter_add_pallas(vid, weights, flows, *, ps, stride0=1,
                          dilation=1,
                          reflect_bounds_=True, use_adj=False,
                          budget=16, spread=16, wt_hint=None, tile=None,
                          interpret=None):
    """NonLocalScatterAdd via the fused kernel (strideIn = strideOut =
    stride0, pt = 1, int offsets; stride0 > 1 rides the stride-1 kernel
    via pixel-grid field dilation like nl_gather_stack_pallas). Returns
    (out [B,HD,T,F,H,W] UNNORMALIZED like the reference
    (scatter_add.py:105-107), outliers [B,HD,K,T,...])."""
    B, HD, T, F, H, W = vid.shape
    assert sp_pallas_supported(ps=ps, stride0=stride0, dilation=dilation,
                               pt=1,
                               reflect_bounds_=reflect_bounds_,
                               budget=budget, spread=spread, H=H, W=W)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # int path: the reference rounds flows before scattering
    flows = jnp.round(flows) if jnp.issubdtype(flows.dtype, jnp.floating) \
        else flows
    if stride0 > 1:
        nH_, nW_ = num_queries(H, W, stride0)
        assert stride0 * nH_ == H and stride0 * nW_ == W
        K_ = flows.shape[-2]
        assert weights.shape[3] == nH_ and weights.shape[4] == nW_
        wpix = jnp.zeros((B, HD, T, H, W, K_), weights.dtype)
        wpix = wpix.at[:, :, :, ::stride0, ::stride0].set(weights)
        fpix = jnp.repeat(jnp.repeat(flows, stride0, axis=3), stride0,
                          axis=4)[:, :, :, :H, :W]
        weights, flows = wpix, fpix
    prep = agg_pallas_prep(vid.shape, weights, flows, ps=ps, stride0=1,
                           dilation=dilation, use_adj=use_adj,
                           itype="int", budget=budget, spread=spread,
                           wt_hint=wt_hint, tile=tile)
    geo = prep["geo"]
    K, TH, nT, BH = prep["K"], prep["TH"], prep["nT"], prep["BH"]
    hh, R = geo["hh"], geo["R"]
    wtm = min(T - 1, T - 1 if wt_hint is None else int(wt_hint))
    zt_vals = list(range(-wtm, wtm + 1))
    W_t = len(zt_vals)

    fldp = _pack_fields(prep)
    v1p = _pad_value_zero(vid, hh)
    Fp = v1p.shape[3]
    Wv = v1p.shape[-1]
    padO = R + hh + 2
    # Wo must hold BOTH the padded output width and the kernel's pre-roll
    # local extent (ZLc + Wv; the roll is cyclic over Wo)
    Wo = -(-max(W + 2 * padO, geo["ZLc"] + Wv) // 128) * 128

    ty0 = (jnp.arange(nT, dtype=jnp.int32) * TH)[None, None, :]
    oh = prep["oh"].reshape(BH, T, nT)
    ow = prep["ow"].reshape(BH, T, nT)
    r0 = jnp.zeros_like(oh)       # unused by these kernels (kept for
    #                               scal layout parity with agg_pallas)
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    tjs = [jnp.broadcast_to(jnp.clip(t_idx + z, 0, T - 1), r0.shape)
           for z in zt_vals]
    scal = jnp.stack([r0, oh, ow] + tjs, axis=-1).astype(jnp.int32)
    words = activity_words(prep, zt_vals)
    scal = jnp.concatenate([scal, words], axis=-1)

    K8 = -(-K // 8) * 8
    cfg = dict(geo, K=K, K8=K8, F=Fp, TH=TH, W=W, H=H, W_t=W_t,
               zt_vals=tuple(zt_vals), is_int=True, padO=padO, Wo=Wo,
               Wv=Wv)

    outp = _sadd_op(_Frozen(cfg), bool(interpret), v1p, fldp, scal)

    # fold the reflected write margins back (rows then cols), crop
    # (drop the zero-only bottom RMW-overhang margin first)
    out = _fold_reflect(outp[:, :, :H + 2 * padO], padO, H, axis=2)
    out = _fold_reflect(out[..., :W + 2 * padO], padO, W, axis=4)
    out = out.reshape(B, HD, T, H, Fp, W)[:, :, :, :, :F]
    out = jnp.transpose(out, (0, 1, 2, 4, 3, 5))
    return out.astype(vid.dtype), prep["outliers"]


def scatter_add_counts(flows, *, T, nH, nW, H, W, outH, outW, ps,
                       strideIn, strideOut, dilation, use_adj,
                       reflect_bounds_=True, pt=1):
    """Reference counts quirk (scatter_add_kernel.cu:110-112): histogram
    of scatter destinations over b=0, hd=0, query frame 0, all k."""
    from stnls_tpu.ops.agg import (_km_inputs, _km_centers, in_bounds,
                                   default_out_size)
    B, HD = flows.shape[0], flows.shape[1]
    K = flows.shape[-2]
    if jnp.issubdtype(flows.dtype, jnp.floating):
        flows = jnp.round(flows)
    flows = flows.astype(jnp.int32)
    f_km = jnp.transpose(
        flows.reshape(B, HD, T, nH, nW, K, 3), (0, 1, 5, 2, 3, 4, 6))
    finite = (jnp.abs(f_km[..., 1]) < 1e7) & (jnp.abs(f_km[..., 2]) < 1e7)
    patch_offset = 0 if use_adj else -(ps // 2)
    ref_t = jnp.arange(T, dtype=jnp.int32)
    out_h = jnp.arange(nH, dtype=jnp.int32) * strideOut
    out_w = jnp.arange(nW, dtype=jnp.int32) * strideOut
    in_h = jnp.arange(nH, dtype=jnp.int32) * strideIn
    in_w = jnp.arange(nW, dtype=jnp.int32) * strideIn
    nl_t, nl_h, nl_w = _km_centers(f_km, ref_t, out_h, out_w, T,
                                   outH, outW, True)
    t_g = ref_t[None, None, None, :, None, None]
    h_g = in_h[None, None, None, None, :, None]
    w_g = in_w[None, None, None, None, None, :]
    cnt = jnp.zeros(outH * outW + 1, jnp.float32)
    nt0 = reflect_bounds(nl_t, T) if reflect_bounds_ else nl_t
    tok = in_bounds(t_g, T) & in_bounds(nt0, T)
    for pi in range(ps):
        dHp = dilation * (pi + patch_offset)
        rh = h_g + dHp
        sh = nl_h + dHp
        if reflect_bounds_:
            sh = reflect_bounds(sh, outH)
        for pj in range(ps):
            dWp = dilation * (pj + patch_offset)
            rw = w_g + dWp
            sw = nl_w + dWp
            if reflect_bounds_:
                sw = reflect_bounds(sw, outW)
            ok = (finite & in_bounds(rh, H) & in_bounds(rw, W)
                  & in_bounds(sh, outH) & in_bounds(sw, outW) & tok)
            cidx = (jnp.clip(sh, 0, outH - 1) * outW
                    + jnp.clip(sw, 0, outW - 1))
            cidx = jnp.broadcast_to(cidx, finite.shape)
            okb = jnp.broadcast_to(ok, cidx.shape)
            cidx0 = jnp.where(okb[0, 0, :, 0], cidx[0, 0, :, 0],
                              outH * outW)
            cnt = cnt.at[cidx0.reshape(-1)].add(1.)
    return cnt[:-1].reshape(outH, outW)


# ---------------------------------------------------------------------------
# PooledPatchSum kernels (stride0 == 1; ps forced odd like the reference)
# ---------------------------------------------------------------------------

def pool_pallas_supported(*, ps, stride0, dilation, pt, reflect_bounds_,
                          budget, spread, H, W, F):
    ps = ps + (1 - ps % 2)
    geo = agg_geometry(ps=ps, dilation=dilation, use_adj=False,
                       budget=budget, spread=spread)
    Fp = -(-F // 8) * 8
    TWp = -(-W // 128) * 128
    vmem_out = 8 * ps * ps * Fp * TWp * 4
    return (pt == 1 and reflect_bounds_ and stride0 == 1
            and geo["padS"] <= min(H, W) - 1
            and geo["ZL"] <= 31 and geo["ZLc"] <= 31
            and vmem_out <= (24 << 20))


def _make_pool_fwd_kernel(cfg):
    K, F, TH, TWp = cfg["K8"], cfg["F"], cfg["TH"], cfg["TWp"]
    W = cfg["W"]
    ZL, ZLc = cfg["ZL"], cfg["ZLc"]
    taps, hh, padS = cfg["taps"], cfg["hh"], cfg["padS"]
    ps = cfg["ps_odd"]
    W_t = cfg["W_t"]
    zt_vals = cfg["zt_vals"]
    THh = TH + 2 * hh
    RHp = TH + ZL + 2 * hh
    c0 = padS
    NSC = 3 + W_t
    NW = n_cell_words(ZL, ZLc)
    wtm = (W_t - 1) // 2
    assert tuple(zt_vals) == tuple(range(-wtm, wtm + 1))
    PSQ = ps * ps

    def kernel(scal_ref, v_ref, fld_ref, out_ref, vw_ref, fw_ref,
               sem0, sem1):
        bh = pl.program_id(0)
        t = pl.program_id(1)
        ti = pl.program_id(2)
        r0 = scal_ref[bh, t, ti, 0]          # padS + ti*TH + oh
        oh = scal_ref[bh, t, ti, 1]
        ow = scal_ref[bh, t, ti, 2]

        cpf = pltpu.make_async_copy(
            fld_ref.at[bh, t, pl.ds(ti * TH, THh)], fw_ref, sem1)
        cpf.start()
        out_ref[...] = jnp.zeros_like(out_ref)
        cpf.wait()

        def fld(name):
            # central TH rows: this tile's queries (halo rows belong to
            # neighbor tiles)
            return fw_ref[hh:hh + TH, FLD[name] * K:FLD[name] * K + K, :]

        def frame_body(s, base, colw):
            tj = scal_ref[bh, t, ti, 3 + s]
            # value rows [q + oh + zh + pa]: window starts hh rows above
            # the gather window (r0 already carries oh)
            cpv = pltpu.make_async_copy(
                v_ref.at[bh, tj, pl.ds(r0 - hh, RHp)], vw_ref, sem0)
            cpv.start()
            ztv = float(zt_vals[s])
            A = fld("w") * (fld("dt") == ztv).astype(jnp.float32)
            cpv.wait()
            vw_ref[...] = pltpu.roll(vw_ref[...], shift=-ow, axis=2)
            roww = scal_ref[bh, t, ti, base + 1]

            def zh_body(zh, _):
                @pl.when((roww >> zh) & 1 != 0)
                def _row():
                    ohf = (oh + zh).astype(jnp.float32)
                    _, _, rsel = _corner_masks(fld("fh"), ohf, None, True)
                    Rf = A * rsel
                    for zw in range(ZLc):
                        cidx = zh * ZLc + zw

                        def cell_body(zw=zw, cidx=cidx):
                            zwv = (ow + zw).astype(jnp.float32)
                            _, _, csel = _corner_masks(fld("fw"), zwv,
                                                       None, True)
                            Ms = jnp.sum(Rf * csel, axis=1)[:, :TWp]
                            for pi, pa in enumerate(taps):
                                vz = vw_ref[pl.ds(zh + pa + hh, TH)]
                                for pj, pb in enumerate(taps):
                                    vt = vz[:, :, c0 + zw + pb:
                                            c0 + zw + pb + TWp]
                                    pidx = pi * ps + pj
                                    out_ref[0, 0, 0, :,
                                            pidx * F:(pidx + 1) * F, :] \
                                        += Ms[:, None, :] * vt

                        word = scal_ref[bh, t, ti, base + 2 + cidx // 31]
                        pl.when((word >> (cidx % 31)) & 1 != 0)(cell_body)
                return 0

            lax.fori_loop(0, ZL, zh_body, 0)

        for s in range(W_t):
            base = NSC + s * (2 + NW)
            colw = scal_ref[bh, t, ti, base]

            @pl.when(colw != 0)
            def _frame(s=s, base=base, colw=colw):
                frame_body(s, base, colw)

    return kernel, dict(THh=THh, RHp=RHp, PSQ=PSQ)


def _pool_fwd_call(cfg, v1p, fldp, scal, interpret):
    BH, T, nT = scal.shape[:3]
    K, F, TH, TWp = cfg["K8"], cfg["F"], cfg["TH"], cfg["TWp"]
    kernel, dm = _make_pool_fwd_kernel(cfg)
    PSQ = dm["PSQ"]
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, T, nT),
        in_specs=[any_spec, any_spec],
        out_specs=pl.BlockSpec(
            (1, 1, 1, TH, PSQ * F, TWp),
            lambda bh, t, ti, *_: (bh, t, ti, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((dm["RHp"], F, v1p.shape[-1]), jnp.float32),
            pltpu.VMEM((dm["THh"], fldp.shape[3], fldp.shape[-1]),
                       jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ])
    out_shape = jax.ShapeDtypeStruct((BH, T, nT, TH, PSQ * F, TWp),
                                     jnp.float32)
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret)(scal, v1p, fldp)


def _make_pool_bwd_kernel(cfg):
    K, F, TH, TWp = cfg["K8"], cfg["F"], cfg["TH"], cfg["TWp"]
    W = cfg["W"]
    ZL, ZLc = cfg["ZL"], cfg["ZLc"]
    taps, hh, padS = cfg["taps"], cfg["hh"], cfg["padS"]
    ps = cfg["ps_odd"]
    W_t = cfg["W_t"]
    zt_vals = cfg["zt_vals"]
    THh = TH + 2 * hh
    RHp = TH + ZL + 2 * hh
    c0 = padS
    NSC = 3 + W_t
    NW = n_cell_words(ZL, ZLc)
    wtm = (W_t - 1) // 2
    PSQ = ps * ps

    def kernel(scal_ref, g_ref, v_ref, fld_ref, gvz_ref, gfz_ref,
               gv_ref, gf_ref, vw_ref, fw_ref, gvw_ref, gfw_ref,
               sem0, sem1, sem2, sem3):
        del gvz_ref, gfz_ref
        bh = pl.program_id(0)
        t = pl.program_id(1)
        ti = pl.program_id(2)
        r0 = scal_ref[bh, t, ti, 0]
        oh = scal_ref[bh, t, ti, 1]
        ow = scal_ref[bh, t, ti, 2]

        cpf = pltpu.make_async_copy(
            fld_ref.at[bh, t, pl.ds(ti * TH, THh)], fw_ref, sem1)
        cpf.start()
        gfw_ref[...] = jnp.zeros_like(gfw_ref)
        cpf.wait()

        def fld(name):
            return fw_ref[hh:hh + TH, FLD[name] * K:FLD[name] * K + K, :]

        def rmw(hbm_at, local_ref, tmp_shape, sa, sb):
            def inner(tmp):
                rd = pltpu.make_async_copy(hbm_at, tmp, sa)
                rd.start()
                rd.wait()
                tmp[...] = tmp[...] + local_ref[...]
                wr = pltpu.make_async_copy(tmp, hbm_at, sb)
                wr.start()
                wr.wait()
            pl.run_scoped(inner, pltpu.VMEM(tmp_shape, jnp.float32))

        gall = g_ref[0, 0, 0]                   # [TH, PSQ*F, TWp]

        def frame_body(s, base, colw):
            tj = scal_ref[bh, t, ti, 3 + s]
            cpv = pltpu.make_async_copy(
                v_ref.at[bh, tj, pl.ds(r0 - hh, RHp)], vw_ref, sem0)
            cpv.start()
            ztv = float(zt_vals[s])
            D = (fld("dt") == ztv).astype(jnp.float32)
            A = fld("w") * D
            cpv.wait()
            vw_ref[...] = pltpu.roll(vw_ref[...], shift=-ow, axis=2)
            gvw_ref[...] = jnp.zeros_like(gvw_ref)
            roww = scal_ref[bh, t, ti, base + 1]

            def zh_body(zh, _):
                @pl.when((roww >> zh) & 1 != 0)
                def _row():
                    ohf = (oh + zh).astype(jnp.float32)
                    _, _, rsel = _corner_masks(fld("fh"), ohf, None, True)
                    Rf = A * rsel
                    for zw in range(ZLc):
                        cidx = zh * ZLc + zw

                        def cell_body(zw=zw, cidx=cidx):
                            zwv = (ow + zw).astype(jnp.float32)
                            _, _, csel = _corner_masks(fld("fw"), zwv,
                                                       None, True)
                            Ms = jnp.sum(Rf * csel, axis=1)[:, :TWp]
                            Mk = (D * rsel * csel)[:, :, :TWp]
                            gMsum = None
                            for pi, pa in enumerate(taps):
                                for pj, pb in enumerate(taps):
                                    pidx = pi * ps + pj
                                    gt = gall[:, pidx * F:(pidx + 1) * F,
                                              :]
                                    # g_vid[q + z + p] += Ms * g_tap
                                    cs = c0 + zw + pb
                                    cur = gvw_ref[pl.ds(zh + pa + hh, TH),
                                                  :, cs:cs + TWp]
                                    gvw_ref[pl.ds(zh + pa + hh, TH), :,
                                            cs:cs + TWp] = \
                                        cur + Ms[:, None, :] * gt
                                    # g_w term: sum_c v[q+z+p] * g_tap
                                    vz = vw_ref[pl.ds(zh + pa + hh, TH)]
                                    vt = vz[:, :, cs:cs + TWp]
                                    gm = jnp.sum(vt * gt, axis=1)
                                    gMsum = gm if gMsum is None \
                                        else gMsum + gm
                            gfw_ref[hh:hh + TH,
                                    FLD["w"] * K:FLD["w"] * K + K,
                                    :TWp] += Mk * gMsum[:, None, :]

                        word = scal_ref[bh, t, ti, base + 2 + cidx // 31]
                        pl.when((word >> (cidx % 31)) & 1 != 0)(cell_body)
                return 0

            lax.fori_loop(0, ZL, zh_body, 0)
            gvw_ref[...] = pltpu.roll(gvw_ref[...], shift=ow, axis=2)
            rmw(gv_ref.at[bh, tj, pl.ds(r0 - hh, RHp)], gvw_ref,
                (RHp, F, vw_ref.shape[-1]), sem2, sem3)

        for s in range(W_t):
            base = NSC + s * (2 + NW)
            colw = scal_ref[bh, t, ti, base]

            @pl.when(colw != 0)
            def _frame(s=s, base=base, colw=colw):
                frame_body(s, base, colw)

        rmw(gf_ref.at[bh, t, pl.ds(ti * TH, THh)], gfw_ref,
            (THh, gfw_ref.shape[1], gfw_ref.shape[-1]), sem2, sem3)

    return kernel, dict(THh=THh, RHp=RHp, PSQ=PSQ)


def _pool_bwd_call(cfg, g, v1p, fldp, scal, interpret):
    BH, T, nT = scal.shape[:3]
    K, F, TH, TWp = cfg["K8"], cfg["F"], cfg["TH"], cfg["TWp"]
    kernel, dm = _make_pool_bwd_kernel(cfg)
    PSQ = dm["PSQ"]
    gspec = pl.BlockSpec((1, 1, 1, TH, PSQ * F, TWp),
                         lambda bh, t, ti, *_: (bh, t, ti, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, T, nT),
        in_specs=[gspec, any_spec, any_spec, any_spec, any_spec],
        out_specs=(any_spec, any_spec),
        scratch_shapes=[
            pltpu.VMEM((dm["RHp"], F, v1p.shape[-1]), jnp.float32),
            pltpu.VMEM((dm["THh"], fldp.shape[3], fldp.shape[-1]),
                       jnp.float32),
            pltpu.VMEM((dm["RHp"], F, v1p.shape[-1]), jnp.float32),
            pltpu.VMEM((dm["THh"], fldp.shape[3], fldp.shape[-1]),
                       jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ])
    out_shape = (jax.ShapeDtypeStruct(v1p.shape, jnp.float32),
                 jax.ShapeDtypeStruct(fldp.shape, jnp.float32))
    gv_zero = jnp.zeros(v1p.shape, jnp.float32)
    gf_zero = jnp.zeros(fldp.shape, jnp.float32)
    # operand indices (scal=0): 1=g 2=v1p 3=fldp 4=gv_zero 5=gf_zero
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret)(scal, g.astype(jnp.float32), v1p, fldp,
                             gv_zero, gf_zero)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _pool_op(cfg, interpret, v1p, fldp, scal):
    return _pool_fwd_call(cfg.d, v1p, fldp, scal, interpret)


def _pool_fwd(cfg, interpret, v1p, fldp, scal):
    out = _pool_fwd_call(cfg.d, v1p, fldp, scal, interpret)
    return out, (v1p, fldp, scal)


def _pool_bwd(cfg, interpret, res, g):
    v1p, fldp, scal = res
    g_v1p, g_fldp = _pool_bwd_call(cfg.d, g, v1p, fldp, scal, interpret)
    return g_v1p, g_fldp, None


_pool_op.defvjp(_pool_fwd, _pool_bwd)


def nl_pool_pallas(vid, weights, flows, *, ps, dilation=1,
                   reflect_bounds_=True, use_adj=False, budget=16,
                   spread=16, wt_hint=None, tile=None, interpret=None):
    """PooledPatchSum via the fused kernel (stride0 = 1, pt = 1, int
    offsets, ps forced odd like the reference pool.py:92). Returns
    (out [B,HD,T,F,ps*H,ps*W] count-normalized, outliers)."""
    B, HD, T, F, H, W = vid.shape
    ps = ps + (1 - ps % 2)
    assert pool_pallas_supported(ps=ps, stride0=1, dilation=dilation,
                                 pt=1, reflect_bounds_=reflect_bounds_,
                                 budget=budget, spread=spread, H=H, W=W,
                                 F=F)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    flows = jnp.round(flows) if jnp.issubdtype(flows.dtype, jnp.floating) \
        else flows
    # the reference skips weights below 1e-8 (pool_int_kernel.cu:95)
    weights = jnp.where(weights < 1e-8, 0., weights)
    prep = agg_pallas_prep(vid.shape, weights, flows, ps=ps, stride0=1,
                           dilation=dilation, use_adj=use_adj,
                           itype="int", budget=budget, spread=spread,
                           wt_hint=wt_hint, tile=tile)
    geo = prep["geo"]
    K, TH, nT, BH = prep["K"], prep["TH"], prep["nT"], prep["BH"]
    wtm = min(T - 1, T - 1 if wt_hint is None else int(wt_hint))
    zt_vals = list(range(-wtm, wtm + 1))
    W_t = len(zt_vals)

    fldp = _pack_fields(prep)
    from stnls_tpu.ops.agg_pallas import _pad_value
    v1p = _pad_value(vid, geo["padS"])
    Fp = v1p.shape[3]
    TWp = -(-W // 128) * 128

    ty0 = (jnp.arange(nT, dtype=jnp.int32) * TH)[None, None, :]
    oh = prep["oh"].reshape(BH, T, nT)
    ow = prep["ow"].reshape(BH, T, nT)
    r0 = geo["padS"] + ty0 + oh
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    tjs = [jnp.broadcast_to(jnp.clip(t_idx + z, 0, T - 1), r0.shape)
           for z in zt_vals]
    scal = jnp.stack([r0, oh, ow] + tjs, axis=-1).astype(jnp.int32)
    words = activity_words(prep, zt_vals)
    scal = jnp.concatenate([scal, words], axis=-1)

    K8 = -(-K // 8) * 8
    cfg = dict(geo, K=K, K8=K8, F=Fp, TH=TH, TWp=TWp, W=W, H=H, W_t=W_t,
               zt_vals=tuple(zt_vals), is_int=True, ps_odd=ps)

    out_t = _pool_op(_Frozen(cfg), bool(interpret), v1p, fldp, scal)

    # [BH,T,nT,TH,PSQ*F,TWp] -> interleave (q, tap) -> ps-upsampled grid
    outH, outW = ps * H, ps * W
    o = out_t.reshape(BH, T, nT, TH, ps, ps, Fp, TWp)[..., :F, :W]
    o = jnp.transpose(o, (0, 1, 6, 2, 3, 4, 7, 5))  # [BH,T,F,nT,TH,pa,W,pb]
    o = o.reshape(BH, T, F, H * ps, W * ps)
    # write position is q*ps + 1 + tap (psHalf + patch_offset = 1 for odd
    # ps): shift the interleave by one, clipping the last position; row 0
    # and col 0 are never written (pool_int_kernel.cu via
    # _valid_ref_slices)
    out = jnp.zeros((BH, T, F, outH, outW), jnp.float32)
    out = out.at[:, :, :, 1:, 1:].set(o[:, :, :, :outH - 1, :outW - 1])
    out = out.reshape(B, HD, T, F, outH, outW)
    counts = np.ones((outH, outW), np.float32)
    counts[0, :] = 0.
    counts[:, 0] = 0.
    out = out / jnp.asarray(counts + 1e-10)
    return out.astype(vid.dtype), prep["outliers"]
