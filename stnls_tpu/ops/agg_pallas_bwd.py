"""Backward Pallas kernel for the fused NonLocalGather (ops/agg_pallas.py).

Given the stack cotangent g [.., TH, K*F, TWp], emits grads to the padded
value video and to the packed query fields (w, th, tw — fh/fw/dt are
non-differentiable floors/ints). Structure mirrors the forward's dense
shift sweep; every term is a dense product, so the transpose is the same
sweep with roles swapped:

  g_v[x+z]   += Mtap_z[x] * g[k,x]          (RMW row window per frame)
  gM_z[q]     = tapsumT( sum_c g[k,x,c] * v[x+z,c] )
  g_w        += D * Rsel * Csel * gM
  g_th       += A * (r1 - r0) * Csel * gM   (bilinear corner chain rule,
  g_tw       += A * Rsel * (c1 - c0) * gM    cf. gather_bilin2d bwd)

The TPU Pallas grid executes sequentially, so the read-modify-write HBM
accumulation into g_v / g_fld (overlapping tile halos, shared frames) is
race-free — the deterministic replacement for the reference's atomicAdd
grad path (lib/csrc/agg/gather_int.cu).
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stnls_tpu.ops.agg_pallas import (
    FLD, _tapsum_fwd, _tapsum_bwd, _corner_masks, n_cell_words,
)


def _make_bwd_kernel(cfg):
    K, F, TH, TWp = cfg["K8"], cfg["F"], cfg["TH"], cfg["TWp"]
    ZL, ZLc, R = cfg["ZL"], cfg["ZLc"], cfg["R"]
    taps, hh, padS = cfg["taps"], cfg["hh"], cfg["padS"]
    W_t = cfg["W_t"]
    zt_vals = cfg["zt_vals"]
    is_int = cfg["is_int"]
    RH = TH + ZL
    THh = TH + 2 * hh
    c0 = padS
    NSC = 3 + W_t                 # base of the activity words in scal
    NW = n_cell_words(ZL, ZLc)
    fori_zw = cfg.get("fori", "") in ("zw", "szw")
    fori_s = cfg.get("fori", "") == "szw"
    wtm = (W_t - 1) // 2
    assert tuple(zt_vals) == tuple(range(-wtm, wtm + 1))

    def kernel(scal_ref, g_ref, v_ref, fld_ref, gvz_ref, gfz_ref,
               gv_ref, gf_ref,
               vw_ref, fw_ref, gvw_ref, gfw_ref, csw_ref,
               sem0, sem1, sem2, sem3):
        del gvz_ref, gfz_ref
        bh = pl.program_id(0)
        t = pl.program_id(1)
        ti = pl.program_id(2)
        r0 = scal_ref[bh, t, ti, 0]
        oh = scal_ref[bh, t, ti, 1]
        ow = scal_ref[bh, t, ti, 2]   # per-tile column origin (lane roll)

        cpf = pltpu.make_async_copy(
            fld_ref.at[bh, t, pl.ds(ti * TH, THh)], fw_ref, sem1)
        cpf.start()
        gfw_ref[...] = jnp.zeros_like(gfw_ref)
        cpf.wait()

        def fld(name):
            """All-K8 field slab [THh, K8, Wp] (sublane-aligned)."""
            return fw_ref[:, FLD[name] * K:FLD[name] * K + K, :]

        def csw_slab(j):
            # ref view (readable and writable in both loop modes)
            return csw_ref.at[:, pl.ds(j * K, K), :]

        def loop_zw(body):
            if fori_zw:
                lax.fori_loop(0, ZLc, lambda zw, _: (body(zw), 0)[1], 0)
            else:
                for zw in range(ZLc):
                    body(zw)

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

        def frame_body(s, base, colw):
            tj = scal_ref[bh, t, ti, 3 + s]
            cpv = pltpu.make_async_copy(
                v_ref.at[bh, tj, pl.ds(r0, RH)], vw_ref, sem0)
            cpv.start()
            ztv = ((s - wtm).astype(jnp.float32) if fori_s
                   else float(zt_vals[s]))
            D = (fld("dt") == ztv).astype(jnp.float32)
            A = fld("w") * D                       # [THh, K, Wp]
            cpv.wait()
            # column rebase (see fwd kernel)
            vw_ref[...] = pltpu.roll(vw_ref[...], shift=-ow, axis=2)
            gvw_ref[...] = jnp.zeros_like(gvw_ref)
            gall = g_ref[0, 0, 0].reshape(TH, K, F, TWp)

            # hoisted per-column corner masks (zh-independent):
            # slabs [csel | c0m | c1m] at zw*K, (ZLc+zw)*K, (2ZLc+zw)*K
            tw = None if is_int else fld("tw")

            def cs_body(zw):
                @pl.when((colw >> zw) & 1 != 0)
                def _cs():
                    zwv = (ow + zw).astype(jnp.float32)
                    c0m, c1m, csel = _corner_masks(fld("fw"), zwv,
                                                   tw, is_int)
                    csw_slab(zw)[...] = csel
                    csw_slab(ZLc + zw)[...] = c0m
                    csw_slab(2 * ZLc + zw)[...] = c1m

            loop_zw(cs_body)
            roww = scal_ref[bh, t, ti, base + 1]

            def zh_body(zh, _):
                @pl.when((roww >> zh) & 1 != 0)
                def _row():
                    ohf = (oh + zh).astype(jnp.float32)
                    vrows = vw_ref[pl.ds(zh, TH)]  # [TH, F, RW]
                    th = None if is_int else fld("th")
                    r0m, r1m, rsel = _corner_masks(fld("fh"), ohf,
                                                   th, is_int)
                    Rf = A * rsel

                    def cell_body(zw):
                        cidx = zh * ZLc + zw
                        word = scal_ref[bh, t, ti, base + 2 + cidx // 31]

                        @pl.when((word >> (cidx % 31)) & 1 != 0)
                        def _bwd_cell():
                            csel = csw_slab(zw)[...]
                            c0m = csw_slab(ZLc + zw)[...]
                            c1m = csw_slab(2 * ZLc + zw)[...]
                            M = Rf * csel
                            Mt = _tapsum_fwd(M, taps, hh, TH)
                            # -- value grad: sum_k Mt_k * g_k --
                            gv = jnp.sum(Mt[:, :, None, :] * gall, axis=1)
                            if fori_zw:
                                RWv = gvw_ref.shape[-1]
                                gvp = jnp.pad(
                                    gv, ((0, 0), (0, 0), (0, RWv - TWp)))
                                gvp = pltpu.roll(gvp, shift=c0 + zw,
                                                 axis=2)
                                cur = gvw_ref[pl.ds(zh, TH)]
                                gvw_ref[pl.ds(zh, TH)] = cur + gvp
                                vz = pltpu.roll(vrows, shift=-(c0 + zw),
                                                axis=2)[:, :, :TWp]
                            else:
                                cur = gvw_ref[pl.ds(zh, TH), :,
                                              c0 + zw:c0 + zw + TWp]
                                gvw_ref[pl.ds(zh, TH), :,
                                        c0 + zw:c0 + zw + TWp] = cur + gv
                                vz = vrows[:, :, c0 + zw:c0 + zw + TWp]
                            # -- field grads --
                            GV = jnp.sum(gall * vz[:, None], axis=2)
                            gM = _tapsum_bwd(GV, taps, hh, THh)
                            gfw_ref[:, FLD["w"] * K:
                                    FLD["w"] * K + K, :] += \
                                D * rsel * csel * gM
                            if not is_int:
                                gfw_ref[:, FLD["th"] * K:
                                        FLD["th"] * K + K, :] \
                                    += A * (r1m - r0m) * csel * gM
                                gfw_ref[:, FLD["tw"] * K:
                                        FLD["tw"] * K + K, :] \
                                    += A * rsel * (c1m - c0m) * gM

                    loop_zw(cell_body)
                return 0

            lax.fori_loop(0, ZL, zh_body, 0)
            # un-rebase columns before accumulating into HBM
            gvw_ref[...] = pltpu.roll(gvw_ref[...], shift=ow, axis=2)
            rmw(gv_ref.at[bh, tj, pl.ds(r0, RH)], gvw_ref,
                (RH, F, vw_ref.shape[-1]), sem2, sem3)

        def frame_at(s):
            base = NSC + s * (2 + NW)
            colw = scal_ref[bh, t, ti, base]

            # frame with no live col corner contributes nothing (the
            # activity words are weight- and fraction-free, so zero-weight
            # g_w and integer-flow g_th/g_tw corners stay live) -> skip
            # the DMA, the sweep, and the g_v read-modify-write entirely
            @pl.when(colw != 0)
            def _frame():
                frame_body(s, base, colw)

        if fori_s:
            lax.fori_loop(0, W_t, lambda s, _: (frame_at(s), 0)[1], 0)
        else:
            for s in range(W_t):
                frame_at(s)

        rmw(gf_ref.at[bh, t, pl.ds(ti * TH, THh)], gfw_ref,
            (THh, gfw_ref.shape[1], gfw_ref.shape[-1]), sem2, sem3)

    return kernel, dict(RH=RH, THh=THh)


def agg_bwd_pallas(cfg, interpret, g, v1p, fldp, scal):
    """Returns (g_v1p, g_fldp)."""
    BH, T, nT = scal.shape[:3]
    K, F, TH, TWp = cfg["K8"], cfg["F"], cfg["TH"], cfg["TWp"]
    kernel, dm = _make_bwd_kernel(cfg)
    gspec = pl.BlockSpec((1, 1, 1, TH, K * F, TWp),
                         lambda bh, t, ti, *_: (bh, t, ti, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, T, nT),
        in_specs=[gspec, any_spec, any_spec, any_spec, any_spec],
        out_specs=(any_spec, any_spec),
        scratch_shapes=[
            pltpu.VMEM((dm["RH"], F, v1p.shape[-1]), jnp.float32),
            pltpu.VMEM((dm["THh"], fldp.shape[3], fldp.shape[-1]),
                       jnp.float32),
            pltpu.VMEM((dm["RH"], F, v1p.shape[-1]), jnp.float32),
            pltpu.VMEM((dm["THh"], fldp.shape[3], fldp.shape[-1]),
                       jnp.float32),
            pltpu.VMEM((dm["THh"], 3 * cfg["ZLc"] * K, TWp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ])
    out_shape = (jax.ShapeDtypeStruct(v1p.shape, jnp.float32),
                 jax.ShapeDtypeStruct(fldp.shape, jnp.float32))
    gv_zero = jnp.zeros(v1p.shape, jnp.float32)
    gf_zero = jnp.zeros(fldp.shape, jnp.float32)
    # inputs after scalar prefetch: 1=g, 2=v1p, 3=fldp, 4=gv_zero,
    # 5=gf_zero -> aliased onto outputs 0, 1
    g_v1p, g_fldp = pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, g.astype(jnp.float32), v1p, fldp, gv_zero, gf_zero)
    return g_v1p, g_fldp
