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
    FLD, _tapsum_fwd, _tapsum_bwd, _corner_masks,
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

    def kernel(scal_ref, g_ref, v_ref, fld_ref, gvz_ref, gfz_ref,
               gv_ref, gf_ref,
               vw_ref, fw_ref, gvw_ref, gfw_ref,
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

        for s in range(W_t):
            tj = scal_ref[bh, t, ti, 3 + s]
            cpv = pltpu.make_async_copy(
                v_ref.at[bh, tj, pl.ds(r0, RH)], vw_ref, sem0)
            cpv.start()
            ztv = float(zt_vals[s])
            D = (fld("dt") == ztv).astype(jnp.float32)
            A = fld("w") * D                           # [THh, K, Wp]
            cpv.wait()
            # column rebase (see fwd kernel)
            vw_ref[...] = pltpu.roll(vw_ref[...], shift=-ow, axis=2)
            gvw_ref[...] = jnp.zeros_like(gvw_ref)
            gall = g_ref[0, 0, 0].reshape(TH, K, F, TWp)

            def zh_body(zh, _):
                ohf = (oh + zh).astype(jnp.float32)
                vrows = vw_ref[pl.ds(zh, TH)]          # [TH, F, RW]
                th = None if is_int else fld("th")
                r0m, r1m, rsel = _corner_masks(fld("fh"), ohf, th, is_int)
                Rf = A * rsel
                for zw in range(ZLc):
                    zwv = (ow + zw).astype(jnp.float32)
                    tw = None if is_int else fld("tw")
                    c0m, c1m, csel = _corner_masks(fld("fw"), zwv, tw,
                                                   is_int)
                    M = Rf * csel
                    # sparsity skip (see fwd kernel). NOTE: must be
                    # weight-free AND fraction-free — a zero-weight edge
                    # still needs its g_w, and an exactly-integer flow
                    # (th/tw == 0) still needs its g_th/g_tw from the
                    # zero-weight corner (r1m/c1m), so test the bare
                    # corner hits, not the lerped selectors.
                    any_hit = jnp.max(D * (r0m + r1m) * (c0m + c1m)) > 0.

                    @pl.when(any_hit)
                    def _bwd_cell(M=M, csel=csel, r0m=r0m, r1m=r1m,
                                  c0m=c0m, c1m=c1m, rsel=rsel):
                        Mt = _tapsum_fwd(M, taps, hh, TH)
                        # -- value grad: sum_k Mt_k * g_k --
                        gv = jnp.sum(Mt[:, :, None, :] * gall, axis=1)
                        cur = gvw_ref[pl.ds(zh, TH), :,
                                      c0 + zw:c0 + zw + TWp]
                        gvw_ref[pl.ds(zh, TH), :,
                                c0 + zw:c0 + zw + TWp] = cur + gv
                        # -- field grads --
                        vz = vrows[:, :, c0 + zw:c0 + zw + TWp]
                        GV = jnp.sum(gall * vz[:, None], axis=2)
                        gM = _tapsum_bwd(GV, taps, hh, THh)
                        gfw_ref[:, FLD["w"] * K:FLD["w"] * K + K, :] += \
                            D * rsel * csel * gM
                        if not is_int:
                            gfw_ref[:, FLD["th"] * K:FLD["th"] * K + K, :] \
                                += A * (r1m - r0m) * csel * gM
                            gfw_ref[:, FLD["tw"] * K:FLD["tw"] * K + K, :] \
                                += A * rsel * (c1m - c0m) * gM
                return 0

            lax.fori_loop(0, ZL, zh_body, 0)
            # un-rebase columns before accumulating into HBM
            gvw_ref[...] = pltpu.roll(gvw_ref[...], shift=ow, axis=2)
            rmw(gv_ref.at[bh, tj, pl.ds(r0, RH)], gvw_ref,
                (RH, F, vw_ref.shape[-1]), sem2, sem3)

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
