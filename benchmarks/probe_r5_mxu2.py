"""Round-5 MXU probe, take 2: measure the candidate MXU pieces INSIDE a
Pallas kernel (probe_r5_mxu.py's XLA-loop version is floor-limited at
~50us/iter by HBM round-trips; the real kernel runs a sweep combo in
~0.14us, so only in-kernel measurements are honest).

Pieces, each looped NIT times inside one kernel over VMEM residents:
  A. VPU sweep combo: shifted product [Y,F,XW] mul + F-reduce + tap-sum
  B. MXU batched dot: per-row [XW,F]@[F,AW] (all column pairs at once,
     would replace ZLc*m sweep products if diagonals were free)
  C. skew relayout (pad+reshape) extracting the diagonals of B's output
  D. one-hot selection block (Sp x nfam FMAs per combo)

Run: env PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r5_mxu2.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Y, F, XW, AW = 18, 16, 130, 151
TH, TW = 16, 128
TAPS, SP, NFAM = 3, 6, 6
NIT = 100


def _time_n(body, inputs, out_shape, nit, reps):
    """Wall time of a kernel running the body nit times with a
    loop-carried dependency (body receives `mix`, a tiny scalar derived
    from the carry, and must fold it into its inputs so LICM cannot
    hoist)."""

    def kernel(*refs):
        in_refs, o_ref = refs[:-1], refs[-1]

        def it(i, c):
            mix = 1.0 + 1e-30 * c[0, 0]
            return c + body(i, mix, *in_refs)

        o_ref[...] = lax.fori_loop(
            0, nit, it, jnp.zeros(out_shape.shape, jnp.float32))

    f = jax.jit(pl.pallas_call(
        kernel, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)))
    s = jax.jit(lambda *a: jnp.sum(f(*a)[:1, :1]))
    float(s(*inputs))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(s(*inputs))
        best = min(best, time.perf_counter() - t0)
    return best


def run_kernel(name, body, inputs, out_shape, flops_per_it, reps=5):
    """Per-iteration cost via the slope between two iteration counts —
    the per-call sync through the axon tunnel costs ~0.3 ms, so absolute
    small-kernel times are floor-limited."""
    n1, n2 = NIT, 5 * NIT
    t1 = _time_n(body, inputs, out_shape, n1, reps)
    t2 = _time_n(body, inputs, out_shape, n2, reps)
    per = max((t2 - t1) / (n2 - n1), 1e-12)
    print(f"{name}: {per*1e6:.2f} us/iter"
          + (f"  ({flops_per_it/per/1e12:.2f} TFLOP/s)"
             if flops_per_it else ""))
    return per


def main():
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.standard_normal((Y, F, XW)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((Y, F, AW)), jnp.float32)
    l0w = jnp.asarray(rng.integers(0, 20, (TH, TW)), jnp.int32)

    # A. one sweep combo: shifted product + F-reduce + separable tap-sum
    NZ = 4   # static column shifts per iteration (mirrors the kernel's
             # unrolled zzw loop; dynamic minor-dim slices don't lower)

    def combo(i, mix, v0_ref, A_ref):
        out = None
        v0v = v0_ref[...] * mix
        for zz in range(NZ):
            a_sl = A_ref[:, :, zz:zz + XW]
            prod = jnp.sum(v0v * a_sl, axis=1)
            cs = None
            for b in range(TAPS):
                v = prod[:, b:b + TW]
                cs = v if cs is None else cs + v
            acc = None
            for a in range(TAPS):
                v = cs[a:a + TH, :]
                acc = v if acc is None else acc + v
            out = acc if out is None else out + acc
        return out

    t_a = run_kernel("A. VPU sweep combos x4", combo, (v0, A),
                     jax.ShapeDtypeStruct((TH, TW), jnp.float32),
                     NZ * (2 * Y * F * XW + 2 * TAPS * TH * TW)) / NZ

    # B. MXU batched dot: 18 x [130,16]@[16,151]
    def mxu(i, mix, v0_ref, A_ref):
        outs = []
        for y in range(Y):
            v0y = v0_ref[y] * mix if y == 0 else v0_ref[y]
            outs.append(lax.dot_general(
                v0y, A_ref[y], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        return sum(outs)[:TH, :TW]

    t_b = run_kernel("B. MXU batched dot (all col pairs)", mxu, (v0, A),
                     jax.ShapeDtypeStruct((TH, TW), jnp.float32),
                     2 * Y * XW * F * AW)

    # C. skew relayout of one [XW, AW] product matrix
    C = jnp.asarray(rng.standard_normal((XW, AW)), jnp.float32)

    def skew(i, mix, C_ref):
        C = C_ref[...] * mix
        flat = C.reshape(1, XW * AW)
        flat = jnp.pad(flat, ((0, 0), (0, XW)))
        sk = flat.reshape(XW, AW + 1)
        return sk[:TH, :TW]

    try:
        t_c = run_kernel("C. skew relayout [130,151]", skew, (C,),
                         jax.ShapeDtypeStruct((TH, TW), jnp.float32), 0)
    except Exception as e:
        t_c = None
        print(f"C. skew relayout: UNSUPPORTED in Mosaic ({type(e).__name__})")

    # D. one combo's one-hot selection: Sp compares + Sp*nfam FMA
    vals = jnp.asarray(rng.standard_normal((TH, TW)), jnp.float32)

    def select(i, mix, vals_ref, l0w_ref):
        vals = vals_ref[...] * mix
        l0w = l0w_ref[...]
        acc = jnp.zeros((TH, TW), jnp.float32)
        for uw in range(SP):
            mw = (l0w == (i % 8) - uw).astype(jnp.float32)
            for fam in range(NFAM):
                acc = acc + mw * vals
        return acc

    t_d = run_kernel("D. selection block (1 combo)", select, (vals, l0w),
                     jax.ShapeDtypeStruct((TH, TW), jnp.float32),
                     SP * (1 + 2 * NFAM) * TH * TW)

    print()
    ncombo = 40  # ZLc * m column combos covered by one B+C
    print(f"per (row-shift,phase): sweep {ncombo} combos = "
          f"{t_a*ncombo*1e6:.1f} us VPU-product vs MXU dot "
          f"{t_b*1e6:.1f} us + {ncombo} skews "
          f"{(t_c or 0)*ncombo*1e6:.1f} us; selection "
          f"{t_d*ncombo*1e6:.1f} us either way")


if __name__ == "__main__":
    main()
