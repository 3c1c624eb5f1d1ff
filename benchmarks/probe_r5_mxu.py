"""Round-5 MXU probe: measure the building blocks of the proposed MXU
reformulation of the shifted-product sweep (VERDICT r4 next #1) against
the current VPU sweep, at the headline tile geometry.

The candidate formulation: for each (tile, frame-pair, row-shift,
row-phase) compute ALL column-pair products with one batched dot_general
  C[y, x, ax] = sum_f v0[y, f, x] * A[y, f, ax]
(batch y=TPHx, contract F), then skew-reshape C so diagonals (x, x+dx)
become columns dx, replacing the per-column-shift VPU mul-reduce.

Measured pieces (all in ONE process; iterations chained so XLA cannot
hoist):
  1. the batched small-K dot_general      (MXU, K=F=16 -> <=12.5% util)
  2. the skew relayout [Y,N,L] -> diagonals via pad+reshape
  3. the equivalent VPU sweep: ZLc*m shifted mul-reduces + tap-sum
  4. (context) the same dot_general with ps^2*F=144 contraction

Run: env PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r5_mxu.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# headline tile geometry (ops/nls_pallas.py kernel_dims at the bench cfg)
Y = 18          # TPHx: rows in the v0 window
F = 16
XW = 130        # TPWx: v0 window cols
AW = 151        # phase-image cols (union window)
NCOMBO = 40     # ZLc * m column-shift combos the sweep covers
TH, TW = 16, 128
TAPS = 3        # ps


def chain(fn, x0, extra, n):
    """Run fn n times, feeding a scalar of the output back into the input
    so XLA cannot hoist the loop body."""

    def body(i, carry):
        x, acc = carry
        out = fn(x, *extra)
        leaf = jax.tree_util.tree_leaves(out)[0]
        s = jnp.sum(leaf[..., :1, :1]) * 1e-30
        return (x + s.astype(x.dtype), acc + s)

    return lax.fori_loop(0, n, body, (x0, jnp.float32(0.0)))[1]


def timed_chain(fn, x0, extra, n=200, reps=5):
    jf = jax.jit(lambda x: chain(fn, x, extra, n))
    float(jf(x0))  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jf(x0))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.standard_normal((Y, F, XW)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((Y, F, AW)), jnp.float32)
    l0w = jnp.asarray(rng.integers(0, NCOMBO, (TH, TW)), jnp.int32)

    # ---- 1. batched dot_general, K=F (the MXU form of one row-shift) ----
    def mm(v0, A):
        return lax.dot_general(v0, A, (((1,), (1,)), ((0,), (0,))))

    t_mm = timed_chain(mm, v0, (A,), n=500)
    fl = 2 * Y * XW * F * AW
    print(f"1. batched dot_general [Y={Y}] [{XW},{F}]@[{F},{AW}]: "
          f"{t_mm*1e6:.1f} us  ({fl/t_mm/1e12:.2f} TFLOP/s effective)")

    # ---- 1b. same with ps^2*F = 144 contraction (patch features) ----
    D2 = TAPS * TAPS * F
    v0b = jnp.asarray(rng.standard_normal((Y, D2, XW)), jnp.float32)
    Ab = jnp.asarray(rng.standard_normal((Y, D2, AW)), jnp.float32)
    t_mm2 = timed_chain(mm, v0b, (Ab,), n=500)
    fl2 = 2 * Y * XW * D2 * AW
    print(f"1b. batched dot_general K={D2}: {t_mm2*1e6:.1f} us  "
          f"({fl2/t_mm2/1e12:.2f} TFLOP/s effective)")

    # ---- 2. skew relayout: C [Y, XW, AW] -> diagonals dx in columns ----
    C = jnp.asarray(rng.standard_normal((Y, XW, AW)), jnp.float32)

    def skew(C):
        # element (x, x+dx) at flat x*AW + x + dx = x*(AW+1) + dx;
        # reshape flat (padded) to rows of length AW+1 -> [x, dx]
        flat = C.reshape(Y, XW * AW)
        flat = jnp.pad(flat, ((0, 0), (0, XW)))
        return flat.reshape(Y, XW, AW + 1)

    t_sk = timed_chain(skew, C, (), n=500)
    print(f"2. skew relayout [Y,{XW},{AW}]: {t_sk*1e6:.1f} us  "
          f"({C.size*4/t_sk/1e9:.0f} GB/s)")

    # ---- 3. the current VPU sweep for the same work: NCOMBO shifted
    # mul-reduces + tap-sums (what pieces 1+2 would replace) ----
    Ap = jnp.asarray(rng.standard_normal((Y, F, AW)), jnp.float32)

    def sweep(v0, Ap):
        outs = []
        for zz in range(NCOMBO // 2):        # ZLc combos per phase pair
            a_sl = lax.slice(Ap, (0, 0, zz), (Y, F, zz + XW))
            prod = jnp.sum(v0 * a_sl, axis=1)
            acc = None
            for a in range(TAPS):
                ya = lax.slice(prod, (a, 0), (a + TH, XW))
                for b in range(TAPS):
                    v = lax.slice(ya, (0, b), (TH, b + TW))
                    acc = v if acc is None else acc + v
            outs.append(acc)
        return sum(outs)

    t_sw = timed_chain(sweep, v0, (Ap,), n=100)
    swfl = (NCOMBO // 2) * (2 * Y * F * XW + TAPS * TAPS * TH * TW)
    print(f"3. VPU sweep {NCOMBO//2} combos (product+tapsum): "
          f"{t_sw*1e6:.1f} us  ({swfl/t_sw/1e12:.2f} TFLOP/s effective)")

    # ---- 4. the one-hot selection for the same combos (unchanged in
    # either formulation — context for Amdahl) ----
    vals = jnp.asarray(rng.standard_normal((TH, TW)), jnp.float32)

    def select(vals, l0w):
        acc = [jnp.zeros((TH, TW), jnp.float32)] * 6
        for j_w in range(NCOMBO // 2):
            for uw in range(6):
                mw = (l0w == (j_w - uw)).astype(jnp.float32)
                for fam in range(6):
                    acc[fam] = acc[fam] + mw * vals
        return sum(acc)

    t_sel = timed_chain(select, vals, (l0w,), n=100)
    print(f"4. one-hot selection {NCOMBO//2} combos x Sp x nfam: "
          f"{t_sel*1e6:.1f} us")

    print()
    print("verdict inputs: MXU replacement per (row-shift, phase) pair = "
          f"{(t_mm + t_sk)*1e6:.1f} us vs VPU product stage "
          f"{t_sw*1e6:.1f} us for {NCOMBO//2} combos; selection "
          f"({t_sel*1e6:.1f} us) is unchanged either way.")


if __name__ == "__main__":
    main()
