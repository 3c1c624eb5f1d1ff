"""HONEST device timings: the axon runtime's block_until_ready does not
wait for device completion (async mirage) — only a device->host transfer
does. Every timing here forces a scalar host read per call.

Measures the candidate data-movement primitives for the search/agg ops:
  flatgather   29.5M-element scalar gather from a small table
  wingather    windowed lax.gather: N patch slices (1,S,S)
  wingatherF   windowed gather with channels-minor slices (1,S,S*F)
  winscatter   windowed lax.scatter_add [N,S,S,C] (the VJP shape)
  dynslice     fori_loop of dynamic-slice patch reads (reference point)
  matmul       2048^2 matmul (device sanity)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

which = sys.argv[1] if len(sys.argv) > 1 else "all"

Tp, Hp, Wp = 5, 138, 138
S, Fm = 6, 8
Nq = 5 * 5 * 128 * 128  # 819200

rng = np.random.default_rng(0)
frames = jnp.asarray(rng.standard_normal((Tp, Hp, Wp)), jnp.float32)
framesF = jnp.asarray(rng.standard_normal((Tp, Hp, Wp * Fm)), jnp.float32)
tj = jnp.asarray(rng.integers(0, Tp, Nq), jnp.int32)
oi = jnp.asarray(rng.integers(0, Hp - S, Nq), jnp.int32)
oj = jnp.asarray(rng.integers(0, Wp - S, Nq), jnp.int32)


def timeit(f, *args, n=3):
    # warmup + compile
    _ = float(jnp.sum(jax.tree_util.tree_leaves(f(*args, jnp.float32(0.)))[0]))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        out = f(*args, jnp.float32(1e-6 * (i + 1)))
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run(name, f, *args):
    dt = timeit(f, *args)
    print(f"{name}: {dt*1e3:.2f} ms")


if which in ("all", "flatgather"):
    flat_idx = ((tj * Hp + oi) * Wp + oj)
    idx36 = (flat_idx[None, None] +
             (jnp.arange(S) * Wp)[:, None, None] +
             jnp.arange(S)[None, :, None]).reshape(-1)

    @jax.jit
    def flatgather(fr, idx, s):
        return jnp.take(fr.reshape(-1) + s, idx, mode="clip")
    run(f"flatgather ({S*S*Nq/1e6:.0f}M elems)", flatgather, frames, idx36)

if which in ("all", "wingather"):
    idx3 = jnp.stack([tj, oi, oj], 1)

    @jax.jit
    def wingather(fr, idx, s):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2))
        return lax.gather(fr + s, idx, dn, slice_sizes=(1, S, S))
    run(f"wingather (N={Nq}, {S}x{S})", wingather, frames, idx3)

if which in ("all", "wingatherF"):
    idx3F = jnp.stack([tj, oi, oj * Fm], 1)

    @jax.jit
    def wingatherF(fr, idx, s):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2))
        return lax.gather(fr + s, idx, dn, slice_sizes=(1, S, S * Fm))
    run(f"wingatherF (N={Nq}, {S}x{S*Fm})", wingatherF, framesF, idx3F)

if which in ("all", "winscatter"):
    C = 4
    upd = jnp.asarray(rng.standard_normal((Nq, S, S, C)), jnp.float32)
    idx3 = jnp.stack([tj, oi, oj], 1)

    @jax.jit
    def winscatter(up, idx, s):
        op = jnp.zeros((Tp, Hp, Wp, C), jnp.float32)
        dn = lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3),
            inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0, 1, 2))
        return lax.scatter_add(op, idx, up + s, dn)
    run(f"winscatter (N={Nq}, {S}x{S}x{C})", winscatter, upd, idx3)

if which in ("all", "matmul"):
    a = jnp.asarray(rng.standard_normal((2048, 2048)), jnp.float32)

    @jax.jit
    def mm(a, s):
        return (a + s) @ a
    run("matmul 2048^2", mm, a)

if which in ("all", "elem"):
    x = jnp.asarray(rng.standard_normal((Nq * S * S,)), jnp.float32)

    @jax.jit
    def el(x, s):
        return x * (2. + s)
    run(f"elementwise ({Nq*S*S/1e6:.0f}M)", el, x)
