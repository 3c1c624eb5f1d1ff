"""Windowed scatter-add probes: does XLA TPU scatter cost scale with the
number of indices or the number of elements?"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(f, *args, n=3):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


Tp, Hp, Wp = 5, 134, 134
S = 6
Nq = 5 * 5 * 128 * 128  # T * W_t * nH * nW = 819200

rng = np.random.default_rng(0)
tj = rng.integers(0, Tp, Nq)
oi = rng.integers(0, Hp - S, Nq)
oj = rng.integers(0, Wp - S, Nq)
idx3 = jnp.asarray(np.stack([tj, oi, oj], 1), jnp.int32)  # [Nq, 3]


def win_scatter(updates, idx3, C):
    op = jnp.zeros((Tp, Hp, Wp, C), jnp.float32)
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1, 2))
    return lax.scatter_add(
        op, idx3, updates, dn,
        indices_are_sorted=False, unique_indices=False)


for C in (1, 4):
    upd = jnp.asarray(rng.standard_normal((Nq, S, S, C)), jnp.float32)
    f = jax.jit(partial(win_scatter, C=C))
    print(f"windowed scatter C={C}: {timeit(f, upd, idx3)*1e3:.2f} ms "
          f"({Nq*S*S*C/1e6:.0f}M elements)")

# sorted-indices variant (pre-sorted by linear index)
lin = (tj * Hp + oi) * Wp + oj
order = np.argsort(lin)
idx3_s = jnp.asarray(np.stack([tj, oi, oj], 1)[order], jnp.int32)
upd = jnp.asarray(rng.standard_normal((Nq, S, S, 4)), jnp.float32)


def win_scatter_sorted(updates, idx3):
    op = jnp.zeros((Tp, Hp, Wp, 4), jnp.float32)
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1, 2))
    return lax.scatter_add(op, idx3, updates, dn,
                           indices_are_sorted=True, unique_indices=False)


f = jax.jit(win_scatter_sorted)
print(f"windowed scatter C=4 sorted-hint: {timeit(f, upd, idx3_s)*1e3:.2f} ms")

# scalar scatter at same index count (window=1) for scaling reference
upd1 = jnp.asarray(rng.standard_normal((Nq, 1, 1, 1)), jnp.float32)
f1 = jax.jit(partial(win_scatter, C=1))
print(f"windowed scatter 1x1x1: {timeit(f1, upd1, idx3)*1e3:.2f} ms")
