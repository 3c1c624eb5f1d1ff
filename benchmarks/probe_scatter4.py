"""Final scatter config probe: updates [N, S, S, C], indices [N, 4] with
batch folded in — the exact shape the warp-path custom VJP will use."""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(f, *args, n=5):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


BH, Tp, Hp, Wp = 2, 5, 134, 134
S, C = 6, 4
Nq = 5 * 5 * 128 * 128
N = BH * Nq

rng = np.random.default_rng(0)
bh = np.repeat(np.arange(BH), Nq)
tj = rng.integers(0, Tp, N)
oi = rng.integers(0, Hp - S, N)
oj = rng.integers(0, Wp - S, N)
idx4 = jnp.asarray(np.stack([bh, tj, oi, oj], 1), jnp.int32)
upd = jnp.asarray(rng.standard_normal((N, S, S, C)), jnp.float32)


def win_scatter(updates, idx4):
    op = jnp.zeros((BH, Tp, Hp, Wp, C), jnp.float32)
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(0, 1),
        scatter_dims_to_operand_dims=(0, 1, 2, 3))
    return lax.scatter_add(op, idx4, updates, dn)


f = jax.jit(win_scatter)
print(f"[N,S,S,C] batch-folded C={C}: {timeit(f, upd, idx4)*1e3:.2f} ms")

# correctness on a small slice
got = np.asarray(f(upd, idx4))
want = np.zeros((BH, Tp, Hp, Wp, C), np.float32)
upn = np.asarray(upd)
sel = rng.integers(0, N, 2000)
w2 = np.zeros_like(want)
for n in sel:
    w2[bh[n], tj[n], oi[n]:oi[n] + S, oj[n]:oj[n] + S] += upn[n]
# full check is too slow in python; verify total mass instead
print("mass check:", abs(got.sum() - upn.sum()) / abs(upn.sum()))
