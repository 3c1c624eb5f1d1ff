"""Windowed scatter layout probe: updates [S,S,C,N] (window dims leading,
index dim minor) to dodge tile padding; batch folded into indices."""

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
S = 6
Nq = 5 * 5 * 128 * 128
N = BH * Nq

rng = np.random.default_rng(0)
bh = np.repeat(np.arange(BH), Nq)
tj = rng.integers(0, Tp, N)
oi = rng.integers(0, Hp - S, N)
oj = rng.integers(0, Wp - S, N)
idx4 = jnp.asarray(np.stack([bh, tj, oi, oj], 1), jnp.int32)  # [N, 4]


def win_scatter(updates, idx4, C):
    """updates [S, S, C, N] -> operand [BH, Tp, Hp, Wp, C]."""
    op = jnp.zeros((BH, Tp, Hp, Wp, C), jnp.float32)
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(0, 1, 2),   # -> operand dims (Hp, Wp, C)
        inserted_window_dims=(0, 1),    # BH, Tp indexed, window size 1
        scatter_dims_to_operand_dims=(0, 1, 2, 3))
    return lax.scatter_add(op, idx4, updates, dn)


for C in (4, 16):
    upd = jnp.asarray(rng.standard_normal((S, S, C, N)), jnp.float32)
    f = jax.jit(partial(win_scatter, C=C))
    try:
        dt = timeit(f, upd, idx4)
        print(f"windowed scatter [S,S,C,N] C={C}: {dt*1e3:.2f} ms "
              f"({S*S*C*N/1e6:.0f}M elements)")
    except Exception as e:
        print(f"C={C} failed: {type(e).__name__} {str(e)[:120]}")

# correctness check vs dense baseline (tiny case)
Bs, Ts, Hs, Ws, Ss, Cs = 2, 2, 9, 9, 3, 2
Ns = 40
bh_s = rng.integers(0, Bs, Ns)
tj_s = rng.integers(0, Ts, Ns)
oi_s = rng.integers(0, Hs - Ss + 1, Ns)
oj_s = rng.integers(0, Ws - Ss + 1, Ns)
ii = jnp.asarray(np.stack([bh_s, tj_s, oi_s, oj_s], 1), jnp.int32)
up = jnp.asarray(rng.standard_normal((Ss, Ss, Cs, Ns)), jnp.float32)


def small(updates, idx4):
    op = jnp.zeros((Bs, Ts, Hs, Ws, Cs), jnp.float32)
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(0, 1, 2),
        inserted_window_dims=(0, 1),
        scatter_dims_to_operand_dims=(0, 1, 2, 3))
    return lax.scatter_add(op, idx4, updates, dn)


got = np.asarray(jax.jit(small)(up, ii))
want = np.zeros((Bs, Ts, Hs, Ws, Cs), np.float32)
upn = np.asarray(up)
for n in range(Ns):
    want[bh_s[n], tj_s[n], oi_s[n]:oi_s[n] + Ss,
         oj_s[n]:oj_s[n] + Ss] += upn[:, :, :, n]
print("correctness:", np.abs(got - want).max())
