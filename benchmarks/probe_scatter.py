"""Isolate the backward-scatter cost of a big gather on TPU, and compare
alternative scatter-add formulations.

N gathered values scatter-add into an M-pixel frame (the warp-path
backward shape at the 128^2 bench config).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, *args, n=3):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


B, HD, C = 1, 2, 1
M = 5 * 134 * 134          # padded frames, T=5
N = 36 * 5 * 5 * 128 * 128  # S^2 * T * W_t * nH * nW

rng = np.random.default_rng(0)
v = jnp.asarray(rng.standard_normal((B, HD, C, M)), jnp.float32)
idx = jnp.asarray(rng.integers(0, M, (B, HD, 1, N)), jnp.int32)
g = jnp.asarray(rng.standard_normal((B, HD, C, N)), jnp.float32)

# 1. gather fwd (reference point)
f_gather = jax.jit(lambda v, i: jnp.take_along_axis(v, i, axis=3))
print(f"gather fwd: {timeit(f_gather, v, idx)*1e3:.2f} ms")

# 2. gather VJP (what jax.grad emits)
def loss(v):
    return jnp.sum(jnp.take_along_axis(v, idx, axis=3) * g)
f_vjp = jax.jit(jax.grad(loss))
print(f"gather VJP scatter: {timeit(f_vjp, v)*1e3:.2f} ms")

# 3. explicit .at[].add
def at_add(g, idx):
    out = jnp.zeros((B, HD, C, M), jnp.float32)
    return out.at[
        jnp.arange(B)[:, None, None, None],
        jnp.arange(HD)[None, :, None, None],
        jnp.arange(C)[None, None, :, None],
        jnp.broadcast_to(idx, (B, HD, C, N))].add(g)
f_at = jax.jit(at_add)
print(f".at[].add: {timeit(f_at, g, idx)*1e3:.2f} ms")

# 4. segment_sum per (b,hd,c)
def seg(g, idx):
    def one(gv, iv):
        return jax.ops.segment_sum(gv, iv, num_segments=M)
    return jax.vmap(lambda gc, ic: jax.vmap(one, (0, None))(gc, ic[0]))(
        g.reshape(B * HD, C, N), idx.reshape(B * HD, 1, N))
f_seg = jax.jit(seg)
print(f"segment_sum: {timeit(f_seg, g, idx)*1e3:.2f} ms")

# 5. sort + segment boundaries + unique scatter
def sort_scatter(g, idx):
    def one(gv, iv):
        order = jnp.argsort(iv)
        iv_s = iv[order]
        gv_s = gv[:, order]  # [C, N]
        # segmented prefix-sum via cumsum-and-subtract
        csum = jnp.cumsum(gv_s, axis=1)
        last = jnp.concatenate(
            [iv_s[1:] != iv_s[:-1], jnp.ones((1,), bool)])
        out = jnp.zeros((C, M), jnp.float32)
        # total of segment ending at position p = csum[p] - csum[prev_end]
        ends = jnp.where(last, iv_s, M)  # scatter only at segment ends
        out = out.at[:, ends].add(csum, mode="drop")
        prev = jnp.where(last, jnp.roll(csum, -1, axis=1) - csum, 0.)
        return out  # note: approximate structure; timing-only probe
    return jax.vmap(one)(g.reshape(B * HD, C, N), idx.reshape(B * HD, N))
f_sort = jax.jit(sort_scatter)
print(f"sort+scatter (timing only): {timeit(f_sort, g, idx)*1e3:.2f} ms")
