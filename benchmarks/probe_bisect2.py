"""Bisect stage 2: full NonLocalSearch wrapper vs search_flow."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import stnls_tpu

B, T, F, H, W = 1, 5, 16, 128, 128
ws, wt, ps, K, HD = 5, 2, 3, 10, 2
W_t = 2 * wt + 1
rng = np.random.default_rng(0)
vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
fflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
bflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
flows_pre = stnls_tpu.nn.search_flow(fflow, bflow, wt, 1)

search = stnls_tpu.search.NonLocalSearch(
    ws, wt, ps, K, nheads=HD, stride0=1, stride1=0.5,
    self_action="anchor", itype="float", impl="warp")


def loss_search_only(v, fl, s):
    d, sf = search(v + s, v, fl)
    return jnp.mean(d ** 2) + 1e-3 * jnp.mean(sf ** 2)


def loss_flow_only(ff, bf, s):
    fl = stnls_tpu.nn.search_flow(ff + s, bf, wt, 1)
    return jnp.mean(fl ** 2)


def loss_full(v, ff, bf, s):
    fl = stnls_tpu.nn.search_flow(ff, bf, wt, 1)
    d, sf = search(v + s, v, fl)
    return jnp.mean(d ** 2) + 1e-3 * jnp.mean(sf ** 2)


def timeit(f, args, n=3):
    out = jax.block_until_ready(f(*args, jnp.float32(0.)))
    t0 = time.perf_counter()
    for i in range(n):
        out = f(*args, jnp.float32(1e-6 * i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


for name, fn, args in [
        ("search only (pre flows)", jax.jit(jax.grad(loss_search_only, (0, 1))),
         (vid, flows_pre)),
        ("search_flow only", jax.jit(jax.grad(loss_flow_only, (0, 1))),
         (fflow, bflow)),
        ("full", jax.jit(jax.grad(loss_full, (0, 1))), (vid, fflow, bflow))]:
    t0 = time.perf_counter()
    dt = timeit(fn, args)
    print(f"grad {name}: steady={dt*1e3:.1f} ms "
          f"(compile+3 took {time.perf_counter()-t0:.0f}s)")
