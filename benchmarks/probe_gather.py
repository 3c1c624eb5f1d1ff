"""Probe NonLocalGather fwd or fwd+bwd on TPU at the bench config.
Usage: probe_gather.py [fwd|bwd]  (one executable per process!)"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import stnls_tpu

mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
B, T, F, H, W = 1, 5, 16, 128, 128
ps, K, HD = 3, 10, 2
rng = np.random.default_rng(0)
vid = jnp.asarray(rng.standard_normal((B, HD * F, T // 1, 1, 1)), jnp.float32)
vid = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)), jnp.float32)
weights = jnp.asarray(rng.random((B, HD, T, H, W, K)), jnp.float32)
flows = jnp.asarray(
    np.concatenate([rng.integers(-2, 3, (B, HD, T, H, W, K, 1)),
                    3 * rng.standard_normal((B, HD, T, H, W, K, 2))], -1),
    jnp.float32)

gather = stnls_tpu.agg.NonLocalGather(ps=ps, stride0=1)


def fwd(v, w, fl, s):
    return gather(v + s, w, fl)


def loss(v, w, fl, s):
    return jnp.mean(fwd(v, w, fl, s) ** 2)


fn = jax.jit(fwd) if mode == "fwd" else jax.jit(jax.grad(loss, (0, 1, 2)))
t0 = time.perf_counter()
out = jax.block_until_ready(fn(vid, weights, flows, jnp.float32(0.)))
print(f"compile+first: {time.perf_counter()-t0:.1f}s")
n = 5
t0 = time.perf_counter()
for i in range(n):
    out = fn(vid, weights, flows, jnp.float32(1e-6 * i))
jax.block_until_ready(out)
print(f"gather {mode}: steady={(time.perf_counter()-t0)/n*1e3:.2f} ms")
