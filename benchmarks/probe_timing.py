"""Timing sanity check: vary an input each iteration to defeat any
result caching in the axon runtime; report steady fwd and fwd+bwd times."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import stnls_tpu

B, T, F, H, W = 1, 5, 16, 128, 128
ws, wt, ps, K, HD = 5, 2, 3, 10, 2
rng = np.random.default_rng(0)
vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
fflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
bflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
search = stnls_tpu.search.NonLocalSearch(
    ws, wt, ps, K, nheads=HD, stride0=1, stride1=0.5,
    self_action="anchor", itype="float", impl="warp")


def fwd(v, ff, bf, s):
    flows = stnls_tpu.nn.search_flow(ff, bf, wt, 1)
    d, sf = search(v + s, v, flows)
    return d, sf


def loss(v, ff, bf, s):
    d, sf = fwd(v, ff, bf, s)
    return jnp.mean(d ** 2) + 1e-3 * jnp.mean(sf ** 2)


for name, f in [("fwd", jax.jit(fwd)),
                ("fwd+bwd", jax.jit(jax.grad(loss, (0, 1))))]:
    out = jax.block_until_ready(f(vid, fflow, bflow, jnp.float32(0.)))
    n = 5
    t0 = time.perf_counter()
    for i in range(n):
        out = f(vid, fflow, bflow, jnp.float32(1e-6 * i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    leaf = jax.tree_util.tree_leaves(out)[0]
    print(f"{name}: steady={dt*1e3:.3f} ms fps={T/dt:.1f} "
          f"checksum={float(jnp.sum(leaf)):.4f}")
