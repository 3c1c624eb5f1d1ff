"""Honest TPU timing of the CV search path at the bench config.
Usage: probe_cv.py [fwd|bwd] [budget]"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import stnls_tpu

mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
budget = int(sys.argv[2]) if len(sys.argv) > 2 else 8

B, T, F, H, W = 1, 5, 16, 128, 128
ws, wt, ps, K, HD = 5, 2, 3, 10, 2
rng = np.random.default_rng(0)
vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
fflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
bflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)

tile = None
if len(sys.argv) > 3 and sys.argv[3] == "tiled":
    tile = (16, 128)
search = stnls_tpu.search.NonLocalSearch(
    ws, wt, ps, K, nheads=HD, stride0=1, stride1=0.5,
    self_action="anchor", itype="float", impl="cv", flow_budget=budget,
    cv_tile=tile, spread_budget=4)


def fwd(v, ff, bf, s):
    flows = stnls_tpu.nn.search_flow(ff, bf, wt, 1)
    d, sf = search(v + s, v, flows)
    return jnp.sum(d ** 2) * 1e-6 + jnp.sum(sf ** 2) * 1e-8


fn = jax.jit(fwd) if mode == "fwd" else jax.jit(jax.grad(fwd, (0, 1)))

t0 = time.perf_counter()
out = fn(vid, fflow, bflow, jnp.float32(0.))
leaf = jax.tree_util.tree_leaves(out)[0]
s = 1e-30 * jnp.sum(leaf)
float(s)
print(f"compile+first: {time.perf_counter()-t0:.1f}s")
n = 5
t0 = time.perf_counter()
for i in range(n):
    out = fn(vid, fflow, bflow, s + jnp.float32(1e-6 * i))
    s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0])
float(s)
print(f"cv search {mode} budget={budget}: "
      f"steady={(time.perf_counter()-t0)/n*1e3:.1f} ms")
