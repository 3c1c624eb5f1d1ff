"""Honest TPU timing of the Pallas fused search kernel at the bench config.
Usage: probe_pallas.py [fwd|bwd] [budget] [spread] [TH]"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from stnls_tpu.ops.nls_pallas import nls_pallas_volume

mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
budget = int(sys.argv[2]) if len(sys.argv) > 2 else 8
spread = int(sys.argv[3]) if len(sys.argv) > 3 else 8
TH = int(sys.argv[4]) if len(sys.argv) > 4 else 8

B, T, F, H, W = 1, 5, 16, 128, 128
HD = 2
ws, wt, ps = 5, 2, 3
rng = np.random.default_rng(0)
vid = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
W_t = 2 * wt + 1
flows = jnp.asarray(rng.standard_normal((B, HD, T, W_t - 1, 2, H, W)),
                    jnp.float32)


def fwd(v0, v1, fl, s):
    d, i3, outl = nls_pallas_volume(
        v0 + s, v1, fl, ws=ws, wt=wt, ps=ps, stride0=1, stride1=0.5,
        dist_type="l2", itype="float", flow_budget=budget,
        spread_budget=spread, tile=(TH, 128))
    return jnp.sum(d ** 2) * 1e-6


fn = jax.jit(fwd) if mode == "fwd" else jax.jit(jax.grad(fwd, (0, 1, 2)))

t0 = time.perf_counter()
out = fn(vid, vid, flows, jnp.float32(0.))
leaf = jax.tree_util.tree_leaves(out)[0]
s = 1e-30 * jnp.sum(leaf)
float(s)
print(f"compile+first: {time.perf_counter()-t0:.1f}s")
n = 10
t0 = time.perf_counter()
for i in range(n):
    out = fn(vid, vid, flows, s + jnp.float32(1e-6 * i))
    s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0])
float(s)
print(f"pallas search {mode} budget={budget} spread={spread} TH={TH}: "
      f"steady={(time.perf_counter()-t0)/n*1e3:.1f} ms")
