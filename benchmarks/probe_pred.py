"""Honest TPU timing of the fused Pallas search kernel with the
data-adaptive predication knob and backward-phase bisect knob.

Usage: probe_pred.py [fwd|bwd] [pred:0|1] [bskip-letters] [TH] [TW]
  bskip letters (timing-only, results wrong): a=fwd-sel recompute,
  c=bwd selection sweep, d=X-field bwd, e=phase bwd, x=X recompute.

Bench-realistic smooth flows (same generator as bench.py).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stnls_tpu.ops.nls_pallas import nls_pallas_volume
from bench import smooth_flows
import stnls_tpu
from stnls_tpu.search.utils import shape_vids, shape_flows

mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
pred = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
bskip = sys.argv[3] if len(sys.argv) > 3 else ""
TH = int(sys.argv[4]) if len(sys.argv) > 4 else 8
TW = int(sys.argv[5]) if len(sys.argv) > 5 else 128

B, T, F, H, W = 1, 5, 16, 128, 128
HD = 2
ws, wt, ps = 5, 2, 3
FLOW_BUDGET, SPREAD = 8, 8

rng = np.random.default_rng(0)
vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
fflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
bflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, 1)
v6 = shape_vids(HD, [vid])[0]
f7 = shape_flows(HD, flows)


def fwd(v0, v1, fl, s):
    d, i3, outl = nls_pallas_volume(
        v0 + s, v1, fl, ws=ws, wt=wt, ps=ps, stride0=1, stride1=0.5,
        dist_type="l2", itype="float", flow_budget=FLOW_BUDGET,
        spread_budget=SPREAD, tile=(TH, TW), predicate=pred,
        _bskip=bskip)
    return jnp.sum(d ** 2) * 1e-6


fn = jax.jit(fwd) if mode == "fwd" else jax.jit(jax.grad(fwd, (0, 1, 2)))

t0 = time.perf_counter()
out = fn(v6, v6, f7, jnp.float32(0.))
leaf = jax.tree_util.tree_leaves(out)[0]
s = 1e-30 * jnp.sum(leaf)
float(s)
print(f"compile+first: {time.perf_counter()-t0:.1f}s")
n = 10
t0 = time.perf_counter()
for i in range(n):
    out = fn(v6, v6, f7, s + jnp.float32(1e-6 * i))
    s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0])
float(s)
print(f"pallas {mode} pred={int(pred)} bskip='{bskip}' TH={TH} TW={TW}: "
      f"steady={(time.perf_counter()-t0)/n*1e3:.1f} ms")
