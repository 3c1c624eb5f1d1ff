"""Diagnose the underfilled-slots inds mismatch (fused in-kernel top-K
vs lazy lax.top_k) on the full_ws=False edge-query scenario.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_r5_check3.py
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stnls_tpu.search import NonLocalSearch

rng = np.random.default_rng(13)
B, T, F, H, W = 1, 2, 4, 12, 12
HD, ws, wt, ps = 1, 3, 1, 1
K = 2 * ws * ws
vid0 = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)), jnp.float32)
vid1 = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)), jnp.float32)
flows = jnp.zeros((B, T, 2 * wt, 2, H, W), jnp.float32)
common = dict(nheads=HD, stride0=1, stride1=1, self_action=None,
              itype="float", full_ws=False)
s_ref = NonLocalSearch(ws, wt, ps, K, impl="lattice", **common)
s_pal = NonLocalSearch(ws, wt, ps, K, impl="pallas", flow_budget=4,
                       spread_budget=8, **common)
d_r, i_r = s_ref(vid0, vid1, flows)
d_p, i_p = s_pal(vid0, vid1, flows)
dr, dp = np.asarray(d_r), np.asarray(d_p)
ir, ip = np.asarray(i_r), np.asarray(i_p)
bad = np.argwhere(np.abs(ir - ip).max(axis=-1) > 1e-4)
print("total mismatched slots:", len(bad))
seen = set()
for b_, hd, t, y, x, k in bad[:400]:
    q = (t, y, x)
    if q in seen:
        continue
    seen.add(q)
    if len(seen) > 3:
        break
    print(f"query t={t} y={y} x={x}:")
    print("  d_ref :", dr[b_, hd, t, y, x])
    print("  d_pal :", dp[b_, hd, t, y, x])
    print("  i_ref :", ir[b_, hd, t, y, x].tolist())
    print("  i_pal :", ip[b_, hd, t, y, x].tolist())
