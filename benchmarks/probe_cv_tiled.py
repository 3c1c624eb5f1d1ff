"""Probe: cv-tiled engine (pure XLA) at the headline bench config.

Times nls_cv_volume(tile_q=...) fwd and fwd+bwd on-chip, vs the Pallas
kernel's recorded numbers. Honest timing: data-chained iterations closed
with a device->host float() sync (axon's block_until_ready is async).

Usage: python benchmarks/probe_cv_tiled.py [tileH tileW spread]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stnls_tpu.ops.nls_cv import nls_cv_volume

TH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
TW = int(sys.argv[2]) if len(sys.argv) > 2 else 8
SB = int(sys.argv[3]) if len(sys.argv) > 3 else 4

B, T, F, H, W = 1, 5, 16, 128, 128
HD = 2
ws, wt, ps, K = 5, 2, 3, 10
stride0, stride1 = 1, 0.5
FLOW_BUDGET = 8

sys.path.insert(0, "/root/repo")
from bench import smooth_flows  # noqa: E402
import stnls_tpu  # noqa: E402
from stnls_tpu.search.utils import shape_vids, shape_flows  # noqa: E402

rng = np.random.default_rng(0)
vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
fflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
bflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, stride0)
v6 = shape_vids(HD, [vid])[0]
f7 = shape_flows(HD, flows)

kw = dict(ws=ws, wt=wt, ps=ps, stride0=stride0, stride1=stride1,
          dist_type="l2", itype="float", flow_budget=FLOW_BUDGET,
          tile_q=(TH, TW), spread_budget=SB)


@jax.jit
def fwd(v6, f7, s):
    d, i3, outl = nls_cv_volume(v6 + s, v6, f7, **kw)
    return d, outl


@jax.jit
def fwdbwd(v6, f7, s):
    def loss(v6, f7):
        d, i3, _ = nls_cv_volume(v6, v6, f7, **kw)
        big = jnp.where(jnp.isfinite(d), d, 0.)
        return jnp.mean(big ** 2) + 1e-3 * jnp.mean(i3.astype(jnp.float32) ** 2)
    g0, gf = jax.grad(loss, argnums=(0, 1))(v6 + s, f7)
    return g0, gf


def timeit(name, f, n=5):
    t0 = time.perf_counter()
    out = f(v6, f7, jnp.float32(0.))
    s = 1e-30 * jnp.sum(out[0])
    float(s)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n):
        out = f(v6, f7, s + jnp.float32(1e-6 * i))
        s = 1e-30 * jnp.sum(out[0])
    float(s)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.1f} ms  ({T/dt:.1f} frames/s)  "
          f"compile {compile_s:.1f}s")
    return dt


d, outl = fwd(v6, f7, jnp.float32(0.))
print("outliers:", int(jnp.sum(outl)), "of", outl.size)
timeit("cv-tiled fwd    ", fwd)
timeit("cv-tiled fwd+bwd", fwdbwd)
