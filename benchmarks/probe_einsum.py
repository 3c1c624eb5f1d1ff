"""Is the 3s/call cliff the einsum itself, or einsum+search interaction?
Usage: probe_einsum.py [alone|vol|matmulalt|f32]"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from stnls_tpu.ops.nls_warp import nls_warp_volume

mode = sys.argv[1]
B, T, F, H, W = 1, 5, 16, 128, 128
ws, wt, ps, HD = 5, 2, 3, 2
W_t = 2 * wt + 1
rng = np.random.default_rng(0)
vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
proj_w = jnp.asarray(rng.standard_normal((F, F)) / 4., jnp.float32)
flows = jnp.asarray(
    rng.standard_normal((B, HD, T, W_t - 1, 2, H, W)), jnp.float32)
CFG = dict(ws=ws, wt=wt, ps=ps, stride0=1, stride1=0.5, dist_type="l2")


def split(x):
    return x.reshape(B, T, HD, F // HD, H, W).transpose(0, 2, 1, 3, 4, 5)


def fn(v_in, fl, s):
    v_in = v_in + s
    if mode == "alone":
        q = jnp.einsum("btchw,cd->btdhw", v_in, proj_w)
        return jnp.sum(q ** 2)
    if mode == "vol":
        q = jnp.einsum("btchw,cd->btdhw", v_in, proj_w)
        k = jnp.einsum("btchw,cd->btdhw", v_in, proj_w)
    elif mode == "matmulalt":
        vt = jnp.moveaxis(v_in, 2, -1)  # [B,T,H,W,C]
        q = jnp.moveaxis(vt @ proj_w, -1, 2)
        k = jnp.moveaxis(vt @ proj_w, -1, 2)
    d, i3 = nls_warp_volume(split(q), split(k), fl, **CFG)
    return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.) ** 2)


f = jax.jit(fn)
t0 = time.perf_counter()
out = jax.block_until_ready(f(vid, flows, jnp.float32(0.)))
print(f"compile+first: {time.perf_counter()-t0:.1f}s")
n = 5
t0 = time.perf_counter()
for i in range(n):
    out = f(vid, flows, jnp.float32(1e-6 * i))
jax.block_until_ready(out)
print(f"einsum[{mode}]: steady={(time.perf_counter()-t0)/n*1e3:.2f} ms")
