"""Bisect the fwd+bwd cost: time jax.grad of each pipeline prefix."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import stnls_tpu
from stnls_tpu.ops.nls_warp import nls_warp_volume
from stnls_tpu.ops import anchor as anchor_ops
from stnls_tpu.ops import topk as topk_ops

B, T, F, H, W = 1, 5, 16, 128, 128
ws, wt, ps, K, HD = 5, 2, 3, 10, 2
W_t = 2 * wt + 1
rng = np.random.default_rng(0)
vid0 = jnp.asarray(rng.standard_normal((B, HD, T, F // 1, H, W)), jnp.float32)
vid1 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
flows = jnp.asarray(rng.standard_normal((B, HD, T, W_t - 1, 2, H, W)),
                    jnp.float32)
CFG = dict(ws=ws, wt=wt, ps=ps, stride0=1, stride1=0.5, dist_type="l2")


def vol_only(v0, v1, fl, s):
    d, i3 = nls_warp_volume(v0 + s, v1, fl, **CFG)
    return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.) ** 2) \
        + 1e-3 * jnp.sum(i3[1:] ** 2)


def vol_anchor(v0, v1, fl, s):
    d, i3 = nls_warp_volume(v0 + s, v1, fl, **CFG)
    Q = T * H * W
    d = jnp.transpose(d, (0, 1, 2, 6, 7, 3, 4, 5)).reshape(B, HD, Q, -1)
    i3 = jnp.transpose(i3, (0, 1, 2, 3, 7, 8, 4, 5, 6)).reshape(3, B, HD, Q, -1)
    d, i3, _ = anchor_ops.anchor_self(d, i3)
    return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.) ** 2) \
        + 1e-3 * jnp.sum(i3[1:] ** 2)


def vol_topk(v0, v1, fl, s):
    d, i3 = nls_warp_volume(v0 + s, v1, fl, **CFG)
    Q = T * H * W
    d = jnp.transpose(d, (0, 1, 2, 6, 7, 3, 4, 5)).reshape(B, HD, Q, -1)
    i3 = jnp.transpose(i3, (0, 1, 2, 3, 7, 8, 4, 5, 6)).reshape(3, B, HD, Q, -1)
    d, i3, _ = anchor_ops.anchor_self(d, i3)
    d, i3 = topk_ops.topk(d, i3, K, False, anchor=True)
    return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.) ** 2) \
        + 1e-3 * jnp.sum(i3[1:] ** 2)


def timeit(f, n=3):
    out = jax.block_until_ready(f(vid0, vid1, flows, jnp.float32(0.)))
    t0 = time.perf_counter()
    for i in range(n):
        out = f(vid0, vid1, flows, jnp.float32(1e-6 * i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


for name, fn in [("volume only", vol_only), ("vol+anchor", vol_anchor),
                 ("vol+anchor+topk", vol_topk)]:
    t0 = time.perf_counter()
    f = jax.jit(jax.grad(fn, (0, 1, 2)))
    dt = timeit(f)
    print(f"grad {name}: steady={dt*1e3:.1f} ms "
          f"(compile+3 iters took {time.perf_counter()-t0:.0f}s)")
