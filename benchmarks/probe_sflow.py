"""Why is search_flow 22ms at 128^2? Isolate: scan vs unrolled, gather cost.

Usage: python -u benchmarks/probe_sflow.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import stnls_tpu
    from bench import smooth_flows

    B, T, H, W = 1, 5, 128, 128
    wt, stride0 = 2, 1
    rng = np.random.default_rng(0)
    fflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)

    def timed(name, fn, *args, reps=30):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        t2 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        t3 = time.perf_counter()
        log(f"{name}: first={t1-t0:.1f}s steady={(t3-t2)/reps*1000:.2f}ms")
        return out

    sf = jax.jit(lambda f, b: stnls_tpu.nn.search_flow(f, b, wt, stride0))
    timed("search_flow (current scan)", sf, fflow, bflow)

    # single _sample_flow call cost
    from stnls_tpu.ops.flow_ops import _sample_flow
    h = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[None, None, :, None]
                         + 0.3, (B, T, H, W))
    w = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, None, None, :]
                         + 0.3, (B, T, H, W))
    samp = jax.jit(lambda f, hh, ww: _sample_flow(f, hh, ww, H, W))
    timed("one _sample_flow (8 flat takes)", samp, fflow, h, w)

    # one flat take
    flat = fflow.reshape(-1)
    idx = jnp.arange(B * T * H * W, dtype=jnp.int32) % flat.shape[0]
    tk = jax.jit(lambda fl, ix: jnp.take(fl, ix, mode="clip"))
    timed("one flat take (82k)", tk, flat, idx)

    # dynamic_slice-free interp: roll-based 4-corner sample (integer grid
    # aligned queries): is the cost the gather or the weights?
    def roll_interp(f):
        return (f + jnp.roll(f, 1, axis=-1) + jnp.roll(f, 1, axis=-2)
                + jnp.roll(jnp.roll(f, 1, axis=-1), 1, axis=-2)) * 0.25
    timed("roll-based 4-corner (no gather)", jax.jit(roll_interp), fflow)


if __name__ == "__main__":
    main()
