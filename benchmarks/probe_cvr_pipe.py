"""Time the full NonLocalSearch pipeline with impl=cvr (MXU engine +
lazy top-K) at the headline bench config, fwd and fwd+bwd.

Usage: python benchmarks/probe_cvr_pipe.py [fwd|fwd+bwd] [tile_h tile_w
sb_r sb_c precision]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd+bwd"
    tH = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tW = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    sbr = int(sys.argv[4]) if len(sys.argv) > 4 else 12
    sbc = int(sys.argv[5]) if len(sys.argv) > 5 else 14
    prec = sys.argv[6] if len(sys.argv) > 6 else "high"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import bench
    import stnls_tpu

    B, T = 1, 5
    F, H, W = 16, 128, 128
    ws, wt = 5, 2
    ps, K, HD = 3, 10, 2
    stride0, stride1 = 1, 0.5
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)), jnp.float32)
    fflow = jnp.asarray(bench.smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(bench.smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)

    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, stride0=stride0, stride1=stride1,
        self_action="anchor", itype="float", impl="cvr",
        flow_budget=8, spread_budget=(sbr, sbc), cv_tile=(tH, tW),
        mx_precision=prec)

    def f(v, s):
        v = v + s
        flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, stride0)
        d, i = search(v, v, flows)
        return d, i

    if mode == "fwd":
        fn = jax.jit(f)
    else:
        def loss(v, s):
            d, i = f(v, s)
            return jnp.mean(d ** 2) + 1e-3 * jnp.mean(
                i.astype(jnp.float32) ** 2)
        fn = jax.jit(jax.grad(loss, argnums=0))

    t0 = time.perf_counter()
    out = fn(vid, jnp.float32(0.))
    s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0]
                        .astype(jnp.float32))
    float(s)
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        n = 5
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(vid, s + jnp.float32(1e-6 * i))
            s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0]
                                .astype(jnp.float32))
        float(s)
        ms = (time.perf_counter() - t0) / n * 1e3
        best = ms if best is None else min(best, ms)
    print(f"cvr-pipe {mode} tile=({tH},{tW}) sb=({sbr},{sbc}) {prec}: "
          f"steady={best:.1f} ms ({T / best * 1e3:.1f} fps) "
          f"compile={compile_s:.1f} s", flush=True)


if __name__ == "__main__":
    main()
