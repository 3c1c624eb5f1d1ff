"""Time the cvr (MXU correlation-volume) engine at the headline bench
config, fwd and fwd+bwd — comparison point for the fused Pallas kernel.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/probe_cvr_bench.py [fwd|fwd+bwd]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd+bwd"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import bench
    import stnls_tpu
    from stnls_tpu.search.utils import shape_vids, shape_flows
    from stnls_tpu.ops.nls_cvr import nls_cvr_volume
    from stnls_tpu.search.non_local_search import _self_action_topk

    B, T = 1, 5
    F, H, W = 16, 128, 128
    ws, wt = 5, 2
    ps, K, HD = 3, 10, 2
    stride0, stride1 = 1, 0.5
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)), jnp.float32)
    fflow = jnp.asarray(bench.smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(bench.smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)

    def search_fn(v, s):
        v = v + s
        flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, stride0)
        v6 = shape_vids(HD, [v])[0]
        fl = shape_flows(HD, flows)
        d, i3, outl = nls_cvr_volume(
            v6, v6, fl, ws=ws, wt=wt, ps=ps, stride0=stride0,
            stride1=stride1, dist_type="l2", itype="float", flow_budget=8,
            spread_budget=12, tile=(8, 128))
        d, i = _self_action_topk(d, i3, self_action="anchor",
                                 topk_mode="all", k=K, wt=wt,
                                 dist_type="l2")
        return d, i

    def loss(v, s):
        d, i = search_fn(v, s)
        return jnp.mean(d ** 2) + 1e-6 * jnp.mean(i ** 2)

    if mode == "fwd":
        fn = jax.jit(lambda v, s: search_fn(v, s)[0])
    else:
        fn = jax.jit(jax.grad(loss, argnums=0))

    t0 = time.perf_counter()
    out = fn(vid, jnp.float32(0.))
    s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0])
    float(s)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(vid, s + jnp.float32(1e-6 * i))
        s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0])
    float(s)
    print(f"cvr search {mode}: steady={(time.perf_counter()-t0)/n*1e3:.2f} ms")


if __name__ == "__main__":
    main()
