"""Round-5 agg-family probe: the new fused Pallas ScatterAdd / Pool
kernels vs the jnp engines and the Pallas gather baseline, at the
headline bench config (VERDICT r4 #4: jnp scatter_add measured
353.5/747.7 ms, pool 148.4/429.6 ms vs gather 47.1/103.1 ms).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_r5_agg_family.py
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
    from stnls_tpu.search.utils import shape_vids
    from bench import smooth_flows

    B, T = 1, 5
    F, H, W = 16, 128, 128
    ws, wt = 5, 2
    ps, K, HD = 3, 10, 2

    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    fflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, 1)
    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, self_action="anchor", itype="float",
        flow_budget=16, spread_budget=16)
    d0, i0 = search(vid, vid, flows)
    v6 = shape_vids(HD, [vid])[0]
    w0 = jax.nn.softmax(-10. * d0, axis=-1)

    def timed(name, fn, *args, n=5):
        t0 = time.perf_counter()
        out = fn(*args)
        float(sum(jnp.sum(x) * 1e-30
                  for x in jax.tree_util.tree_leaves(out)
                  if jnp.issubdtype(x.dtype, jnp.floating)))
        t1 = time.perf_counter()
        t2 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(sum(jnp.sum(x) * 1e-30
                  for x in jax.tree_util.tree_leaves(out)
                  if jnp.issubdtype(x.dtype, jnp.floating)))
        t3 = time.perf_counter()
        log(f"{name}: compile+first={t1-t0:.1f}s "
            f"steady={(t3-t2)/n*1000:.1f}ms")

    which = sys.argv[1:] or ["scatter_add", "pool"]

    if "scatter_add" in which:
        sadd = stnls_tpu.agg.NonLocalScatterAdd(
            ps=ps, strideIn=1, strideOut=1, impl="pallas", budget=12,
            spread=(20, 16), wt_hint=2 * wt)
        timed("scatter_add (pallas) fwd",
              jax.jit(lambda v, w_, i_: sadd(v, w_, i_)), v6, w0, i0)
        timed("scatter_add (pallas) fwd+bwd",
              jax.jit(jax.grad(
                  lambda v, w_, i_: jnp.sum(sadd(v, w_, i_) ** 2),
                  argnums=(0, 1))), v6, w0, i0)

    if "pool" in which:
        pool = stnls_tpu.agg.PooledPatchSum(
            ps=ps, stride0=1, impl="pallas", budget=12,
            spread=(20, 16), wt_hint=2 * wt)
        timed("pool (pallas) fwd",
              jax.jit(lambda v, w_, i_: pool(v, w_, i_)), v6, w0, i0)
        timed("pool (pallas) fwd+bwd",
              jax.jit(jax.grad(
                  lambda v, w_, i_: jnp.sum(pool(v, w_, i_) ** 2),
                  argnums=(0, 1))), v6, w0, i0)

    if "gather4" in which:
        # the reference default workload: ps=7, stride0=4
        nH = H // 4
        w4 = jax.nn.softmax(np.float32(
            rng.random((B, HD, T, nH, nH, K))), axis=-1)
        i4 = jnp.asarray(np.round(np.asarray(
            i0[:, :, :, ::4, ::4])), jnp.float32)
        g4 = stnls_tpu.agg.NonLocalGather(
            ps=7, stride0=4, itype="int", impl="pallas", budget=12,
            spread=(20, 16), wt_hint=2 * wt)
        timed("gather ps7/s0=4 (pallas) fwd",
              jax.jit(lambda v, w_, i_: g4(v, w_, i_)), v6,
              jnp.asarray(w4), i4)


if __name__ == "__main__":
    main()
