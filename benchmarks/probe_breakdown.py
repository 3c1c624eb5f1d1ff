"""Per-stage timing of the headline bench (bench.py config): search,
gather, search_flow, projection einsums — each stage in its own process
(axon degrades the second executable in one process; run one stage per
invocation).

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/probe_breakdown.py <stage> [fwd|fwd+bwd]
  stage in {search, gather, flow, proj, attn}
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "search"
    mode = sys.argv[2] if len(sys.argv) > 2 else "fwd+bwd"
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
    FLOW_BUDGET, SPREAD_BUDGET = 8, (12, 14)
    AGG_BUDGET, AGG_SPREAD = 12, (16, 20)

    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)), jnp.float32)
    proj_w = jnp.asarray(rng.standard_normal((HD * F, HD * F)) / 4.,
                         jnp.float32)
    stack_w = jnp.asarray(rng.standard_normal((K, HD * F, HD * F)) / 8.,
                          jnp.float32)
    fflow = jnp.asarray(bench.smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(bench.smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)

    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, stride0=stride0, stride1=stride1,
        self_action="anchor", itype="float",
        flow_budget=FLOW_BUDGET, spread_budget=SPREAD_BUDGET)
    gather = stnls_tpu.agg.NonLocalGather(
        ps=ps, stride0=stride0, budget=AGG_BUDGET, spread=AGG_SPREAD,
        wt_hint=2 * wt)

    flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, stride0)
    d0, f0 = jax.jit(lambda v: search(v, v, flows))(vid)
    w0 = jax.nn.softmax(-10. * d0, axis=-1)

    if stage == "search":
        def f(v, s):
            d, i = search(v + s, v, flows)
            return d, i
    elif stage == "gather":
        def f(v, s):
            st = gather(v + s, w0, f0)
            return st
    elif stage == "flow":
        def f(v, s):
            return stnls_tpu.nn.search_flow(fflow + s, bflow, wt, stride0)
    elif stage == "proj":
        def f(v, s):
            q = jnp.einsum("btchw,cd->btdhw", v + s, proj_w)
            return q
    elif stage == "attn":
        def f(v, s):
            v = v + s
            q = jnp.einsum("btchw,cd->btdhw", v, proj_w)
            fl = stnls_tpu.nn.search_flow(fflow, bflow, wt, stride0)
            d, i = search(q, q, fl)
            w = jax.nn.softmax(-10. * d, axis=-1)
            st = gather(q, w, i)
            Bs, HDs, Ks, Ts, Fs, Hs, Ws = st.shape
            st = jnp.transpose(st, (0, 3, 2, 1, 4, 5, 6)) \
                .reshape(Bs, Ts, Ks, HDs * Fs, Hs, Ws)
            return jnp.einsum("btkchw,kcd->btdhw", st, stack_w)
    else:
        raise SystemExit(f"unknown stage {stage}")

    if mode == "fwd":
        fn = jax.jit(lambda v, s: f(v, s))
    else:
        def loss(v, s):
            out = f(v, s)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.mean(x.astype(jnp.float32) ** 2) for x in leaves)
        fn = jax.jit(jax.grad(loss, argnums=0))

    t0 = time.perf_counter()
    out = fn(vid, jnp.float32(0.))
    s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0])
    float(s)
    print(f"{stage} {mode} compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(vid, s + jnp.float32(1e-6 * i))
        s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0])
    float(s)
    print(f"{stage} {mode}: steady={(time.perf_counter()-t0)/n*1e3:.2f} ms")


if __name__ == "__main__":
    main()
