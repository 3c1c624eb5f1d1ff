"""Isolate the flow-gradient backward cost at the headline bench config.

The full bench (grads w.r.t. v AND fflow) runs ~3x slower than the
v-only composition (451 ms -> 1450 ms); these variants bracket where the
extra second goes:

  search-v      search only, grad v (dists loss)
  search-vf     search only, grad (v, flows) (dists loss)
  search-vfi    search only, grad (v, flows), loss on dists AND inds
  attn-v        full attention, grad v only
  attn-vf       full attention, grad (v, fflow)  == bench program

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/probe_flowgrad.py <variant>
  ... or `driver` to run all via subprocesses.
"""
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

VARIANTS = ["search-v", "search-vf", "search-vfi", "attn-v", "attn-vf"]


def main():
    var = sys.argv[1]
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

    def attn(v, ff):
        fl = stnls_tpu.nn.search_flow(ff, bflow, wt, stride0)
        d, i = search(v, v, fl)
        w = jax.nn.softmax(-10. * d, axis=-1)
        st = gather(v, w, i)
        Bs, HDs, Ks, Ts, Fs, Hs, Ws = st.shape
        st = jnp.transpose(st, (0, 3, 2, 1, 4, 5, 6)) \
            .reshape(Bs, Ts, Ks, HDs * Fs, Hs, Ws)
        return jnp.einsum("btkchw,kcd->btdhw", st, stack_w)

    def srch(v, ff, with_inds):
        fl = stnls_tpu.nn.search_flow(ff, bflow, wt, stride0)
        d, i = search(v, v, fl)
        d = jnp.where(jnp.isfinite(d), d, 0.)
        out = jnp.mean(d ** 2)
        if with_inds:
            out = out + 1e-3 * jnp.mean(i ** 2)
        return out

    if var == "search-v":
        fn = jax.jit(jax.grad(lambda v, ff: srch(v, ff, False), argnums=0))
    elif var == "search-vf":
        fn = jax.jit(jax.grad(lambda v, ff: srch(v, ff, False),
                              argnums=(0, 1)))
    elif var == "search-vfi":
        fn = jax.jit(jax.grad(lambda v, ff: srch(v, ff, True),
                              argnums=(0, 1)))
    elif var == "attn-v":
        fn = jax.jit(jax.grad(
            lambda v, ff: jnp.mean(attn(v, ff) ** 2), argnums=0))
    elif var == "attn-vf":
        fn = jax.jit(jax.grad(
            lambda v, ff: jnp.mean(attn(v, ff) ** 2), argnums=(0, 1)))
    else:
        raise SystemExit(f"unknown variant {var}")

    t0 = time.perf_counter()
    out = fn(vid, fflow)
    s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0])
    float(s)
    print(f"{var} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(vid + s, fflow)
        s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0])
    float(s)
    print(f"{var}: steady={(time.perf_counter()-t0)/n*1e3:.2f} ms")


if __name__ == "__main__":
    if sys.argv[1:] == ["driver"] or not sys.argv[1:]:
        import os
        env = dict(os.environ)
        for v in VARIANTS:
            subprocess.run([sys.executable, __file__, v], env=env)
    else:
        main()
