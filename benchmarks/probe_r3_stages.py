"""Stage-by-stage compile/run timing at the bench config (unbuffered).

Usage: python -u benchmarks/probe_r3_stages.py [stage ...]
  stages: flow, search, gather, all  (default: flow search gather)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

STAGES = sys.argv[1:] or ["flow", "search", "gather"]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import stnls_tpu
    from bench import smooth_flows

    B, T = 1, 5
    F, H, W = 16, 128, 128
    ws, wt = 5, 2
    ps, K, HD = 3, 10, 2
    stride0, stride1 = 1, 0.5

    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    fflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    log(f"devices: {jax.devices()}")

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(sum(jnp.sum(x) * 1e-30 for x in jax.tree_util.tree_leaves(out)))
        t1 = time.perf_counter()
        # steady-state
        t2 = time.perf_counter()
        for _ in range(3):
            out = fn(*args)
        float(sum(jnp.sum(x) * 1e-30 for x in jax.tree_util.tree_leaves(out)))
        t3 = time.perf_counter()
        log(f"{name}: compile+first={t1-t0:.1f}s steady={(t3-t2)/3*1000:.1f}ms")
        return out

    flows = None
    if "flow" in STAGES or "search" in STAGES or "gather" in STAGES:
        flow_fn = jax.jit(lambda f, b: stnls_tpu.nn.search_flow(f, b, wt, stride0))
        flows = timed("search_flow fwd", flow_fn, fflow, bflow)

    FLOW_BUDGET, SPREAD_BUDGET = 8, (12, 14)
    if "search" in STAGES:
        search = stnls_tpu.search.NonLocalSearch(
            ws, wt, ps, K, nheads=HD, stride0=stride0, stride1=stride1,
            self_action="anchor", itype="float", impl="cvr", grad="dense",
            flow_budget=FLOW_BUDGET, spread_budget=SPREAD_BUDGET)
        sfn = jax.jit(lambda v, f: search(v, v, f))
        d, i = timed("search cvr fwd", sfn, vid, flows)

        def sloss(v, f):
            dd, ii = search(v, v, f)
            return jnp.sum(dd * dd) + jnp.sum(ii * ii)
        gfn = jax.jit(jax.grad(sloss, argnums=(0, 1)))
        timed("search cvr fwd+bwd", gfn, vid, flows)

    if "gather" in STAGES:
        if "search" not in STAGES:
            search = stnls_tpu.search.NonLocalSearch(
                ws, wt, ps, K, nheads=HD, stride0=stride0, stride1=stride1,
                self_action="anchor", itype="float", impl="cvr", grad="dense",
                flow_budget=FLOW_BUDGET, spread_budget=SPREAD_BUDGET)
            sfn = jax.jit(lambda v, f: search(v, v, f))
            d, i = sfn(vid, flows)
        AGG_BUDGET, AGG_SPREAD = 12, (16, 20)
        gather = stnls_tpu.agg.NonLocalGather(
            ps=ps, stride0=stride0, budget=AGG_BUDGET, spread=AGG_SPREAD,
            wt_hint=2 * wt)
        w = jax.nn.softmax(-10. * d, axis=-1)
        gfn2 = jax.jit(lambda v, w_, i_: gather(v, w_, i_))
        timed("gather fwd", gfn2, vid, w, i)

        def gloss(v, w_, i_):
            return jnp.sum(gather(v, w_, i_) ** 2)
        ggrad = jax.jit(jax.grad(gloss, argnums=(0, 1, 2)))
        timed("gather fwd+bwd", ggrad, vid, w, i)


if __name__ == "__main__":
    main()
