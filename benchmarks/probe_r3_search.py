"""Search-only timing at the bench config: pallas fwd / fwd+bwd, plus a
trivial jit to estimate axon dispatch overhead.

Usage: python -u benchmarks/probe_r3_search.py [impl] [grad]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

IMPL = sys.argv[1] if len(sys.argv) > 1 else "pallas"
GRAD = sys.argv[2] if len(sys.argv) > 2 else "dense"


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

    def timed(name, fn, *args, reps=10):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(sum(jnp.sum(x) * 1e-30
                      for x in jax.tree_util.tree_leaves(out)))
        t1 = time.perf_counter()
        t2 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(sum(jnp.sum(x) * 1e-30 for x in jax.tree_util.tree_leaves(out)))
        t3 = time.perf_counter()
        log(f"{name}: compile+first={t1-t0:.1f}s steady={(t3-t2)/reps*1000:.2f}ms")
        return out

    # dispatch overhead estimate
    triv = jax.jit(lambda x: x * 2. + 1.)
    timed("trivial jit (dispatch overhead)", triv, vid, reps=20)

    flow_fn = jax.jit(lambda f, b: stnls_tpu.nn.search_flow(f, b, wt, stride0))
    flows = timed("search_flow fwd", flow_fn, fflow, bflow, reps=20)

    FLOW_BUDGET, SPREAD_BUDGET = 8, (12, 14)
    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, stride0=stride0, stride1=stride1,
        self_action="anchor", itype="float", impl=IMPL, grad=GRAD,
        flow_budget=FLOW_BUDGET, spread_budget=SPREAD_BUDGET)
    sfn = jax.jit(lambda v, f: search(v, v, f))
    timed(f"search {IMPL} fwd", sfn, vid, flows)

    def sloss(v, f):
        dd, ii = search(v, v, f)
        return jnp.sum(dd * dd) + jnp.sum(ii * ii)
    gfn = jax.jit(jax.grad(sloss, argnums=(0, 1)))
    timed(f"search {IMPL} fwd+bwd ({GRAD})", gfn, vid, flows)


if __name__ == "__main__":
    main()
