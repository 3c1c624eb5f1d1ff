"""Round-3 engine/grad-path shootout at the headline bench config.

Usage: python benchmarks/probe_r3.py <mode>
  modes: fwd_cvr, fwd_pallas, fwdbwd_pallas, fwdbwd_sparse, fwdbwd_cvr

Each mode runs the full attention pipeline (search -> softmax -> gather ->
stack conv) at the README config (128^2, T=5, ws=5, wt=2, ps=3, K=10,
HD=2, stride1=0.5) and prints fps + compile_s as one JSON line.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "fwd_cvr"


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
    proj_w = jnp.asarray(rng.standard_normal((F, F)) / 4., jnp.float32)
    stack_w = jnp.asarray(rng.standard_normal((K, F, F)) / 8., jnp.float32)
    fflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)

    FLOW_BUDGET, SPREAD_BUDGET = 8, (12, 14)
    AGG_BUDGET, AGG_SPREAD = 12, (16, 20)

    impl = {"fwd_cvr": "cvr", "fwdbwd_cvr": "cvr",
            "fwd_pallas": "pallas", "fwdbwd_pallas": "pallas",
            "fwdbwd_sparse": "pallas"}[MODE]
    grad = "sparse_k" if MODE == "fwdbwd_sparse" else "dense"

    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, stride0=stride0, stride1=stride1,
        self_action="anchor", itype="float", impl=impl, grad=grad,
        flow_budget=FLOW_BUDGET, spread_budget=SPREAD_BUDGET)
    gather = stnls_tpu.agg.NonLocalGather(
        ps=ps, stride0=stride0, budget=AGG_BUDGET, spread=AGG_SPREAD,
        wt_hint=2 * wt)

    def attn(v_in, fflow, bflow, s):
        v_in = v_in + s
        q = jnp.einsum("btchw,cd->btdhw", v_in, proj_w)
        k = jnp.einsum("btchw,cd->btdhw", v_in, proj_w)
        v = jnp.einsum("btchw,cd->btdhw", v_in, proj_w)
        flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, stride0)
        dists, srch_flows = search(q, k, flows)
        weights = jax.nn.softmax(-10. * dists, axis=-1)
        stack = gather(v, weights, srch_flows)
        Bs, HDs, Ks, Ts, Fs, Hs, Ws = stack.shape
        stack = jnp.transpose(stack, (0, 3, 2, 1, 4, 5, 6)) \
            .reshape(Bs, Ts, Ks, HDs * Fs, Hs, Ws)
        return jnp.einsum("btkchw,kcd->btdhw", stack, stack_w)

    def loss(v_in, fflow, bflow, s):
        return jnp.mean(attn(v_in, fflow, bflow, s) ** 2)

    if MODE.startswith("fwdbwd"):
        fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    else:
        fn = jax.jit(attn)

    def chain(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return 1e-30 * jnp.sum(leaf)

    args = (vid, fflow, bflow)
    t0 = time.perf_counter()
    out = fn(*args, jnp.float32(0.))
    s = chain(out)
    float(s)
    compile_s = time.perf_counter() - t0

    n_iter, n_win = 5, 3
    win = []
    for _ in range(n_win):
        t0 = time.perf_counter()
        for i in range(n_iter):
            out = fn(*args, s + jnp.float32(1e-6 * i))
            s = chain(out)
        float(s)
        win.append((time.perf_counter() - t0) / n_iter)
    fps = [round(T / dt, 2) for dt in win]
    print(json.dumps({"mode": MODE, "fps": fps, "best": max(fps),
                      "compile_s": round(compile_s, 1)}))


if __name__ == "__main__":
    main()
