"""Round-4 stage breakdown at the headline config, PALLAS engine (the
real auto route on TPU — probe_r3_stages timed cvr).

Times each stage separately with data-chained sync (axon quirk: only
device->host transfers synchronize).

Usage: python -u benchmarks/probe_r4_stages.py [stage ...]
  stages: volume, search, searchbwd, gather, flow, attn  (default: all)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

STAGES = sys.argv[1:] or ["volume", "search", "searchbwd", "gather",
                          "flow", "attn"]


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

    def timed(name, fn, *args, n=5):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(sum(jnp.sum(x) * 1e-30
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
        return out

    flow_fn = jax.jit(lambda f, b: stnls_tpu.nn.search_flow(f, b, wt,
                                                            stride0))
    flows = flow_fn(fflow, bflow)
    if "flow" in STAGES:
        timed("search_flow fwd", flow_fn, fflow, bflow)

    # resolve budgets like bench.py does (eager warm-up)
    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, stride0=stride0, stride1=stride1,
        self_action="anchor", itype="float",
        flow_budget="auto", spread_budget="auto")
    d0, i0 = search(vid, vid, flows)
    FLOW_BUDGET, SPREAD_BUDGET = search._resolved
    log(f"resolved budgets: flow={FLOW_BUDGET} spread={SPREAD_BUDGET}")

    from stnls_tpu.search.utils import shape_vids, shape_flows
    v6 = shape_vids(HD, [vid])[0]
    f6 = shape_flows(HD, flows)

    if "volume" in STAGES:
        from stnls_tpu.ops.nls_pallas import nls_pallas_volume

        def vol_only(v, f):
            d, aux, outl = nls_pallas_volume(
                v, v, f, ws=ws, wt=wt, ps=ps, stride0=stride0,
                stride1=stride1, dist_type="l2",
                flow_budget=FLOW_BUDGET, spread_budget=SPREAD_BUDGET,
                return_aux=True)
            return d
        timed("pallas volume fwd (kernel+layout)", jax.jit(vol_only),
              v6, f6)

        def vol_topk(v, f):
            d, aux, outl = nls_pallas_volume(
                v, v, f, ws=ws, wt=wt, ps=ps, stride0=stride0,
                stride1=stride1, dist_type="l2",
                flow_budget=FLOW_BUDGET, spread_budget=SPREAD_BUDGET,
                return_aux=True)
            from stnls_tpu.search.non_local_search import _pallas_topk_aux
            return _pallas_topk_aux(d, aux, self_action="anchor", k=K,
                                    dist_type="l2")
        timed("pallas volume + topk fwd", jax.jit(vol_topk), v6, f6)

    sfn = jax.jit(lambda v, f: search(v, v, f))
    if "search" in STAGES:
        timed("search fwd (module)", sfn, vid, flows)

    if "searchbwd" in STAGES:
        def sloss(v, f):
            dd, ii = search(v, v, f)
            return jnp.sum(dd * dd) + jnp.sum(ii * ii)
        timed("search fwd+bwd", jax.jit(jax.grad(sloss, argnums=(0, 1))),
              vid, flows)

    if "gather" in STAGES:
        gather = stnls_tpu.agg.NonLocalGather(
            ps=ps, stride0=stride0, budget="auto", spread="auto",
            wt_hint=2 * wt)
        w0 = jax.nn.softmax(-10. * d0, axis=-1)
        _ = gather(v6, w0, i0)
        log(f"gather resolved: {gather._resolved}")
        timed("gather fwd", jax.jit(lambda v, w_, i_: gather(v, w_, i_)),
              v6, w0, i0)

        def gloss(v, w_, i_):
            return jnp.sum(gather(v, w_, i_) ** 2)
        timed("gather fwd+bwd",
              jax.jit(jax.grad(gloss, argnums=(0, 1))), v6, w0, i0)

    if "attn" in STAGES:
        from bench import build
        T_, args, attn, loss = build()
        timed("attn fwd", jax.jit(attn), *args, jnp.float32(0.))
        timed("attn fwd+bwd",
              jax.jit(jax.grad(loss, argnums=(0, 1))),
              *args, jnp.float32(0.))


if __name__ == "__main__":
    main()
