"""Engine shoot-out at the headline bench config: time each search /
gather engine fwd or fwd+bwd, one (engine, mode) per process (axon
degrades the second executable in one process).

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site python \
      benchmarks/probe_engines.py <target> [fwd|fwd+bwd]
  target in {search-warp, search-cvr-sweep, search-cvr-mx, search-pallas,
             gather-jnp, gather-pallas}
  ... or `driver` to run the full sweep via subprocesses.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B, T = 1, 5
F, H, W = 16, 128, 128
ws, wt = 5, 2
ps, K, HD = 3, 10, 2
stride0, stride1 = 1, 0.5


def build(target):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import bench
    import stnls_tpu
    from stnls_tpu.search.utils import shape_vids, shape_flows
    from stnls_tpu.search.non_local_search import _self_action_topk

    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)), jnp.float32)
    fflow = jnp.asarray(bench.smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(bench.smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, stride0)

    if target.startswith("search"):
        impl = target.split("-", 1)[1]

        def f(v, s):
            v = v + s
            if impl == "warp":
                from stnls_tpu.ops.nls_warp import nls_warp_volume
                v6 = shape_vids(HD, [v])[0]
                fl = shape_flows(HD, flows)
                d, i3 = nls_warp_volume(
                    v6, v6, fl, ws=ws, wt=wt, ps=ps, stride0=stride0,
                    stride1=stride1, dist_type="l2")
                d, i = _self_action_topk(d, i3, self_action="anchor",
                                         topk_mode="all", k=K, wt=wt,
                                         dist_type="l2")
            elif impl.startswith("cvr"):
                from stnls_tpu.ops.nls_cvr import nls_cvr_volume
                v6 = shape_vids(HD, [v])[0]
                fl = shape_flows(HD, flows)
                eng = "mx" if impl.endswith("mx") else "sweep"
                d, i3, outl = nls_cvr_volume(
                    v6, v6, fl, ws=ws, wt=wt, ps=ps, stride0=stride0,
                    stride1=stride1, dist_type="l2", itype="float",
                    flow_budget=8, spread_budget=12, tile=(8, 16),
                    engine=eng)
                d, i = _self_action_topk(d, i3, self_action="anchor",
                                         topk_mode="all", k=K, wt=wt,
                                         dist_type="l2")
            else:
                search = stnls_tpu.search.NonLocalSearch(
                    ws, wt, ps, K, nheads=HD, stride0=stride0,
                    stride1=stride1, self_action="anchor", itype="float",
                    flow_budget=8, spread_budget=(12, 14))
                d, i = search(v, v, flows)
            return d, i
    else:
        impl = target.split("-", 1)[1]
        gather = stnls_tpu.agg.NonLocalGather(
            ps=ps, stride0=stride0, impl=impl,
            budget=12, spread=(16, 20), wt_hint=2 * wt)
        search = stnls_tpu.search.NonLocalSearch(
            ws, wt, ps, K, nheads=HD, stride0=stride0, stride1=stride1,
            self_action="anchor", itype="float",
            flow_budget=8, spread_budget=(12, 14))
        d0, f0 = jax.jit(lambda v: search(v, v, flows))(vid)
        w0 = jax.nn.softmax(-10. * d0, axis=-1)
        w0 = jax.block_until_ready(w0)

        def f(v, s):
            return gather(v + s, w0, f0)

    return f, vid


def run_one(target, mode):
    import jax
    import jax.numpy as jnp
    f, vid = build(target)
    if mode == "fwd":
        fn = jax.jit(f)
    else:
        def loss(v, s):
            out = f(v, s)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.mean(x.astype(jnp.float32) ** 2) for x in leaves)
        fn = jax.jit(jax.grad(loss, argnums=0))

    t0 = time.perf_counter()
    out = fn(vid, jnp.float32(0.))
    s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0]
                        .astype(jnp.float32))
    float(s)
    compile_s = time.perf_counter() - t0
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(vid, s + jnp.float32(1e-6 * i))
        s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0]
                            .astype(jnp.float32))
    float(s)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(json.dumps({"target": target, "mode": mode,
                      "steady_ms": round(ms, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)


def driver(targets, modes):
    env = dict(os.environ)
    for tgt in targets:
        for mode in modes:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), tgt, mode],
                env=env, capture_output=True, text=True, timeout=1800)
            for ln in p.stdout.splitlines():
                if ln.startswith("{"):
                    print(ln, flush=True)
            if p.returncode != 0:
                err = p.stderr.strip().splitlines()
                print(json.dumps({"target": tgt, "mode": mode,
                                  "error": err[-1] if err else "?"}),
                      flush=True)


if __name__ == "__main__":
    a = sys.argv[1] if len(sys.argv) > 1 else "driver"
    mode = sys.argv[2] if len(sys.argv) > 2 else "fwd+bwd"
    if a == "driver":
        tg = sys.argv[2].split(",") if len(sys.argv) > 2 else \
            ["search-warp", "gather-jnp"]
        md = sys.argv[3].split(",") if len(sys.argv) > 3 else \
            ["fwd", "fwd+bwd"]
        driver(tg, md)
    else:
        run_one(a, mode)
