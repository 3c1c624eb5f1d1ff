"""Bisect the fused Pallas search FORWARD kernel cost by stage at the
headline bench config: where do the ~165 ms go?

  vol-full        nls_pallas_volume, complete kernel
  vol-nopred      same without the activity-bit predication
  vol-prodonly    sweep without the one-hot selection (_stage knob;
                  wrong results, perf bisect only)
  vol-skipfori    kernel without the dense sweep at all (DMA + phase
                  images + X fields + assembly)
  pipe            volume + lazy top-K (what NonLocalSearch runs)

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/probe_kstage.py <variant>    (or `driver`)
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

VARIANTS = ["vol-full", "vol-nopred", "vol-prodonly", "vol-skipfori", "pipe"]


def main():
    var = sys.argv[1]
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import bench
    import stnls_tpu
    from stnls_tpu.ops.nls_pallas import nls_pallas_volume
    from stnls_tpu.search.utils import shape_vids, shape_flows
    from stnls_tpu.search.non_local_search import _pallas_topk_aux

    B, T = 1, 5
    F, H, W = 16, 128, 128
    ws, wt = 5, 2
    ps, K, HD = 3, 10, 2
    stride0, stride1 = 1, 0.5
    FLOW_BUDGET, SPREAD_BUDGET = 8, (12, 14)

    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)), jnp.float32)
    fflow = jnp.asarray(bench.smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(bench.smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, stride0)
    v6 = shape_vids(HD, [vid])[0]
    fl = shape_flows(HD, flows)

    kw = dict(ws=ws, wt=wt, ps=ps, stride0=stride0, stride1=stride1,
              dist_type="l2", itype="float", flow_budget=FLOW_BUDGET,
              spread_budget=SPREAD_BUDGET)

    if var.startswith("vol"):
        stage = {"vol-full": "full", "vol-nopred": "full",
                 "vol-prodonly": "prodonly",
                 "vol-skipfori": "skipfori"}[var]
        pred = var != "vol-nopred"

        def f(v, s):
            d, i3, outl = nls_pallas_volume(
                v + s, v, fl, _stage=stage, predicate=pred, **kw)
            return d
    else:
        def f(v, s):
            d, aux, outl = nls_pallas_volume(v + s, v, fl,
                                             return_aux=True, **kw)
            dk, ik = _pallas_topk_aux(d, aux, self_action="anchor", k=K,
                                      dist_type="l2")
            return dk, ik

    fn = jax.jit(f)
    t0 = time.perf_counter()
    out = fn(v6, jnp.float32(0.))
    s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0])
    float(s)
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        n = 5
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(v6, s + jnp.float32(1e-6 * i))
            s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0])
        float(s)
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    print(json.dumps({"variant": var, "steady_ms": round(best * 1e3, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    if sys.argv[1:] == ["driver"] or not sys.argv[1:]:
        env = dict(os.environ)
        for v in VARIANTS:
            p = subprocess.run([sys.executable, __file__, v], env=env,
                               capture_output=True, text=True, timeout=1800)
            for ln in p.stdout.splitlines():
                if ln.startswith("{"):
                    print(ln, flush=True)
            if p.returncode != 0:
                err = p.stderr.strip().splitlines()
                print(json.dumps({"variant": v,
                                  "error": err[-1] if err else "?"}),
                      flush=True)
    else:
        main()
