"""Round-5 1080p banding experiment: full-width auto bands saturate the
per-tile column-shift union (a 16x1920-query tile needs nearly the whole
spread window live, so joint activity bits ~= the marginal product and
the r5 sweep-shrinking wins vanish at 1080p). Narrow column bands shrink
the per-tile spread -> fewer live sweep combos per query, at the price
of more band iterations.

Variants (config_5 workload: T=10 wt=3 ps=1 K=10 HD=2 1080x1920, F=4):
  A. auto banding, spread (12, 16)   [the RESULTS_r05 row]
  B. qchunk=(72, 384), spread auto   [5 col bands, resolution re-validates]
  C. qchunk=(72, 240), spread auto

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_r5_1080p.py [A|B|C]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main(variant):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import stnls_tpu
    from bench import smooth_flows

    B, T, F, H, W = 1, 10, 4, 1080, 1920
    ws, wt, ps, K, HD = 5, 3, 1, 10, 2
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    fflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W), amp=3.0),
                        jnp.float32)
    bflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W), amp=3.0),
                        jnp.float32)

    kw = dict(nheads=HD, self_action="anchor", itype="float",
              flow_budget=16, band_dtype="float16")
    if variant == "A":
        kw.update(spread_budget=(12, 16))
    elif variant == "B":
        kw.update(spread_budget="auto", qchunk=(72, 384))
    elif variant == "C":
        kw.update(spread_budget="auto", qchunk=(72, 240))
    search = stnls_tpu.search.NonLocalSearch(ws, wt, ps, K, **kw)

    # eager warm-up resolves auto budgets on the real data
    t0 = time.perf_counter()
    d, i = search(vid, vid, fflow, bflow)
    float(jnp.sum(d[..., :1]) * 1e-30)
    log(f"variant {variant}: eager warm-up {time.perf_counter()-t0:.1f}s "
        f"resolved={getattr(search, '_resolved', None)}")

    fn = jax.jit(lambda v, ff, bf: search(v, v, ff, bf)[0])
    t0 = time.perf_counter()
    out = fn(vid, fflow, bflow)
    float(jnp.sum(out[..., :1]) * 1e-30)
    cs = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(vid, fflow, bflow)
        float(jnp.sum(out[..., :1]) * 1e-30)
        times.append(time.perf_counter() - t0)
    best = min(times)
    log(f"variant {variant}: compile={cs:.1f}s steady={best:.2f}s "
        f"({T/best:.3f} frames/s)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "B")
