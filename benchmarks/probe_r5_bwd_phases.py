"""Round-5 K-sparse backward phase split at the headline config: time
the fused top-K search bwd with backward phases bisected out via the
kernel's _bskip debug knob (results wrong, timing honest):
  c = bwd selection sweep (winner-predicated)
  d = X-field backward
  e = phase-image build backward

Injected by monkeypatching topk_bwd_pallas (the knob is not on the
public path). Run:
  env PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_r5_bwd_phases.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import stnls_tpu
    import stnls_tpu.ops.nls_pallas_bwd as npb
    from bench import smooth_flows

    B, T = 1, 5
    F, H, W = 16, 128, 128
    ws, wt = 5, 2
    ps, K, HD = 3, 10, 2

    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    fflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, 1)
    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, self_action="anchor", itype="float",
        flow_budget=16, spread_budget=16)
    search(vid, vid, flows)

    orig = npb.topk_bwd_pallas
    state = {"bskip": ""}

    def patched(cfg, *a, **kw):
        return orig(dict(cfg, _bskip=state["bskip"]), *a, **kw)

    npb.topk_bwd_pallas = patched

    def loss(v, fl):
        d, i = search(v, v, fl)
        return jnp.sum(jnp.tanh(d))

    for bskip in ("", "c", "d", "e", "cde"):
        state["bskip"] = bskip
        fn = jax.jit(jax.grad(loss), static_argnums=())
        t0 = time.perf_counter()
        out = fn(vid, flows)
        float(jnp.sum(out[..., :1, :1]) * 1e-30)
        cs = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(vid, flows)
            float(jnp.sum(out[..., :1, :1]) * 1e-30)
            best = min(best, (time.perf_counter() - t0) / 3)
        log(f"bskip={bskip!r}: fwd+bwd steady={best*1e3:.1f}ms "
            f"(compile {cs:.0f}s)")


if __name__ == "__main__":
    main()
