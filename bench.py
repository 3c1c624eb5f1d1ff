"""Headline benchmark: shifted non-local search attention, fwd+bwd
frames/sec on the README-example config (BASELINE.md config 2:
B=1, T=5, F=16, 128x128, ws=5, wt=2, ps=3, K=10, HD=2, stride1=0.5,
float/bilinear path, anchored).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (plus a
"compile_s" field).

vs_baseline compares against an estimated A100 fwd+bwd throughput of the
reference CUDA implementation on this config (the reference publishes no
numbers — bench/search.py is a harness only, SURVEY §6); the estimate
(500 frames/s) is derived from the op's arithmetic/memory footprint and is
held fixed across rounds so the ratio tracks our progress.

Measurement discipline (axon runtime quirks, see benchmarks/probe_*.py):
block_until_ready does NOT synchronize through the axon tunnel (async
mirage) — only device->host transfers do. So each iteration's input is
data-chained to the previous iteration's output and the loop is closed
with a float() sync; identical inputs are also dedup-cached, hence the
varying scalar. The fwd-only fallback re-execs a fresh subprocess so the
async backlog of a failed fwd+bwd attempt can't pollute the measurement.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

A100_EST_FPS = 500.0


def build():
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

    return T, (vid, fflow, bflow), attn, loss


def run(mode):
    import jax
    import jax.numpy as jnp

    T, args, attn, loss = build()
    if mode == "fwd+bwd":
        fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    else:
        fn = jax.jit(attn)

    def chain(out):
        """Scalar data-dependency on the previous output: forces sequential
        execution and, via the final float(), a true device sync."""
        leaf = jax.tree_util.tree_leaves(out)[0]
        return 1e-30 * jnp.sum(leaf)

    t0 = time.perf_counter()
    out = fn(*args, jnp.float32(0.))
    s = chain(out)
    float(s)  # true sync (block_until_ready is async through axon)
    compile_s = time.perf_counter() - t0

    n_iter = 10
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = fn(*args, s + jnp.float32(1e-6 * i))
        s = chain(out)
    float(s)
    dt = (time.perf_counter() - t0) / n_iter
    return T / dt, compile_s


def emit(mode, fps, compile_s):
    print(json.dumps({
        "metric": f"shifted-NLS attention {mode} frames/sec "
                  "(128^2,T=5,ws=5,wt=2,ps=3,K=10,HD=2,stride1=0.5)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / A100_EST_FPS, 3),
        "compile_s": round(compile_s, 1),
    }))


def main():
    mode = os.environ.get("BENCH_MODE", "fwd+bwd")
    try:
        fps, compile_s = run(mode)
    except Exception as e:
        sys.stderr.write(f"{mode} failed ({type(e).__name__}: {e})\n")
        if mode == "fwd+bwd":
            # fresh process for the fallback executable (axon runtime
            # degrades the second executable run in one process)
            env = dict(os.environ, BENCH_MODE="fwd")
            proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                  env=env, timeout=1200)
            sys.exit(proc.returncode)
        raise
    emit(mode, fps, compile_s)


if __name__ == "__main__":
    main()
