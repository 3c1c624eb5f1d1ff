"""Microbenchmark the 1-D flat gather + windowed scatter_add primitives
at the exact shapes the sparse-K grad path (ops/nls_k.py) uses at the
headline bench config. Ground truth for the 'fast gather layout' claims
in ops/pgather.py.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/probe_flatgather.py [take|pg|pgvjp|all]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(fn, args, n=10):
    import jax
    import jax.numpy as jnp
    t0 = time.perf_counter()
    out = fn(*args, jnp.float32(0.))
    s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0]
                        .astype(jnp.float32))
    float(s)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args, s + jnp.float32(1e-6 * i))
        s = 1e-30 * jnp.sum(jax.tree_util.tree_leaves(out)[0]
                            .astype(jnp.float32))
    float(s)
    return (time.perf_counter() - t0) / n * 1e3, compile_s


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "take"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from stnls_tpu.ops.pgather import patch_gather

    B, HD, T, F, H, W = 1, 2, 5, 16, 128, 128
    K, S, C = 10, 4, 4
    Tp, Hp, Wp = T, H + 12, W + 12
    rng = np.random.default_rng(0)

    if which == "take":
        # bare 1-D flat gather: N indices from a flat operand
        N = B * HD * C * S * S * T * H * W * K  # ~105M (stage-B chunk)
        for n_idx in (1 << 20, 1 << 24, N):
            op = jnp.asarray(rng.standard_normal(
                B * HD * C * Tp * Hp * Wp), jnp.float32)
            idx = jnp.asarray(
                rng.integers(0, op.size, n_idx, dtype=np.int32))

            def f(op, idx, s):
                return jnp.take(op + s, idx, mode="clip")

            fn = jax.jit(f)
            ms, cs = timeit(fn, (op, idx))
            print(json.dumps({"target": f"take_{n_idx}",
                              "steady_ms": round(ms, 2),
                              "ns_per_idx": round(ms * 1e6 / n_idx, 3),
                              "compile_s": round(cs, 1)}), flush=True)
    elif which == "pg":
        frames = jnp.asarray(
            rng.standard_normal((B, HD, C, Tp * Hp * Wp)), jnp.float32)
        tail = (T, H, W, K)
        tj = jnp.asarray(rng.integers(0, Tp, (B, HD) + tail, np.int32))
        oi = jnp.asarray(rng.integers(0, Hp - S, (B, HD) + tail, np.int32))
        oj = jnp.asarray(rng.integers(0, Wp - S, (B, HD) + tail, np.int32))

        def f(fr, s):
            return patch_gather(fr + s, (tj, oi, oj), (S, Tp, Hp, Wp))

        ms, cs = timeit(jax.jit(f), (frames,))
        n_el = B * HD * C * S * S * T * H * W * K
        print(json.dumps({"target": "patch_gather_fwd",
                          "steady_ms": round(ms, 2),
                          "ns_per_elem": round(ms * 1e6 / n_el, 3),
                          "compile_s": round(cs, 1)}), flush=True)
    elif which == "pgvjp":
        frames = jnp.asarray(
            rng.standard_normal((B, HD, C, Tp * Hp * Wp)), jnp.float32)
        tail = (T, H, W, K)
        tj = jnp.asarray(rng.integers(0, Tp, (B, HD) + tail, np.int32))
        oi = jnp.asarray(rng.integers(0, Hp - S, (B, HD) + tail, np.int32))
        oj = jnp.asarray(rng.integers(0, Wp - S, (B, HD) + tail, np.int32))

        def loss(fr, s):
            P = patch_gather(fr + s, (tj, oi, oj), (S, Tp, Hp, Wp))
            return jnp.sum(P ** 2)

        ms, cs = timeit(jax.jit(jax.grad(loss)), (frames,))
        print(json.dumps({"target": "patch_gather_fwd+bwd",
                          "steady_ms": round(ms, 2),
                          "compile_s": round(cs, 1)}), flush=True)
    else:
        env = dict(os.environ)
        for w in ("take", "pg", "pgvjp"):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), w],
                env=env, capture_output=True, text=True, timeout=1200)
            for ln in p.stdout.splitlines():
                if ln.startswith("{"):
                    print(ln, flush=True)
            if p.returncode != 0:
                err = p.stderr.strip().splitlines()
                print(json.dumps({"target": w,
                                  "error": err[-1] if err else "?"}),
                      flush=True)


if __name__ == "__main__":
    main()
