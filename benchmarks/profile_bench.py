"""Per-op device-time profile of the headline bench step (fwd+bwd).

Captures a jax.profiler trace of the timed loop and aggregates device
time by op name, splitting the four Pallas custom-calls (search fwd/bwd,
agg fwd/bwd) from the surrounding XLA ops (prep transposes, topk, softmax,
einsums). Works through the axon tunnel (memory: the whole Pallas kernel
shows as one `_lambda_.N`/custom-call row).

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/profile_bench.py [trace_dir]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/benchtrace"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import bench

    T, args, attn, loss = bench.build()
    fn = jax.jit(jax.grad(loss, argnums=(0, 1)))

    def chain(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return 1e-30 * jnp.sum(leaf)

    t0 = time.perf_counter()
    out = fn(*args, jnp.float32(0.))
    s = chain(out)
    float(s)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    n_iter = 4
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for i in range(n_iter):
            out = fn(*args, s + jnp.float32(1e-6 * i))
            s = chain(out)
        float(s)
    dt = (time.perf_counter() - t0) / n_iter
    print(f"steady: {dt * 1e3:.1f} ms/iter ({T / dt:.2f} fps)", flush=True)

    # parse the trace: sum device-time by op name
    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace file found", file=sys.stderr)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    # device PIDs: process names containing TPU/device
    dev_pids = set()
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev["args"].get("name", "")
            if "TPU" in nm or "/device" in nm.lower() or "Device" in nm:
                dev_pids.add(ev["pid"])
    by_op = defaultdict(float)
    total = 0.0
    for ev in tr["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        # only leaf-ish xla op rows (skip module-level envelopes)
        name = ev.get("name", "")
        if name.startswith("jit_") or name.startswith("Module"):
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        by_op[name] += dur
        total += dur
    rows = sorted(by_op.items(), key=lambda kv: -kv[1])
    print(f"\ndevice op time over {n_iter} iters "
          f"(total {total:.1f} ms, {total / n_iter:.1f} ms/iter):")
    for name, ms in rows[:40]:
        print(f"  {ms / n_iter:9.2f} ms/iter  {100 * ms / total:5.1f}%  "
              f"{name[:90]}")


if __name__ == "__main__":
    main()
