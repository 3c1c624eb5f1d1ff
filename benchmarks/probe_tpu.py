"""TPU probe: compile + run the headline search config for each impl.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_tpu.py [impl] [mode]
  impl in {lattice, warp}; mode in {fwd, bwd}.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import stnls_tpu


def main(impl="warp", mode="fwd"):
    B, T = 1, 5
    F, H, W = 16, 128, 128
    ws, wt = 5, 2
    ps, K, HD = 3, 10, 2
    stride0, stride1 = 1, 0.5

    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    fflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)

    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, stride0=stride0, stride1=stride1,
        self_action="anchor", itype="float", impl=impl)

    def fwd(v, ff, bf):
        flows = stnls_tpu.nn.search_flow(ff, bf, wt, stride0)
        dists, srch_flows = search(v, v, flows)
        return dists, srch_flows

    def loss(v, ff, bf):
        d, sf = fwd(v, ff, bf)
        return jnp.mean(d ** 2) + 1e-3 * jnp.mean(sf ** 2)

    fn = jax.jit(fwd) if mode == "fwd" else jax.jit(jax.grad(loss, (0, 1)))

    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(vid, fflow, bflow))
    t_compile = time.perf_counter() - t0
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(vid, fflow, bflow)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"impl={impl} mode={mode}: compile+first={t_compile:.1f}s "
          f"steady={dt*1e3:.2f}ms  fps={T/dt:.1f}")


if __name__ == "__main__":
    impl = sys.argv[1] if len(sys.argv) > 1 else "warp"
    mode = sys.argv[2] if len(sys.argv) > 2 else "fwd"
    main(impl, mode)
