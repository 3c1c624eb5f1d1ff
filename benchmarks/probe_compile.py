"""Compile-time + runtime matrix for the pallas search fwd kernel.

Fresh compiles (persistent cache off). Each config: compile fwd, then
time 10 steady iterations.

Usage: python -u benchmarks/probe_compile.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import stnls_tpu
    from bench import smooth_flows
    from stnls_tpu.search.utils import shape_flows
    from stnls_tpu.ops.nls_pallas import nls_pallas_volume, _pallas_prep

    B, T = 1, 5
    F, H, W = 16, 128, 128
    ws, wt = 5, 2
    ps, HD = 3, 2
    stride0, stride1 = 1, 0.5

    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    fflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(smooth_flows(rng, (B, T, 2, H, W)), jnp.float32)
    flows = shape_flows(HD, stnls_tpu.nn.search_flow(fflow, bflow, wt,
                                                     stride0))

    configs = [
        ("pred=T sb=(14,16) tile=8", dict(predicate=True,
                                          spread_budget=(14, 16), tile=8)),
        ("pred=F sb=(14,16) tile=8", dict(predicate=False,
                                          spread_budget=(14, 16), tile=8)),
        ("pred=T sb=(14,16) tile=16", dict(predicate=True,
                                           spread_budget=(14, 16), tile=16)),
        ("pred=T sb=(14,16) tile=32", dict(predicate=True,
                                           spread_budget=(14, 16), tile=32)),
        ("pred=T sb=(6,8) tile=8", dict(predicate=True,
                                        spread_budget=(6, 8), tile=8)),
    ]

    for name, kw in configs:
        def fn(v, f, kw=kw):
            d, aux, outl = nls_pallas_volume(
                v, v, f, ws=ws, wt=wt, ps=ps, stride0=stride0,
                stride1=stride1, dist_type="l2", itype="float",
                flow_budget=8, return_aux=True, **kw)
            return d

        jf = jax.jit(fn)
        t0 = time.perf_counter()
        out = jf(vid, flows)
        s = float(jnp.sum(out) * 1e-30)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(10):
            out = jf(vid, flows)
        jax.block_until_ready(out)
        t_run = (time.perf_counter() - t0) / 10
        log(f"{name}: compile={t_compile:.1f}s run={t_run*1000:.1f}ms")


if __name__ == "__main__":
    main()
