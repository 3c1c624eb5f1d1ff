"""Aggregation micro-benchmark harness (reference bench/agg.py)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import stnls_tpu
from stnls_tpu.utils.bench import RecordIt


def main(small=False):
    if small:
        B, HD, T, F, H, W, K, ps = 1, 2, 3, 8, 128, 128, 10, 3
    else:
        B, HD, T, F, H, W, K, ps = 1, 2, 3, 8, 512, 512, 10, 7
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    weights = jnp.asarray(rng.random((B, HD, T, H, W, K)), jnp.float32)
    flows = jnp.asarray(
        np.round(3 * rng.standard_normal((B, HD, T, H, W, K, 3))),
        jnp.float32)

    rec = RecordIt()
    menu = {
        "gather": stnls_tpu.agg.NonLocalGather(ps, 1, itype="float"),
        "gather_int": stnls_tpu.agg.NonLocalGather(ps, 1, itype="int"),
        "gather_add": stnls_tpu.agg.NonLocalGatherAdd(ps, 1, 1,
                                                      itype="float"),
        "scatter_add": stnls_tpu.agg.NonLocalScatterAdd(ps, 1, 1,
                                                        itype="int"),
        "pool": stnls_tpu.agg.PooledPatchSum(ps, 1),
    }
    for name, agg in menu.items():
        fn = jax.jit(lambda v, w, fl, a=agg: a(v, w, fl))
        out = jax.block_until_ready(fn(vid, weights, flows))
        with rec(name):
            for _ in range(5):
                out = fn(vid, weights, flows)
            jax.block_until_ready(out)
        print(f"{name:12s} {rec.timers[name][-1]/5*1e3:9.2f} ms  "
              f"mem {rec.mems[name][0]:.2f} GB")


if __name__ == "__main__":
    main(small="--small" in sys.argv)
