"""Search micro-benchmark harness (reference bench/search.py:45-66:
timings + device memory for nls vs approximate searches; 512x512, T=3,
ws=21, wt=3, k=10, ps=7, nheads=3).

Run on the TPU: env PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/search_bench.py [--small]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import stnls_tpu
from stnls_tpu.utils.bench import RecordIt


def main(small=False):
    if small:
        B, T, F, H, W = 1, 3, 9, 128, 128
        ws, wt, ps, k, HD = 9, 1, 3, 10, 3
    else:
        B, T, F, H, W = 1, 3, 9, 512, 512
        ws, wt, ps, k, HD = 21, 3, 7, 10, 3
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, F * HD, H, W)), jnp.float32)
    fflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
    flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, 1)

    rec = RecordIt()
    menu = {
        "nls": stnls_tpu.search.NonLocalSearch(
            ws, wt, ps, k, nheads=HD, stride0=1, self_action="anchor",
            itype="float"),
        "nls_int": stnls_tpu.search.NonLocalSearch(
            ws, wt, ps, k, nheads=HD, stride0=1, self_action="anchor",
            itype="int"),
    }
    for name, search in menu.items():
        fn = jax.jit(lambda v, fl, s=search: s(v, v, fl))
        out = jax.block_until_ready(fn(vid, flows))  # compile
        with rec(name):
            for _ in range(5):
                out = fn(vid, flows)
            jax.block_until_ready(out)
        print(f"{name:10s} {rec.timers[name][-1]/5*1e3:9.2f} ms  "
              f"mem {rec.mems[name][0]:.2f} GB")

    # refinement second stage on the nls output
    d, i = menu["nls"](vid, vid, flows)
    refine = stnls_tpu.search.RefineSearch(ws, wt, wr=3, k=k, ps=ps,
                                           nheads=HD, stride0=1,
                                           itype="float")
    fn = jax.jit(lambda v, fl: refine(v, v, fl))
    out = jax.block_until_ready(fn(vid, i.astype(jnp.float32)))
    with rec("refine"):
        for _ in range(5):
            out = fn(vid, i.astype(jnp.float32))
        jax.block_until_ready(out)
    print(f"{'refine':10s} {rec.timers['refine'][-1]/5*1e3:9.2f} ms  "
          f"mem {rec.mems['refine'][0]:.2f} GB")


if __name__ == "__main__":
    main(small="--small" in sys.argv)
