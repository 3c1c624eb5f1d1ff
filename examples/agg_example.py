"""The aggregation family end-to-end: one search, four aggregators.

Mirrors the reference's agg menu (lib/stnls/agg/api.py): the same
(weights, flows) from a NonLocalSearch drive NonLocalGather (patch
stack), NonLocalGatherAdd (weighted patch sum into a video),
NonLocalScatterAdd (transposed aggregation, unnormalized), and
PooledPatchSum (ps-upsampled grid) — each on its fused Pallas fast path
on TPU, with gradients.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python examples/agg_example.py
(or on CPU: python examples/agg_example.py — routes the jnp engines)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import stnls_tpu
from stnls_tpu.search.utils import shape_vids


def main():
    B, T, F, H, W = 1, 3, 16, 128, 128
    ws, wt, ps, K, HD = 5, 1, 3, 8, 2
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    fflow = jnp.asarray(np.clip(
        2.0 * rng.standard_normal((B, T, 2, H, W)), -4, 4), jnp.float32)
    bflow = jnp.asarray(np.clip(
        2.0 * rng.standard_normal((B, T, 2, H, W)), -4, 4), jnp.float32)

    flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, 1)
    search = stnls_tpu.search.NonLocalSearch(
        ws, wt, ps, K, nheads=HD, self_action="anchor", itype="float")
    dists, srch_flows = search(vid, vid, flows)
    weights = jax.nn.softmax(-10. * dists, axis=-1)
    v6 = shape_vids(HD, [vid])[0]

    aggs = {
        "gather": stnls_tpu.agg.NonLocalGather(ps=ps, stride0=1),
        "gather_add": stnls_tpu.agg.NonLocalGatherAdd(
            ps=ps, strideIn=1, strideOut=1),
        "scatter_add": stnls_tpu.agg.NonLocalScatterAdd(
            ps=ps, strideIn=1, strideOut=1),
        "pool": stnls_tpu.agg.PooledPatchSum(ps=ps, stride0=1),
    }
    for name, agg in aggs.items():
        t0 = time.perf_counter()
        out = agg(v6, weights, srch_flows)

        def loss(v, w_):
            return jnp.mean(agg(v, w_, srch_flows) ** 2)

        gv, gw = jax.grad(loss, (0, 1))(v6, weights)
        ok = bool(jnp.isfinite(out).all() & jnp.isfinite(gv).all()
                  & jnp.isfinite(gw).all())
        print(f"{name:12s} out{tuple(out.shape)}  finite={ok}  "
              f"({time.perf_counter() - t0:.1f}s incl. compile)")


if __name__ == "__main__":
    main()
