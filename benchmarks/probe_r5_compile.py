"""Round-5 compile-time breakdown (VERDICT r4 #8): where the headline
config's cold compile goes — jaxpr trace/lower vs XLA+Mosaic backend
compile, per stage (search fwd, search fwd+bwd, gather fwd+bwd, full
attention). Runs WITHOUT the persistent cache so times are true cold
compiles.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/probe_r5_compile.py
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
    from stnls_tpu.search.utils import shape_vids
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
    d0, i0 = search(vid, vid, flows)
    v6 = shape_vids(HD, [vid])[0]
    w0 = jax.nn.softmax(-10. * d0, axis=-1)
    gather = stnls_tpu.agg.NonLocalGather(
        ps=ps, stride0=1, budget=12, spread=(20, 16), wt_hint=2 * wt)

    def split(name, fn, *args):
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*args)
        t1 = time.perf_counter()
        lowered.compile()
        t2 = time.perf_counter()
        log(f"{name}: trace+lower={t1-t0:.1f}s backend-compile={t2-t1:.1f}s")

    split("search fwd", lambda v, f_: search(v, v, f_), vid, flows)
    split("search fwd+bwd",
          jax.grad(lambda v, f_: jnp.sum(search(v, v, f_)[0] ** 2),
                   argnums=0), vid, flows)
    split("gather fwd+bwd",
          jax.grad(lambda v, w_, i_: jnp.sum(gather(v, w_, i_) ** 2),
                   argnums=(0, 1)), v6, w0, i0)


if __name__ == "__main__":
    main()
