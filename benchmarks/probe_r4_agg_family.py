"""Round-4 agg-family speed probe (VERDICT r3 #6): time the jnp-only agg
ops (NonLocalScatterAdd, PooledPatchSum, NonLocalScatter) against the
fused Pallas NonLocalGather at the headline bench config, fwd and
fwd+bwd, on the real TPU chip.

The reference dedicates hand-written CUDA kernels to each
(lib/csrc/agg/scatter_add_kernel.cu:114-139 atomicAdd scatter,
pool_int_kernel.cu, scatter_int_kernel.cu); our scatter-family ops are
deterministic `.at[].add` jnp programs. This probe records whether they
are within ~2x of the Pallas gather — i.e. whether a bespoke kernel is
warranted.

Usage: python -u benchmarks/probe_r4_agg_family.py
(measured numbers recorded below after the run)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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

    def timed(name, fn, *args, n=5):
        t0 = time.perf_counter()
        out = fn(*args)
        float(sum(jnp.sum(x) * 1e-30
                  for x in jax.tree_util.tree_leaves(out)
                  if jnp.issubdtype(x.dtype, jnp.floating)))
        t1 = time.perf_counter()
        t2 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(sum(jnp.sum(x) * 1e-30
                  for x in jax.tree_util.tree_leaves(out)
                  if jnp.issubdtype(x.dtype, jnp.floating)))
        t3 = time.perf_counter()
        log(f"{name}: compile+first={t1-t0:.1f}s "
            f"steady={(t3-t2)/n*1000:.1f}ms")

    # -- baseline: fused Pallas gather --
    gather = stnls_tpu.agg.NonLocalGather(
        ps=ps, stride0=1, budget=12, spread=(20, 16), wt_hint=2 * wt)
    timed("gather (pallas) fwd",
          jax.jit(lambda v, w_, i_: gather(v, w_, i_)), v6, w0, i0)
    timed("gather (pallas) fwd+bwd",
          jax.jit(jax.grad(
              lambda v, w_, i_: jnp.sum(gather(v, w_, i_) ** 2),
              argnums=(0, 1))), v6, w0, i0)

    # -- jnp scatter_add --
    sadd = stnls_tpu.agg.NonLocalScatterAdd(
        ps=ps, strideIn=1, strideOut=1, itype="float")
    timed("scatter_add (jnp) fwd",
          jax.jit(lambda v, w_, i_: sadd(v, w_, i_)), v6, w0, i0)
    timed("scatter_add (jnp) fwd+bwd",
          jax.jit(jax.grad(
              lambda v, w_, i_: jnp.sum(sadd(v, w_, i_) ** 2),
              argnums=(0, 1))), v6, w0, i0)

    # -- jnp pooled patch sum (int offsets only, reference parity) --
    pool = stnls_tpu.agg.PooledPatchSum(ps=ps, stride0=1, itype="int")
    i0i = jnp.round(i0).astype(jnp.int32)
    timed("pool (jnp) fwd",
          jax.jit(lambda v, w_, i_: pool(v, w_, i_)), v6, w0, i0i)
    timed("pool (jnp) fwd+bwd",
          jax.jit(jax.grad(
              lambda v, w_, i_: jnp.sum(pool(v, w_, i_) ** 2),
              argnums=(0, 1))), v6, w0, i0i)

    # -- jnp scatter (labels path, int) --
    from stnls_tpu.graph_opts import scatter_labels
    from stnls_tpu.search.utils import shape_flows
    sc = stnls_tpu.agg.NonLocalScatter(ps=ps, stride0=1, itype="int")
    f6 = shape_flows(HD, flows)
    def lab_fn(f_, i_):
        # scatter_labels sizes its slot axis from concrete data (S bound)
        return scatter_labels.run(f_, i_, ws, wt, 1, 1, H, W, True)[1]
    try:
        labels = lab_fn(f6, i0i)
        timed("scatter labels (eager)", lab_fn, f6, i0i, n=2)
        timed("scatter (jnp) fwd",
              jax.jit(lambda v, w_, i_, l_: sc(v, w_, i_, l_)),
              v6, w0, i0i, labels)
    except Exception as e:
        log(f"scatter probe skipped: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
