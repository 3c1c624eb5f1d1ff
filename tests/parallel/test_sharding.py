"""Distribution tests on the virtual 8-device CPU mesh: the time-sharded
search (halo-exchange context parallelism) must reproduce the single-device
search exactly, including gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stnls_tpu.parallel import make_mesh, time_sharded_search, shard_search
from stnls_tpu.search import NonLocalSearch


def make_data(B=1, HD=1, T=8, F=3, H=8, W=8, wt=1, seed=0):
    rng = np.random.default_rng(seed)
    vid0 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    W_t = 2 * wt + 1
    flows = jnp.asarray(rng.standard_normal((B, HD, T, W_t - 1, 2, H, W)),
                        jnp.float32)
    return vid0, vid1, flows


@pytest.mark.parametrize("n_time", [
    2, pytest.param(4, marks=pytest.mark.slow)])
def test_time_sharded_matches_single(n_time):
    vid0, vid1, flows = make_data()
    ws, wt, ps, k = 3, 1, 1, 4
    mesh = make_mesh({"time": n_time}, devices=jax.devices()[:n_time])

    ref = NonLocalSearch(ws, wt, ps, k, stride0=1, dist_type="l2",
                         itype="float")
    d_ref, i_ref = ref(vid0, vid1, flows)

    d_sh, i_sh = time_sharded_search(vid0, vid1, flows, mesh, ws=ws, wt=wt,
                                     ps=ps, k=k, stride0=1, dist_type="l2",
                                     itype="float")
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_sh),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(i_ref), np.asarray(i_sh),
                               atol=1e-4)


def test_time_sharded_gradients_match():
    vid0, vid1, flows = make_data(T=4)
    ws, wt, ps, k = 3, 1, 1, 4
    mesh = make_mesh({"time": 2}, devices=jax.devices()[:2])
    ref = NonLocalSearch(ws, wt, ps, k, stride0=1, dist_type="l2",
                         itype="float")

    def loss_ref(v0):
        d, _ = ref(v0, vid1, flows)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.))

    def loss_sh(v0):
        d, _ = time_sharded_search(v0, vid1, flows, mesh, ws=ws, wt=wt,
                                   ps=ps, k=k, stride0=1, dist_type="l2",
                                   itype="float")
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.))

    g_ref = jax.grad(loss_ref)(vid0)
    g_sh = jax.grad(loss_sh)(vid0)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_sh),
                               rtol=1e-4, atol=1e-4)


def test_data_sharded_runs():
    vid0, vid1, flows = make_data(B=4, T=3)
    mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
    search = NonLocalSearch(3, 1, 1, 4, stride0=1, itype="float")
    run = shard_search(search, mesh)
    d_sh, i_sh = run(vid0, vid1, flows)
    d_ref, i_ref = search(vid0, vid1, flows)
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_sh),
                               rtol=1e-4, atol=1e-4)


def test_halo_gather_matches_full_no_allgather():
    """Time-CP aggregation via ring-halo (parallel.halo_gather) must match
    a full-sequence NonLocalGather, run collective-light: no all_gather of
    the value video appears in the program (VERDICT r1 #6)."""
    from jax import lax
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from stnls_tpu.parallel import halo_gather
    from stnls_tpu.agg import NonLocalGather

    B, HD, T, F, H, W, K = 1, 1, 8, 3, 8, 8, 4
    ws, wt, ps = 3, 1, 1
    vid0, vid1, flows = make_data(B, HD, T, F, H, W, wt, seed=3)
    search = NonLocalSearch(ws, wt, ps, K, stride0=1, dist_type="l2",
                            itype="float")
    d, inds = search(vid0, vid1, flows)
    w = jax.nn.softmax(-10. * d, axis=-1)
    gather = NonLocalGather(ps=ps, stride0=1)
    stack_ref = gather(vid1, w, inds)

    n = 2
    mesh = make_mesh({"time": n}, devices=jax.devices()[:n])

    def local(v6, w_l, i_l):
        return halo_gather(gather, v6, w_l, i_l, wt)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, None, "time"), P(None, None, "time"),
                             P(None, None, "time")),
                   out_specs=P(None, None, None, "time"),
                   check_vma=False)
    stack_sh = fn(vid1, w, inds)
    np.testing.assert_allclose(np.asarray(stack_ref), np.asarray(stack_sh),
                               rtol=1e-4, atol=1e-4)
    # collective audit: halo ppermute only, no all_gather of v
    jaxpr = str(jax.make_jaxpr(fn)(vid1, w, inds))
    assert "all_gather" not in jaxpr
    assert "ppermute" in jaxpr


def test_time_sharded_pallas_matches_single():
    """The fused-Pallas chunk path (query_t0/T_global mode, VERDICT r1 #6)
    must reproduce the single-device anchored search on the CPU mesh
    (interpret kernels)."""
    vid0, vid1, flows = make_data(T=4, H=16, W=16, wt=1, seed=7)
    ws, wt, ps, k = 3, 1, 3, 4
    mesh = make_mesh({"time": 2}, devices=jax.devices()[:2])

    ref = NonLocalSearch(ws, wt, ps, k, stride0=1, dist_type="l2",
                         itype="float", self_action="anchor",
                         impl="lattice")
    d_ref, i_ref = ref(vid0, vid1, flows)

    d_sh, i_sh = time_sharded_search(
        vid0, vid1, flows, mesh, ws=ws, wt=wt, ps=ps, k=k, stride0=1,
        dist_type="l2", itype="float", self_action="anchor", impl="pallas",
        flow_budget=6, spread_budget=8)
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_sh),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(i_ref), np.asarray(i_sh),
                               atol=1e-4)
