"""Scatter machinery round-trips (reference tests/agg/test_scatter.py:38-165:
label assignment + scatter/gather tensor consistency)."""

import numpy as np
import jax.numpy as jnp

from stnls_tpu.search import NonLocalSearch
from stnls_tpu.graph_opts import scatter_labels, scatter_tensor, gather_tensor
from stnls_tpu.agg import NonLocalScatter, NonLocalScatterAdd, NonLocalGather


def search_outputs(seed=0, B=1, HD=1, T=3, F=3, H=8, W=8, ws=3, wt=1, k=6):
    rng = np.random.default_rng(seed)
    vid0 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    flows = jnp.asarray(
        np.round(rng.standard_normal((B, HD, T, 2 * wt, 2, H, W))),
        jnp.float32)
    search = NonLocalSearch(ws, wt, 1, k, stride0=1, itype="int")
    dists, inds = search(vid0, vid1, flows)
    return vid0, vid1, flows, dists, inds


def test_scatter_labels_collision_free():
    vid0, vid1, flows, dists, inds = search_outputs()
    B, HD, T, nH, nW, K, _ = inds.shape
    names, labels = scatter_labels.run(flows, inds, 3, 1, 1, 1, 8, 8, True)
    lab = np.asarray(labels)
    assert (lab >= 0).all()
    # edges sharing a destination must have distinct labels
    from stnls_tpu.graph_opts.scatter_labels import _dest_raster
    q1, _ = _dest_raster(inds, 1, 1, T, 8, 8)
    q1 = np.asarray(q1).reshape(B, HD, -1)
    labf = lab.reshape(B, HD, -1)
    for b in range(B):
        for h in range(HD):
            pairs = set()
            for e in range(q1.shape[2]):
                key = (int(q1[b, h, e]), int(labf[b, h, e]))
                assert key not in pairs, "label collision at destination"
                pairs.add(key)


def test_scatter_gather_tensor_roundtrip():
    vid0, vid1, flows, dists, inds = search_outputs()
    B, HD, T, nH, nW, K, _ = inds.shape
    H = W = 8
    names, labels = scatter_labels.run(flows, inds, 3, 1, 1, 1, H, W, True)
    weights = dists.reshape(B, HD, T, nH, nW, K)
    scat = scatter_tensor.run(weights, inds, labels, 1, 1, H, W,
                              invalid=jnp.inf)
    # every original weight appears exactly once among the finite slots
    finite = np.asarray(scat)[np.isfinite(np.asarray(scat))]
    orig = np.sort(np.asarray(weights).ravel())
    np.testing.assert_allclose(np.sort(finite), orig, rtol=1e-5, atol=1e-6)

    # gather back: out[q0, s] = scat[q1_of(q0,k), label(q0,k)]-indexed tensor
    gat = gather_tensor.run(
        jnp.broadcast_to(jnp.arange(T * nH * nW, dtype=jnp.float32)
                         [None, None, :, None],
                         (B, HD, T * nH * nW, K)).reshape(B, HD, T, nH, nW, K),
        inds, labels, 1, 1, H, W, invalid=jnp.inf)
    assert gat.shape[2] == T * nH * nW


def test_nonlocal_scatter_conserves_mass():
    """Sum over the scatter stack equals the weighted patch mass (all
    writes land somewhere; slots are collision-free)."""
    vid0, vid1, flows, dists, inds = search_outputs()
    B, HD, T, nH, nW, K, _ = inds.shape
    H = W = 8
    weights = jnp.ones((B, HD, T, nH, nW, K), jnp.float32)
    names, labels = scatter_labels.run(flows, inds, 3, 1, 1, 1, H, W, True)
    scat = NonLocalScatter(ps=1, stride0=1)
    stack, mask = scat(vid0, weights, inds, labels)
    # ps=1, stride0=1: counts are all ones; total scattered mass equals
    # sum over (q,k) of vid at the query pixel
    total = float(jnp.sum(stack))
    expect = float(jnp.sum(vid0.sum(3)) * K)
    np.testing.assert_allclose(total, expect, rtol=1e-4)


def test_graph_opts_jittable_with_static_S():
    """With S passed statically (slot_bound) the scatter/gather tensor ops
    and NonLocalScatter run under jax.jit with no host sync (VERDICT r1 #7)."""
    import jax
    from functools import partial
    vid0, vid1, flows, dists, inds = search_outputs()
    B, HD, T, nH, nW, K, _ = inds.shape
    H = W = 8
    names, labels = scatter_labels.run(flows, inds, 3, 1, 1, 1, H, W, True)
    S = scatter_labels.slot_bound(3, 1, 1, T, True)
    assert int(jnp.max(labels)) < S
    weights = dists.reshape(B, HD, T, nH, nW, K)

    scat_ref = scatter_tensor.run(weights, inds, labels, 1, 1, H, W)
    scat_jit = jax.jit(partial(scatter_tensor.run, stride0=1, stride1=1,
                               H=H, W=W, S=S))(weights, inds, labels)
    fin = np.isfinite(np.asarray(scat_ref))
    np.testing.assert_allclose(np.asarray(scat_jit)[..., :scat_ref.shape[-1]][fin],
                               np.asarray(scat_ref)[fin], rtol=1e-6)

    gat_jit = jax.jit(partial(gather_tensor.run, stride0=1, stride1=1,
                              H=H, W=W, S=S))(weights, inds, labels)
    assert gat_jit.shape[2] == T * nH * nW

    scat_mod = NonLocalScatter(ps=1, stride0=1, S=S)
    stack, mask = jax.jit(scat_mod)(vid0, jnp.ones_like(weights), inds, labels)
    assert stack.shape[2] == S


def test_scatter_add_vs_gather_add_transpose():
    """scatter_add with zero flows equals gather_add with zero flows (both
    reduce to weighted patch re-assembly at the query positions)."""
    rng = np.random.default_rng(1)
    B, HD, T, F, H, W, K = 1, 1, 2, 3, 8, 8, 2
    vid = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    weights = jnp.asarray(rng.random((B, HD, T, H, W, K)), jnp.float32)
    zflows = jnp.zeros((B, HD, T, H, W, K, 3), jnp.float32)
    from stnls_tpu.ops.agg import nl_gather_add, nl_scatter_add
    out_g = nl_gather_add(vid, weights, zflows, ps=1, strideIn=1,
                          strideOut=1, itype="int")
    out_s, counts = nl_scatter_add(vid, weights, zflows, ps=1, strideIn=1,
                                   strideOut=1, itype="int")
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_s),
                               rtol=1e-4, atol=1e-5)
