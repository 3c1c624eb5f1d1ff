"""RefineSearch properties (reference tests/search/test_refinement.py:52-125:
refine with wr=1 around NLS output flows reproduces the NLS dists)."""

import numpy as np
import pytest
import jax.numpy as jnp

from stnls_tpu.search import NonLocalSearch, RefineSearch


def make_data(B=1, HD=1, T=3, F=3, H=8, W=8, wt=1, seed=0):
    rng = np.random.default_rng(seed)
    vid0 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    W_t = 2 * wt + 1
    flows = jnp.asarray(
        rng.standard_normal((B, HD, T, W_t - 1, 2, H, W)), jnp.float32)
    return vid0, vid1, flows


@pytest.mark.parametrize("itype", ["float", "int"])
def test_refine_wr1_matches_nls(itype):
    vid0, vid1, flows = make_data()
    k, ws, wt, ps = 5, 3, 1, 3
    nls = NonLocalSearch(ws, wt, ps, k, dist_type="l2", itype=itype)
    d0, i0 = nls(vid0, vid1, flows)
    refine = RefineSearch(ws, wt, wr=1, k=k, ps=ps, stride0=1,
                          dist_type="l2", itype=itype)
    d1, i1 = refine(vid0, vid1, i0.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(i0, np.float32),
                               np.asarray(i1, np.float32), atol=1e-4)


def test_refine_improves_or_matches():
    """A wr>1 window around the NLS top-k can only improve (lower) the best
    l2 distance."""
    vid0, vid1, flows = make_data()
    nls = NonLocalSearch(3, 1, 1, 4, dist_type="l2", itype="float")
    d0, i0 = nls(vid0, vid1, flows)
    refine = RefineSearch(3, 1, wr=3, k=4, ps=1, stride0=1,
                          dist_type="l2", itype="float")
    d1, i1 = refine(vid0, vid1, i0.astype(jnp.float32))
    best0 = np.asarray(d0)[..., 0]
    best1 = np.asarray(d1)[..., 0]
    assert (best1 <= best0 + 1e-4).all()


def test_refine_anchor_keeps_source():
    """With anchoring, slot 0 of each refined result reproduces the input
    flow's own location."""
    vid0, vid1, flows = make_data()
    nls = NonLocalSearch(3, 1, 1, 3, dist_type="l2", itype="float")
    d0, i0 = nls(vid0, vid1, flows)
    refine = RefineSearch(3, 1, wr=3, k=3, ps=1, stride0=1,
                          dist_type="l2", itype="float",
                          self_action="anchor")
    d1, i1 = refine(vid0, vid1, i0.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(i1)[..., 0, :],
                               np.asarray(i0)[..., 0, :], atol=1e-4)


def test_restricted_radius_is_inert_reference_parity():
    """`restricted_radius` must be accepted and have NO effect — the
    reference's kernels never read it (refinement_int_kernel.cu:123-127
    carries the bound logic only as commented-out "[unused]" code;
    refinement_bilin2d_kernel.cu:131-133 likewise)."""
    vid0, vid1, flows = make_data()
    nls = NonLocalSearch(3, 1, 1, 4, dist_type="l2", itype="float")
    d0, i0 = nls(vid0, vid1, flows)
    outs = []
    for rr in (False, True):
        refine = RefineSearch(3, 1, wr=3, k=4, ps=3, stride0=1,
                              dist_type="l2", itype="float",
                              restricted_radius=rr)
        outs.append(refine(vid0, vid1, i0.astype(jnp.float32)))
    np.testing.assert_array_equal(np.asarray(outs[0][0]),
                                  np.asarray(outs[1][0]))
    np.testing.assert_array_equal(np.asarray(outs[0][1]),
                                  np.asarray(outs[1][1]))
