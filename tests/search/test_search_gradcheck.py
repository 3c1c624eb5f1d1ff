"""Numeric finite-difference gradchecks for the search op — the role of
torch.autograd.gradcheck in the reference suite
(tests/search/test_non_local_search_bilin2d.py:309-463): vid0, vid1 on
both itypes, flows on the float path (away from integer coords), and the
k_agg / normalize_bwd custom-VJP policies."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stnls_tpu.search import NonLocalSearch
from stnls_tpu.search.non_local_search import patch_fold_counts
from stnls_tpu.testing.checks import gradcheck


def make_inputs(seed=0, B=1, HD=1, T=3, F=3, H=10, W=10, wt=1,
                frac=0.25):
    rng = np.random.default_rng(seed)
    vid0 = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)),
                       jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)),
                       jnp.float32)
    flows = jnp.asarray(
        np.round(2.0 * (2 * rng.random((B, T, 2 * wt, 2, H, W)) - 1))
        + frac, jnp.float32)
    return vid0, vid1, flows


@pytest.mark.parametrize("itype,dist_type", [("float", "l2"),
                                             ("float", "prod"),
                                             ("int", "l2")])
def test_gradcheck_vids(itype, dist_type):
    # full volume, no top-K: a perturbation-induced rank flip in the K
    # selection makes the weighted loss non-differentiable at the sample
    # (the reference gradchecks hit the same caveat with ordering)
    vid0, vid1, flows = make_inputs()
    search = NonLocalSearch(3, 1, ps=3, k=-1, dist_type=dist_type,
                            self_action=None, topk_mode="none",
                            itype=itype)
    rng = np.random.default_rng(1)
    gd = None

    def loss(v0, v1):
        nonlocal gd
        d, _ = search(v0, v1, flows)
        if gd is None:
            gd = jnp.asarray(rng.standard_normal(d.shape), jnp.float32)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.) * gd)

    # large eps beats f32 quantization of the big loss sum; the dist is
    # (at most) quadratic in the vids, so central differences stay exact
    assert gradcheck(loss, (vid0, vid1), argnums=(0, 1), eps=8e-2,
                     rtol=8e-2, atol=2e-2, n_checks=6)


def test_gradcheck_flows_float():
    vid0, vid1, flows = make_inputs(frac=0.3)
    search = NonLocalSearch(3, 1, ps=2, k=3, dist_type="l2",
                            self_action=None, itype="float")

    def loss(fl):
        d, _ = search(vid0, vid1, fl)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.))

    # eps below the 0.3 distance to the nearest integer coordinate
    # ("Gradcheck only works _not_ near an int", reference :414-419)
    assert gradcheck(loss, (flows,), argnums=0, eps=5e-3, rtol=8e-2,
                     atol=2e-2, n_checks=6)


def test_k_agg_truncates_gradient():
    """k_agg=j must equal the gradient of a loss that only reads the
    first j neighbors (reference impl/non_local_search.py:154-158)."""
    vid0, vid1, flows = make_inputs()
    s_full = NonLocalSearch(3, 1, ps=2, k=4, self_action="anchor",
                            itype="float")
    s_kagg = NonLocalSearch(3, 1, ps=2, k=4, self_action="anchor",
                            itype="float", k_agg=2)

    def loss_trunc(v0):
        d, _ = s_full(v0, vid1, flows)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.)[..., :2])

    def loss_kagg(v0):
        d, _ = s_kagg(v0, vid1, flows)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.))

    g_t = jax.grad(loss_trunc)(vid0)
    g_k = jax.grad(loss_kagg)(vid0)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_t),
                               rtol=1e-4, atol=1e-5)


def test_normalize_bwd_divides_by_fold_counts():
    """normalize_bwd divides vid grads by the patch fold counts
    (reference search/shared.py:59-97)."""
    vid0, vid1, flows = make_inputs()
    kw = dict(ps=3, k=4, self_action="anchor", itype="float")
    s_raw = NonLocalSearch(3, 1, **kw)
    s_nrm = NonLocalSearch(3, 1, normalize_bwd=True, **kw)

    def mk(search):
        def loss(v0, v1):
            d, _ = search(v0, v1, flows)
            return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.))
        return loss

    g0_raw, g1_raw = jax.grad(mk(s_raw), (0, 1))(vid0, vid1)
    g0_nrm, g1_nrm = jax.grad(mk(s_nrm), (0, 1))(vid0, vid1)
    H, W = vid0.shape[-2:]
    c = jnp.asarray(patch_fold_counts(H, W, 3, 1))
    np.testing.assert_allclose(np.asarray(g0_nrm), np.asarray(g0_raw / c),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1_nrm), np.asarray(g1_raw / c),
                               rtol=1e-5, atol=1e-6)
