"""RandIndsSearch: randomized-index search (reference
lib/stnls/search/rand_inds.py:18-48) — noise-video NLS generates inds,
RefineSearch evaluates the real videos there."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import stnls_tpu
from stnls_tpu.search import rand_inds as rand_inds_mod
from stnls_tpu.search import NonLocalSearch, RefineSearch


def make_cfg(ws=3, wt=1, ps=2, k=4):
    return {"search_name": "rand_inds", "ws": ws, "wt": wt, "ps": ps,
            "k": k, "stride0": 1, "dist_type": "l2", "itype": "float"}


def make_vids(B=1, T=3, F=3, H=8, W=8, seed=0):
    rng = np.random.default_rng(seed)
    vid0 = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, T, F, H, W)), jnp.float32)
    return vid0, vid1


def test_rand_inds_shapes_and_validity():
    cfg = make_cfg()
    search = rand_inds_mod.init(dict(cfg))
    vid0, vid1 = make_vids()
    d, i = search(vid0, vid1)
    B, T, F, H, W = 1, 3, 3, 8, 8
    k = cfg["k"]
    assert d.shape == (B, 1, T, H, W, k)
    assert i.shape == (B, 1, T, H, W, k, 3)
    assert np.isfinite(np.asarray(d)).all()
    # all returned absolute locations are in-bounds
    base_t = np.arange(T)[None, None, :, None, None, None]
    base_h = np.arange(H)[None, None, None, :, None, None]
    base_w = np.arange(W)[None, None, None, None, :, None]
    iarr = np.asarray(i)
    abs_t = base_t + iarr[..., 0]
    abs_h = base_h + iarr[..., 1]
    abs_w = base_w + iarr[..., 2]
    assert ((abs_t >= 0) & (abs_t <= T - 1)).all()
    assert ((abs_h >= -1e-4) & (abs_h <= H - 1 + 1e-4)).all()
    assert ((abs_w >= -1e-4) & (abs_w <= W - 1 + 1e-4)).all()


def test_rand_inds_matches_manual_two_stage():
    """init(cfg) pipeline == manual NLS-on-noise -> Refine-on-real with the
    same PRNG key (explicit determinism, the JAX analog of the reference's
    global-seed behavior)."""
    cfg = make_cfg()
    search = rand_inds_mod.init(dict(cfg))
    vid0, vid1 = make_vids(seed=5)
    rng = jax.random.PRNGKey(7)
    d, i = search(vid0, vid1, rng=rng)

    r0, r1 = jax.random.split(rng)
    rand0 = jax.random.normal(r0, vid0.shape, vid0.dtype)
    rand1 = jax.random.normal(r1, vid1.shape, vid1.dtype)
    zflow = jnp.zeros((1, 3, 2, 8, 8), jnp.float32)
    nls = NonLocalSearch(cfg["ws"], cfg["wt"], cfg["ps"], cfg["k"],
                         stride0=1, dist_type="l2", itype="float")
    _, inds = nls(rand0, rand1, zflow, zflow)
    refine = RefineSearch(cfg["ws"], cfg["wt"], wr=1, k=cfg["k"],
                          ps=cfg["ps"], stride0=1, dist_type="l2",
                          itype="float")
    d_gt, i_gt = refine(vid0, vid1, inds)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_gt),
                               rtol=1e-5, atol=1e-5)


def test_rand_inds_in_search_menu():
    search = stnls_tpu.search.init(make_cfg())
    assert isinstance(search, rand_inds_mod.RandIndsSearch)
