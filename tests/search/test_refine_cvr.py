"""Refine cvr engine (ops/refine_cvr.py) vs the lattice
refine_search_volume: forward volumes (incl. invalid-fill edges and
per-query data-dependent frames) and autodiff gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stnls_tpu.ops.nls import refine_search_volume
from stnls_tpu.ops.refine_cvr import refine_cvr_volume

# the cvr refinement engine comparisons take ~10 min on the
# single-core CPU runner; default-tier refine coverage rides
# tests/search/test_refinement.py (lattice engine) — this file runs
# with -m slow or on-chip via the verify recipe
pytestmark = pytest.mark.slow


def make_case(wr, ps, stride0, stride1, Ks=3, T=3, F=4, H=16, W=16, HD=1,
              B=1, wt=1, seed=0, with_invalid=False):
    rng = np.random.default_rng(seed)
    nH = (H - 1) // stride0 + 1
    nW = (W - 1) // stride0 + 1
    vid0 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    fk = np.zeros((B, HD, T, nH, nW, Ks, 3), np.float32)
    fk[..., 0] = rng.integers(-wt, wt + 1, fk.shape[:-1])
    fk[..., 1:] = rng.uniform(-2.5, 2.5, fk.shape[:-1] + (2,))
    if with_invalid:
        fk[0, 0, 1, 3, 4, 0] = (-1e8, -1e8, -1e8)
        fk[0, 0, 0, 7, 2, 1] = (-1e8, -1e8, -1e8)
    return vid0, vid1, jnp.asarray(fk)


CONFIGS = [
    dict(wr=3, ps=3, stride0=1, stride1=1, dist_type="l2", itype="float"),
    dict(wr=1, ps=3, stride0=1, stride1=1, dist_type="l2", itype="float"),
    dict(wr=3, ps=2, stride0=1, stride1=0.5, dist_type="prod",
         itype="float"),
    dict(wr=3, ps=3, stride0=2, stride1=1, dist_type="l2", itype="float"),
    dict(wr=3, ps=3, stride0=1, stride1=1, dist_type="l2", itype="int"),
]


@pytest.mark.parametrize("cfg", CONFIGS)
@pytest.mark.parametrize("with_invalid", [False, True])
def test_refine_cvr_matches_lattice(cfg, with_invalid):
    cfg = dict(cfg)
    vid0, vid1, fk = make_case(cfg["wr"], cfg["ps"], cfg["stride0"],
                               cfg["stride1"], with_invalid=with_invalid)
    d_ref, i_ref = refine_search_volume(
        vid0, vid1, fk, ws=-1, strideQ=None, dilation=1, pt=1,
        reflect_bounds_=True, use_adj=False, off_Hq=0, off_Wq=0, **cfg)
    d_cvr, i_cvr, outl = refine_cvr_volume(
        vid0, vid1, fk, dilation=1, use_adj=False, flow_budget=6,
        spread_budget=6, tile=(4, 4), **cfg)
    a, b = np.asarray(d_ref), np.asarray(d_cvr)
    keep = ~np.asarray(outl)[:, :, :, :, None, None] \
        & np.broadcast_to(True, a.shape)
    np.testing.assert_array_equal(np.isfinite(a) & keep,
                                  np.isfinite(b) & keep)
    m = np.isfinite(a) & np.isfinite(b) & keep
    scale = np.max(np.abs(a[m])) + 1e-8
    assert np.max(np.abs(a[m] - b[m])) / scale < 2e-5
    ia = np.asarray(i_ref, np.float32)
    ib = np.asarray(i_cvr, np.float32)
    keep3 = np.broadcast_to(keep[None], ia.shape)
    np.testing.assert_allclose(ia[keep3], ib[keep3], atol=1e-4)


def test_refine_cvr_gradients_match_lattice():
    cfg = dict(wr=3, ps=3, stride0=1, stride1=0.5, dist_type="l2",
               itype="float")
    vid0, vid1, fk = make_case(cfg["wr"], cfg["ps"], cfg["stride0"],
                               cfg["stride1"], seed=4)
    rng = np.random.default_rng(6)
    d_probe, _ = refine_search_volume(
        vid0, vid1, fk, ws=-1, strideQ=None, dilation=1, pt=1,
        reflect_bounds_=True, use_adj=False, off_Hq=0, off_Wq=0, **cfg)
    gd = jnp.asarray(rng.standard_normal(d_probe.shape), jnp.float32)

    def loss_ref(v0, v1, f):
        d, _ = refine_search_volume(
            v0, v1, f, ws=-1, strideQ=None, dilation=1, pt=1,
            reflect_bounds_=True, use_adj=False, off_Hq=0, off_Wq=0, **cfg)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.) * gd)

    def loss_cvr(v0, v1, f):
        d, _, _ = refine_cvr_volume(
            v0, v1, f, dilation=1, use_adj=False, flow_budget=6,
            spread_budget=6, tile=(4, 4), **cfg)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.) * gd)

    gr = jax.grad(loss_ref, (0, 1, 2))(vid0, vid1, fk)
    gc = jax.grad(loss_cvr, (0, 1, 2))(vid0, vid1, fk)
    for name, a, b in zip(("g_vid0", "g_vid1", "g_flows"), gr, gc):
        a, b = np.asarray(a), np.asarray(b)
        err = np.max(np.abs(a - b) / (np.abs(a) + 1.0))
        assert err < 5e-4, f"{name}: {err:.2e}"


def test_refine_module_cvr_matches_lattice():
    """Full RefineSearch module (anchor + topk + kr filter) on the cvr
    path vs the lattice path."""
    from stnls_tpu.search.refinement import RefineSearch
    rng = np.random.default_rng(8)
    B, HD, T, F, H, W = 1, 2, 3, 4, 16, 16
    vid0 = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)),
                       jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)),
                       jnp.float32)
    Ks = 4
    fk = np.zeros((B, HD, T, H, W, Ks, 3), np.float32)
    fk[..., 0] = rng.integers(-1, 2, fk.shape[:-1])
    fk[..., 1:] = rng.uniform(-2.5, 2.5, fk.shape[:-1] + (2,))
    fk = jnp.asarray(fk)
    kw = dict(wt=1, k=6, kr=-1, ps=3, nheads=HD, stride0=1, stride1=0.5,
              self_action="anchor_each", itype="float")
    ref = RefineSearch(-1, wr=3, impl="lattice", **kw)
    fast = RefineSearch(-1, wr=3, impl="cvr", flow_budget=6,
                        spread_budget=8, **kw)
    d_r, i_r = ref(vid0, vid1, fk)
    d_c, i_c = fast(vid0, vid1, fk)
    np.testing.assert_allclose(np.asarray(d_r), np.asarray(d_c),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(i_r), np.asarray(i_c),
                               atol=1e-4)
