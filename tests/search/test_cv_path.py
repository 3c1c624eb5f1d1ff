"""Correlation-volume fast path vs the lattice engine (must match on the
shared configs; flows kept within flow_budget so no outliers fire)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stnls_tpu.ops.nls import nls_search_volume
from stnls_tpu.ops.nls_cv import nls_cv_volume, cv_supported


def make_data(B=1, HD=2, T=3, F=4, H=24, W=24, wt=1, stride0=1, seed=0,
              fmax=3.0):
    rng = np.random.default_rng(seed)
    vid0 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    W_t = 2 * wt + 1
    nH = (H - 1) // stride0 + 1
    nW = (W - 1) // stride0 + 1
    flows = jnp.asarray(
        fmax * (2 * rng.random((B, HD, T, W_t - 1, 2, nH, nW)) - 1),
        jnp.float32)
    return vid0, vid1, flows


CONFIGS = [
    dict(ws=3, wt=1, ps=1, stride0=1, stride1=1, dist_type="l2",
         itype="float"),
    dict(ws=3, wt=1, ps=3, stride0=1, stride1=1, dist_type="l2",
         itype="float"),
    dict(ws=5, wt=1, ps=3, stride0=1, stride1=1, dist_type="prod",
         itype="float"),
    dict(ws=3, wt=1, ps=3, stride0=1, stride1=0.5, dist_type="l2",
         itype="float"),
    dict(ws=3, wt=1, ps=3, stride0=1, stride1=0.5, dist_type="prod",
         itype="float"),
    dict(ws=3, wt=0, ps=3, stride0=2, stride1=1, dist_type="l2",
         itype="float"),
    dict(ws=3, wt=1, ps=2, stride0=1, stride1=2, dist_type="l2",
         itype="float"),
    dict(ws=3, wt=1, ps=3, stride0=1, stride1=1, dist_type="l2",
         itype="int"),
    dict(ws=3, wt=1, ps=3, stride0=1, stride1=1, dist_type="prod",
         itype="int"),
    dict(ws=3, wt=1, ps=3, stride0=1, stride1=1, dist_type="l2",
         itype="float", dilation=2),
    dict(ws=4, wt=1, ps=3, stride0=1, stride1=1, dist_type="l2",
         itype="float", full_ws=False),
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_cv_matches_lattice(cfg):
    cfg = dict(cfg)
    budget = 4
    assert cv_supported(itype=cfg["itype"], pt=1, stride1=cfg["stride1"],
                        reflect_bounds=True, ws=cfg["ws"], ps=cfg["ps"],
                        dilation=cfg.get("dilation", 1), flow_budget=budget,
                        H=24, W=24)
    vid0, vid1, flows = make_data(wt=cfg["wt"], stride0=cfg["stride0"])
    d_ref, i_ref = nls_search_volume(vid0, vid1, flows, **cfg)
    d_cv, i_cv, outl = nls_cv_volume(vid0, vid1, flows, flow_budget=budget,
                                     **cfg)
    assert not bool(jnp.any(outl)), "test flows must stay inside budget"
    dr = np.asarray(d_ref)
    dc = np.asarray(d_cv)
    np.testing.assert_array_equal(np.isfinite(dr), np.isfinite(dc))
    mfin = np.isfinite(dr)
    np.testing.assert_allclose(dc[mfin], dr[mfin], rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(i_cv), np.asarray(i_ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_cv_gradients_match_lattice():
    cfg = dict(ws=3, wt=1, ps=3, stride0=1, stride1=0.5, dist_type="l2",
               itype="float")
    vid0, vid1, flows = make_data(wt=1, F=3)

    def loss(fn, extra):
        def f(v0, v1, fl):
            out = fn(v0, v1, fl, **cfg, **extra)
            d = out[0]
            return (jnp.sum(jnp.where(jnp.isfinite(d), d, 0.) ** 2) * 1e-3
                    + 1e-4 * jnp.sum(out[1][1:] ** 2))
        return f

    g_cv = jax.grad(loss(nls_cv_volume, {"flow_budget": 4}), (0, 1, 2))(
        vid0, vid1, flows)
    g_ref = jax.grad(loss(nls_search_volume, {}), (0, 1, 2))(
        vid0, vid1, flows)
    for name, a, b in zip(["vid0", "vid1", "flows"], g_cv, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        ref = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-4 * ref,
                                   err_msg=name)


def test_cv_flags_outliers():
    cfg = dict(ws=3, wt=1, ps=3, stride0=1, stride1=1, dist_type="l2",
               itype="float")
    vid0, vid1, flows = make_data(wt=1, fmax=10.0)  # beyond budget 4
    d, i3, outl = nls_cv_volume(vid0, vid1, flows, flow_budget=4, **cfg)
    assert bool(jnp.any(outl))
    # outlier entries must be invalidated (init value)
    dn = np.asarray(d)
    om = np.asarray(jnp.broadcast_to(outl[:, :, :, :, None, None],
                                     d.shape))
    assert np.all(~np.isfinite(dn[om]) | (dn[om] > 1e30) | True)
    assert np.all(dn[om] == np.inf)


@pytest.mark.parametrize("cfg", [CONFIGS[1], CONFIGS[3], CONFIGS[4],
                                 CONFIGS[7]])
def test_cv_tiled_matches_lattice(cfg):
    cfg = dict(cfg)
    vid0, vid1, flows = make_data(wt=cfg["wt"], stride0=cfg["stride0"],
                                  H=24, W=24, fmax=3.0)
    d_ref, i_ref = nls_search_volume(vid0, vid1, flows, **cfg)
    d_cv, i_cv, outl = nls_cv_volume(
        vid0, vid1, flows, flow_budget=4, tile_q=(8, 12),
        spread_budget=8, **cfg)
    assert not bool(jnp.any(outl)), "flows must stay inside both budgets"
    dr = np.asarray(d_ref)
    dc = np.asarray(d_cv)
    np.testing.assert_array_equal(np.isfinite(dr), np.isfinite(dc))
    mfin = np.isfinite(dr)
    np.testing.assert_allclose(dc[mfin], dr[mfin], rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(i_cv), np.asarray(i_ref),
                               rtol=1e-5, atol=1e-4)


def test_cv_tiled_spill_flags():
    cfg = dict(ws=3, wt=1, ps=3, stride0=1, stride1=1, dist_type="l2",
               itype="float")
    # smooth base flow + a few large local deviations -> tile spill
    vid0, vid1, flows = make_data(wt=1, H=24, W=24, fmax=0.5)
    f = np.array(flows)
    f[..., 5:7, 5:7] += 6.0  # local spike beyond spread_budget
    d, i3, outl = nls_cv_volume(
        vid0, vid1, jnp.asarray(f), flow_budget=8, tile_q=(8, 12),
        spread_budget=3, **cfg)
    assert bool(jnp.any(outl))
    dn = np.asarray(d)
    om = np.asarray(jnp.broadcast_to(outl[:, :, :, :, None, None], d.shape))
    assert np.all(dn[om] == np.inf)
    # non-outlier entries still match the lattice path
    d_ref, _ = nls_search_volume(vid0, vid1, jnp.asarray(f), **cfg)
    dr = np.asarray(d_ref)
    keep = ~om & np.isfinite(dr)
    np.testing.assert_allclose(dn[keep], dr[keep], rtol=3e-4, atol=3e-4)


@pytest.mark.slow
def test_cv_tiled_gradients_match():
    cfg = dict(ws=3, wt=1, ps=3, stride0=1, stride1=0.5, dist_type="l2",
               itype="float")
    vid0, vid1, flows = make_data(wt=1, F=3, H=24, W=24)

    def loss(fn, extra):
        def f(v0, v1, fl):
            out = fn(v0, v1, fl, **cfg, **extra)
            d = out[0]
            return (jnp.sum(jnp.where(jnp.isfinite(d), d, 0.) ** 2) * 1e-3
                    + 1e-4 * jnp.sum(out[1][1:] ** 2))
        return f

    g_cv = jax.grad(loss(nls_cv_volume,
                         {"flow_budget": 4, "tile_q": (8, 12),
                          "spread_budget": 8}), (0, 1, 2))(
        vid0, vid1, flows)
    g_ref = jax.grad(loss(nls_search_volume, {}), (0, 1, 2))(
        vid0, vid1, flows)
    for name, a, b in zip(["vid0", "vid1", "flows"], g_cv, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        ref = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-4 * ref,
                                   err_msg=name)
