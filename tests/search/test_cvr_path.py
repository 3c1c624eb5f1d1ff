"""Rebased correlation-volume engine (ops.nls_cvr) vs the lattice engine:
forward volumes across the knob grid, plus full autodiff gradients (the
cvr engine is pure XLA, so grads come from autodiff — they must match the
lattice engine's)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stnls_tpu.ops.nls import nls_search_volume
from stnls_tpu.ops.nls_cvr import nls_cvr_volume


def make_case(ws, wt, ps, stride0, stride1, T=3, F=4, H=16, W=16, HD=1,
              B=1, seed=0):
    rng = np.random.default_rng(seed)
    W_t = min(2 * wt + 1, T)
    nH = (H - 1) // stride0 + 1
    nW = (W - 1) // stride0 + 1
    vid0 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    flows = jnp.asarray(
        rng.uniform(-2.5, 2.5, (B, HD, T, W_t - 1, 2, nH, nW)), jnp.float32)
    return vid0, vid1, flows


CONFIGS = [
    dict(ws=3, wt=1, ps=3, stride0=1, stride1=1, dist_type="l2",
         itype="float"),
    dict(ws=5, wt=1, ps=3, stride0=1, stride1=0.5, dist_type="l2",
         itype="float"),
    dict(ws=3, wt=1, ps=3, stride0=2, stride1=1, dist_type="l2",
         itype="float"),
    dict(ws=3, wt=1, ps=2, stride0=1, stride1=0.5, dist_type="prod",
         itype="float"),
    dict(ws=3, wt=1, ps=3, stride0=1, stride1=1, dist_type="l2",
         itype="int"),
    dict(ws=3, wt=1, ps=3, stride0=1, stride1=0.5, dist_type="prod",
         itype="int"),
    dict(ws=3, wt=2, ps=2, stride0=2, stride1=0.5, dist_type="l2",
         itype="float", T=4),
    dict(ws=3, wt=1, ps=3, stride0=1, stride1=2, dist_type="l2",
         itype="float"),
    dict(ws=3, wt=1, ps=3, stride0=3, stride1=1, dist_type="l2",
         itype="float", H=13, W=13),
]

FAST_SET = (0, 1, 2, 4)


@pytest.mark.parametrize("cfg", [
    pytest.param(c, marks=() if i in FAST_SET else (pytest.mark.slow,))
    for i, c in enumerate(CONFIGS)])
def test_cvr_matches_lattice(cfg):
    cfg = dict(cfg)
    T = cfg.pop("T", 3)
    H = cfg.pop("H", 16)
    W = cfg.pop("W", 16)
    vid0, vid1, flows = make_case(cfg["ws"], cfg["wt"], cfg["ps"],
                                  cfg["stride0"], cfg["stride1"],
                                  T=T, H=H, W=W)
    d_ref, i_ref = nls_search_volume(
        vid0, vid1, flows, strideQ=None, dilation=1, pt=1,
        reflect_bounds_=True, use_adj=False, off_Hq=0, off_Wq=0,
        ws_interior=0, **cfg)
    d_cvr, i_cvr, outl = nls_cvr_volume(
        vid0, vid1, flows, dilation=1, use_adj=False, flow_budget=6,
        spread_budget=6, tile=(4, 4), **cfg)
    assert not bool(jnp.any(outl))
    mask = np.isfinite(np.asarray(d_ref)) & np.isfinite(np.asarray(d_cvr))
    a, b = np.asarray(d_ref), np.asarray(d_cvr)
    scale = np.max(np.abs(a[mask])) + 1e-8
    np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b))
    assert np.max(np.abs(a[mask] - b[mask])) / scale < 2e-5
    np.testing.assert_allclose(np.asarray(i_ref, np.float32),
                               np.asarray(i_cvr, np.float32), atol=1e-4)


def test_cvr_gradients_match_lattice():
    cfg = dict(ws=3, wt=1, ps=3, stride0=1, stride1=0.5, dist_type="l2",
               itype="float")
    vid0, vid1, flows = make_case(cfg["ws"], cfg["wt"], cfg["ps"],
                                  cfg["stride0"], cfg["stride1"], seed=3)
    rng = np.random.default_rng(5)
    gd = None

    def loss(engine):
        def f(v0, v1, fl):
            if engine == "ref":
                d, _ = nls_search_volume(
                    v0, v1, fl, strideQ=None, dilation=1, pt=1,
                    reflect_bounds_=True, use_adj=False, off_Hq=0,
                    off_Wq=0, ws_interior=0, **cfg)
            else:
                d, _, _ = nls_cvr_volume(
                    v0, v1, fl, dilation=1, use_adj=False, flow_budget=6,
                    spread_budget=6, tile=(4, 4), **cfg)
            return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.) * gd)
        return f

    d_probe, _ = nls_search_volume(
        vid0, vid1, flows, strideQ=None, dilation=1, pt=1,
        reflect_bounds_=True, use_adj=False, off_Hq=0, off_Wq=0,
        ws_interior=0, **cfg)
    gd = jnp.asarray(rng.standard_normal(d_probe.shape), jnp.float32)

    gr = jax.grad(loss("ref"), (0, 1, 2))(vid0, vid1, flows)
    gc = jax.grad(loss("cvr"), (0, 1, 2))(vid0, vid1, flows)
    for name, a, b in zip(("g_vid0", "g_vid1", "g_flows"), gr, gc):
        a, b = np.asarray(a), np.asarray(b)
        err = np.max(np.abs(a - b) / (np.abs(a) + 1.0))
        assert err < 5e-4, f"{name}: {err:.2e}"


def test_impl_cvr_routes_to_cvr_engine(monkeypatch):
    """impl="cvr" must actually run the cvr engine (regression: a routing
    reorder once dropped the cvr branch from nls_pipeline, silently
    falling through to the lattice engine)."""
    import stnls_tpu.ops.nls_cvr as nls_cvr_mod
    from stnls_tpu.search.non_local_search import NonLocalSearch

    calls = []
    orig = nls_cvr_mod.nls_cvr_volume

    def spy(*args, **kwargs):
        calls.append(1)
        return orig(*args, **kwargs)

    monkeypatch.setattr(nls_cvr_mod, "nls_cvr_volume", spy)
    vid0, vid1, flows = make_case(3, 1, 3, 1, 1)
    search = NonLocalSearch(3, 1, ps=3, k=4, nheads=1, impl="cvr",
                            self_action="anchor", itype="float",
                            flow_budget=6, spread_budget=6)
    d, i = search(vid0[:, 0], vid1[:, 0], flows)
    assert calls, "impl='cvr' did not reach the cvr engine"
    assert np.isfinite(np.asarray(d)).all()
