"""Warp-decomposition fast path vs the lattice engine (must be
numerically identical on the shared float-path configs)."""

import numpy as np
import pytest
import jax.numpy as jnp

from stnls_tpu.ops.nls import nls_search_volume
from stnls_tpu.ops.nls_warp import nls_warp_volume, warp_path_supported


def make_data(B=1, HD=1, T=3, F=3, H=10, W=10, wt=1, stride0=1, seed=0):
    rng = np.random.default_rng(seed)
    vid0 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    W_t = 2 * wt + 1
    nH = (H - 1) // stride0 + 1
    nW = (W - 1) // stride0 + 1
    flows = jnp.asarray(
        2.0 * rng.standard_normal((B, HD, T, W_t - 1, 2, nH, nW)),
        jnp.float32)
    return vid0, vid1, flows


CONFIGS = [
    dict(ws=3, wt=1, ps=1, stride0=1, stride1=1, dist_type="l2"),
    dict(ws=3, wt=1, ps=3, stride0=1, stride1=1, dist_type="l2"),
    dict(ws=5, wt=1, ps=3, stride0=1, stride1=1, dist_type="prod"),
    dict(ws=3, wt=1, ps=3, stride0=1, stride1=0.5, dist_type="l2"),
    dict(ws=3, wt=0, ps=3, stride0=2, stride1=1, dist_type="l2"),
    dict(ws=4, wt=1, ps=2, stride0=1, stride1=2, dist_type="l2"),
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_warp_matches_lattice(cfg):
    assert warp_path_supported(itype="float", pt=1,
                               stride1=cfg["stride1"], dilation=1)
    vid0, vid1, flows = make_data(wt=cfg["wt"], stride0=cfg["stride0"])
    d_ref, i_ref = nls_search_volume(vid0, vid1, flows, itype="float",
                                     **cfg)
    d_w, i_w = nls_warp_volume(vid0, vid1, flows, **cfg)
    dr = np.asarray(d_ref)
    dw = np.asarray(d_w)
    np.testing.assert_array_equal(np.isfinite(dr), np.isfinite(dw))
    m = np.isfinite(dr)
    np.testing.assert_allclose(dw[m], dr[m], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(i_w), np.asarray(i_ref),
                               rtol=1e-5, atol=1e-4)
