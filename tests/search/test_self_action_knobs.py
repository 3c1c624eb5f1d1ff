"""Property tests for the self_action menu, topk_mode="each", flow-head
broadcast, and ws_interior — knobs the reference exercises through its
impl dispatch (lib/stnls/search/impl/non_local_search.py:89-134)."""

import numpy as np
import pytest
import jax.numpy as jnp

from stnls_tpu.search import NonLocalSearch
from stnls_tpu.ops.nls import nls_search_core


def make(seed=0, B=1, T=3, F=3, H=10, W=10, wt=1, HDv=1, HDf=1,
         int_flows=True):
    rng = np.random.default_rng(seed)
    vid = jnp.asarray(rng.standard_normal((B, T, HDv * F, H, W)),
                      jnp.float32)
    flows = rng.standard_normal((B, HDf, T, 2 * wt, 2, H, W)) * 2
    if int_flows:
        flows = np.round(flows)
    return vid, jnp.asarray(flows.astype(np.float32))


def test_self_action_anchor_puts_self_first():
    vid, flows = make()
    s = NonLocalSearch(3, 1, ps=1, k=5, self_action="anchor", itype="int")
    d, i = s(vid, vid, flows)
    # self entry: zero offset, zero l2 distance, at slot 0
    np.testing.assert_allclose(np.asarray(i[..., 0, :]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d[..., 0]), 0.0, atol=1e-5)


def test_self_action_remove_drops_self():
    vid, flows = make()
    s = NonLocalSearch(3, 1, ps=1, k=5, self_action="remove", itype="int")
    d, i = s(vid, vid, flows)
    iz = np.all(np.asarray(i) == 0, axis=-1)
    assert not iz.any(), "self entry must be removed"
    assert d.shape[-1] == 5


def test_self_action_remove_ref_frame():
    vid, flows = make()
    s = NonLocalSearch(3, 1, ps=1, k=5, self_action="remove_ref_frame",
                       itype="int")
    d, i = s(vid, vid, flows)
    dt = np.asarray(i[..., 0])
    fin = np.isfinite(np.asarray(d))
    assert not (dt[fin] == 0).any(), "ref-frame entries must be removed"


def test_self_action_anchor_and_remove_ref_frame():
    vid, flows = make()
    s = NonLocalSearch(3, 1, ps=1, k=4,
                       self_action="anchor_and_remove_ref_frame",
                       itype="int")
    d, i = s(vid, vid, flows)
    dt = np.asarray(i[..., 0])
    fin = np.isfinite(np.asarray(d))
    assert not (dt[fin] == 0).any()


def test_anchor_each_with_topk_each():
    """anchor_each pins each time-slot group's self-most entry first;
    topk_mode='each' takes k per group -> K = W_t * k."""
    vid, flows = make()
    wt, k = 1, 2
    s = NonLocalSearch(3, wt, ps=1, k=k, self_action="anchor_each",
                       topk_mode="each", itype="int")
    d, i = s(vid, vid, flows)
    W_t = 2 * wt + 1
    assert d.shape[-1] == W_t * k
    # group 0 is the ref frame: its anchored first entry is the true self
    np.testing.assert_allclose(np.asarray(i[..., 0, :]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d[..., 0]), 0.0, atol=1e-5)


def test_flow_head_broadcast():
    """HDf=1 flows with nheads=2 must equal explicitly tiled flows
    (ops/nls.py flow-head broadcast)."""
    vid, flows1 = make(HDv=2, HDf=1)
    flows2 = jnp.tile(flows1, (1, 2, 1, 1, 1, 1, 1))
    s = NonLocalSearch(3, 1, ps=1, k=4, nheads=2, itype="int")
    d1, i1 = s(vid, vid, flows1)
    d2, i2 = s(vid, vid, flows2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), rtol=1e-6)


def test_ws_interior_limits_interior_windows():
    """Int path: interior queries search ws_interior^2 cells; bottom/right
    boundary queries keep the full ws^2 window (reference
    set_search_offsets edge logic)."""
    rng = np.random.default_rng(0)
    B, HD, T, F, H, W = 1, 1, 2, 3, 12, 12
    vid0 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    flows = jnp.zeros((B, HD, T, 0, 2, H, W), jnp.float32)
    d_int, _ = nls_search_core(vid0, vid1, flows, ws=5, wt=0, ps=1,
                               stride0=1, stride1=1, dist_type="l2",
                               itype="int", ws_interior=3)
    d = np.asarray(d_int)   # [B,HD,T,nH,nW,W_t,ws,ws]
    n_fin = np.isfinite(d).reshape(*d.shape[:5], -1).sum(-1)
    # an interior query away from every boundary
    assert n_fin[0, 0, 0, 6, 6] == 9
    # the bottom-right corner query keeps the full window
    assert n_fin[0, 0, 0, H - 1, W - 1] == 25
