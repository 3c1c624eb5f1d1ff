"""PairedRefine vs RefineSearch via the frame-streaming decomposition
(reference tests/search/test_paired_refine.py:52-105: paired_vids over a
wr x wr refinement window reproduces RefineSearch on the full video)."""

import numpy as np
import pytest
import jax.numpy as jnp

from stnls_tpu.search import RefineSearch, PairedRefine
from stnls_tpu.search.utils import get_time_window_inds


def make_data(B=1, HD=1, T=3, F=3, H=10, W=10, seed=0):
    """Videos in the reference's paired layout [B,T,(HD F),H,W]."""
    rng = np.random.default_rng(seed)
    vid0 = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)),
                       jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)),
                       jnp.float32)
    return vid0, vid1


def make_slot_flows(B, HD, T, nH, nW, ws, wt, seed=0, itype="float"):
    """Per-window-slot grouped flows [B,HD,T,nH,nW,K,3] with dt fixed per
    slot group — the layout paired_vids_refine expects (reference
    test_paired_refine.py:70-80)."""
    rng = np.random.default_rng(seed + 1)
    W_t = 2 * wt + 1
    K_each = ws * ws
    K = W_t * K_each
    flows = np.zeros((B, HD, T, nH, nW, K, 3), np.float32)
    # spatial offsets strictly away from integers (float path)
    sp = rng.random((B, HD, T, nH, nW, K, 2)).astype(np.float32) / 2. + 1.2
    if itype == "int":
        sp = np.round(sp)
    flows[..., 1:] = sp
    for ti in range(T):
        t_grid = get_time_window_inds(ti, wt, T)
        for _tj in range(W_t):
            tj = t_grid[_tj]
            ks, ke = _tj * K_each, (_tj + 1) * K_each
            flows[:, :, ti, :, :, ks:ke, 0] = tj - ti
    return jnp.asarray(flows)


@pytest.mark.parametrize("wr", [1, 3])
@pytest.mark.parametrize("dist_type", ["l2", "prod"])
@pytest.mark.parametrize("itype", ["float", "int"])
def test_paired_refine_matches_refine(wr, dist_type, itype):
    B, HD, T, F, H, W = 1, 1, 3, 1, 10, 10
    ws, wt, ps, stride0 = 3, 1, 3, 1
    vid0, vid1 = make_data(B, HD, T, F, H, W)
    nH, nW = H // stride0, W // stride0
    flows = make_slot_flows(B, HD, T, nH, nW, ws, wt, itype=itype)

    refine_gt = RefineSearch(ws, wt, wr=wr, k=-1, ps=ps, stride0=stride0,
                             dist_type=dist_type, itype=itype,
                             topk_mode="all")
    d_gt, i_gt = refine_gt(vid0, vid1, flows)

    refine_te = PairedRefine(ws, wr, k=-1, ps=ps, stride0=stride0,
                             dist_type=dist_type, itype=itype,
                             topk_mode="all")
    d_te, i_te = refine_te.paired_vids(vid0, vid1, flows, wt)

    # K=-1 topk "all" sorts both outputs by distance -> directly comparable
    np.testing.assert_allclose(np.asarray(d_gt), np.asarray(d_te),
                               rtol=1e-3, atol=1e-3)


def test_paired_refine_wr1_reevaluates_flows():
    """wr=1: PairedRefine just evaluates each given flow; with
    topk_mode='all' the dists match RefineSearch's wr=1 evaluation and the
    flows are returned (possibly reordered by distance)."""
    B, HD, T, F, H, W = 1, 1, 3, 2, 8, 8
    ws, wt, ps = 3, 1, 2
    vid0, vid1 = make_data(B, HD, T, F, H, W)
    flows = make_slot_flows(B, HD, T, H, W, ws, wt, seed=3)

    pr = PairedRefine(ws, wr=1, k=-1, ps=ps, stride0=1, dist_type="l2")
    d, i = pr.paired_vids(vid0, vid1, flows, wt)
    K = flows.shape[-2]
    assert d.shape == (B, HD, T, H, W, K)
    assert i.shape == (B, HD, T, H, W, K, 3)
    # every returned (dt,dh,dw) is one of the inputs for that query —
    # away from the boundary, where reflect_bounds can't have moved it
    # (input offsets are < 2 px, so margin 2 suffices)
    fin = np.asarray(flows)
    iout = np.asarray(i)
    match = np.isclose(iout[..., None, :], fin[..., None, :, :],
                       atol=1e-4).all(-1).any(-1)
    assert match[:, :, :, 2:H - 2, 2:W - 2].all()


def test_paired_refine_cvr_matches_lattice():
    """PairedRefine on the cvr fast path (T=1 refine specialization) vs
    the lattice path."""
    import numpy as np
    import jax.numpy as jnp
    from stnls_tpu.search.paired_refine import PairedRefine

    rng = np.random.default_rng(13)
    B, HD, F, H, W = 1, 2, 4, 16, 16
    f0 = jnp.asarray(rng.standard_normal((B, HD * F, H, W)), jnp.float32)
    f1 = jnp.asarray(rng.standard_normal((B, HD * F, H, W)), jnp.float32)
    K2 = 4
    fk = jnp.asarray(rng.uniform(-2.5, 2.5, (B, HD, H, W, K2, 2)),
                     jnp.float32)
    kw = dict(wr=3, k=6, kr=-1, ps=3, nheads=HD, stride0=1, stride1=0.5,
              self_action="anchor_each", itype="float")
    ref = PairedRefine(-1, impl="lattice", **kw)
    fast = PairedRefine(-1, impl="cvr", flow_budget=6, spread_budget=8,
                        **kw)
    d_r, i_r = ref(f0, f1, fk)
    d_c, i_c = fast(f0, f1, fk)
    np.testing.assert_allclose(np.asarray(d_r), np.asarray(d_c),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(i_r), np.asarray(i_c), atol=1e-4)
