"""PairedSearch vs NonLocalSearch via the frame-streaming decomposition
(reference tests/search/test_paired_search.py:48-94)."""

import numpy as np
import pytest
import jax.numpy as jnp

from stnls_tpu.search import NonLocalSearch, PairedSearch
from stnls_tpu.nn import search_flow


def make_data(B=1, HD=1, T=3, F=3, H=8, W=8, seed=0):
    rng = np.random.default_rng(seed)
    vid0 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    fflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
    return vid0, vid1, fflow, bflow


@pytest.mark.parametrize("itype", ["float"])
def test_paired_vids_matches_nls(itype):
    vid0, vid1, fflow, bflow = make_data()
    ws, wt, ps = 3, 1, 2
    flows = search_flow(fflow, bflow, wt, 1)
    nls = NonLocalSearch(ws, wt, ps, k=-1, topk_mode="none",
                         dist_type="l2", itype=itype)
    d0, i0 = nls(vid0, vid1, flows)

    paired = PairedSearch(ws, ps, k=-1, stride0=1, dist_type="l2",
                          itype=itype)
    # vid layout for paired_vids: [B,T,(HD F),H,W]
    v0 = jnp.transpose(vid0, (0, 2, 1, 3, 4, 5)).reshape(1, 3, 3, 8, 8)
    v1 = jnp.transpose(vid1, (0, 2, 1, 3, 4, 5)).reshape(1, 3, 3, 8, 8)
    d1, i1 = paired.paired_vids(v0, v1, flows, wt)

    # both enumerate the same search volume per query (slot order matches
    # the boundary-shifted time walk)
    np.testing.assert_allclose(np.asarray(d0).reshape(-1),
                               np.asarray(d1).reshape(-1), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(i0).reshape(-1, 3),
                               np.asarray(i1).reshape(-1, 3), atol=1e-4)


def test_paired_cvr_matches_lattice():
    """The cvr fast path (T=1/wt=0 NLS specialization) must equal the
    lattice paired pipeline — dists and 2-d inds, anchored."""
    import numpy as np
    import jax.numpy as jnp
    from stnls_tpu.search.paired_search import PairedSearch

    rng = np.random.default_rng(11)
    B, HD, F, H, W = 1, 2, 4, 16, 16
    f0 = jnp.asarray(rng.standard_normal((B, HD * F, H, W)), jnp.float32)
    f1 = jnp.asarray(rng.standard_normal((B, HD * F, H, W)), jnp.float32)
    flow = jnp.asarray(2.0 * rng.standard_normal((B, HD, 2, H, W)) + 0.25,
                       jnp.float32)
    kw = dict(ps=3, k=5, nheads=HD, stride0=1, stride1=0.5,
              self_action="anchor", itype="float")
    ref = PairedSearch(5, impl="lattice", **kw)
    fast = PairedSearch(5, impl="cvr", spread_budget=12, **kw)
    d_ref, i_ref = ref(f0, f1, flow)
    d_cvr, i_cvr = fast(f0, f1, flow)
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_cvr),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(i_ref), np.asarray(i_cvr),
                               atol=1e-4)
