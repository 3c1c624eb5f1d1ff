"""Default-path budget surfacing (VERDICT r2 #4): a flow that exceeds
every fused-kernel spread bucket must end up EXACT (escalated to the
exhaustive lattice engine, reference contract
non_local_search_int_kernel.cu:127-141) or visibly fail (forced fused
impl) — never silent init-valued dists.

spread_budget="auto" (the default) resolves against the kernel's exact
spill condition (ops.nls_pallas.pallas_outliers) from concrete flows."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stnls_tpu.search.non_local_search import (
    NonLocalSearch, resolve_spread_budget, SPREAD_BUDGET_BUCKETS,
)


def _mk(off=30.0, H=64, W=64, T=2, F=4, seed=0):
    rng = np.random.default_rng(seed)
    vid0 = jnp.asarray(rng.standard_normal((1, 1, T, F, H, W)), jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((1, 1, T, F, H, W)), jnp.float32)
    # coherent +off px shift with small jitter; reflection at the far
    # boundary flips the effective offset, giving ~2*off in-tile spread
    flows = off + jnp.asarray(
        rng.uniform(-1.0, 1.0, (1, 1, T, 1, 2, H, W)), jnp.float32)
    return vid0, vid1, flows


def _base_cfg(ws=3, ps=1):
    return dict(ws=ws, wt=1, ps=ps, k=4, stride0=1, stride1=1,
                dist_type="l2", dilation=1, pt=1, self_action="anchor",
                topk_mode="all", ws_interior=0, reflect_bounds=True,
                full_ws=True, use_adj=False, normalize_bwd=False,
                k_agg=-1, off_Hq=0, off_Wq=0, strideQ=None, itype="float",
                impl="auto", flow_budget=32, spread_budget="auto",
                cv_tile=None, qchunk=None, band_dtype=None, grad="auto",
                channel_chunk=4, mx_precision="high")


def test_resolver_small_flow_picks_bucket():
    vid0, vid1, flows = _mk(off=2.0)
    sb = resolve_spread_budget("auto", flows, vid0.shape,
                               dict(_base_cfg(), flow_budget=8),
                               assume_fused=True)
    assert sb in SPREAD_BUDGET_BUCKETS


def test_resolver_30px_flow_escalates():
    """30 px flows reflect at the boundary of a 64^2 frame: in-tile
    spread ~60 exceeds every bucket -> resolver says 'no exact bucket'."""
    vid0, vid1, flows = _mk(off=30.0)
    sb = resolve_spread_budget("auto", flows, vid0.shape, _base_cfg(),
                               assume_fused=True)
    assert sb == -1


def test_30px_default_path_matches_lattice_with_visible_escalation():
    """The module's default path at 30 px flows must match
    impl='lattice' exactly, warning about the escalation (not silently
    degrading). Exercises _get_fn's -1 handling directly, since on the
    CPU suite auto never routes to the fused kernel."""
    vid0, vid1, flows = _mk(off=30.0)
    search = NonLocalSearch(3, 1, ps=1, k=4, nheads=1,
                            self_action="anchor", itype="float")
    with pytest.warns(RuntimeWarning, match="exhaustive lattice"):
        fn = search._get_fn(32, -1)
    d, i = fn(vid0, vid1, flows)
    ref = NonLocalSearch(3, 1, ps=1, k=4, nheads=1, impl="lattice",
                         self_action="anchor", itype="float")
    d_ref, i_ref = ref(vid0, vid1, flows)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(i, np.float32),
                               np.asarray(i_ref, np.float32), atol=1e-5)


def test_forced_fused_impl_raises_on_escalation():
    search = NonLocalSearch(3, 1, ps=1, k=4, nheads=1, impl="pallas",
                            self_action="anchor", itype="float")
    with pytest.raises(AssertionError, match="spread_budget"):
        search._get_fn(32, -1)
