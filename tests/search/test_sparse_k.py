"""Sparse top-K grad path (ops/nls_k.py) vs the dense pipeline.

The reference backward is K-sparse (impl/non_local_search.py:142-212:
grad_dists/grad_inds arrive at the K selected entries and only those
patches are touched). grad="sparse_k" mirrors that structure: the engine
selects cells under stop_gradient and ops.nls_k re-evaluates exactly the
winners differentiably. These tests pin value, index, and gradient parity
against the dense autodiff path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stnls_tpu.search.non_local_search import NonLocalSearch


def _mk(seed=0, B=1, T=4, F=8, H=16, W=16, HD=2, wt=1, amp=2.5):
    rng = np.random.default_rng(seed)
    vid = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)),
                      jnp.float32)
    flows = jnp.asarray(
        amp * rng.standard_normal((B, T, 2 * wt, 2, H, W)), jnp.float32)
    return vid, flows


CFGS = [
    dict(itype="float", self_action="anchor", stride1=0.5, dist_type="l2"),
    dict(itype="float", self_action=None, stride1=1, dist_type="l2"),
    dict(itype="float", self_action="anchor", stride1=1, dist_type="prod"),
    dict(itype="int", self_action="anchor", stride1=1, dist_type="l2"),
]


@pytest.mark.parametrize("cfg", CFGS)
def test_sparse_k_matches_dense(cfg):
    ws, wt, ps, K, HD = 3, 1, 3, 5, 2
    vid, flows = _mk(wt=wt)
    kw = dict(nheads=HD, stride0=1, **cfg)
    d1, i1 = NonLocalSearch(ws, wt, ps, K, grad="sparse_k", **kw)(
        vid, vid, flows)
    d0, i0 = NonLocalSearch(ws, wt, ps, K, grad="dense", **kw)(
        vid, vid, flows)
    fin = jnp.isfinite(d0)
    assert bool(jnp.all(fin == jnp.isfinite(d1)))
    assert float(jnp.max(jnp.abs(jnp.where(fin, d1 - d0, 0.)))) < 2e-4
    di = jnp.abs(i1.astype(jnp.float32) - i0.astype(jnp.float32))
    assert float(jnp.max(jnp.where(fin[..., None], di, 0.))) < 1e-5


def test_sparse_k_grads_match_dense():
    ws, wt, ps, K, HD = 3, 1, 3, 5, 2
    vid, flows = _mk(wt=wt)
    kw = dict(nheads=HD, stride0=1, stride1=0.5, self_action="anchor",
              itype="float", dist_type="l2")
    s1 = NonLocalSearch(ws, wt, ps, K, grad="sparse_k", **kw)
    s0 = NonLocalSearch(ws, wt, ps, K, grad="dense", **kw)

    def loss(fn, v, fl):
        d, i = fn(v, v, fl)
        d = jnp.where(jnp.isfinite(d), d, 0.)
        return jnp.mean(d ** 2) + 1e-2 * jnp.mean(i ** 2)

    g1 = jax.grad(lambda v, fl: loss(s1, v, fl), argnums=(0, 1))(vid, flows)
    g0 = jax.grad(lambda v, fl: loss(s0, v, fl), argnums=(0, 1))(vid, flows)
    for a, b in zip(g1, g0):
        scale = float(jnp.max(jnp.abs(b))) + 1e-8
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-4


def test_sparse_k_stride0_and_band():
    """stride0>1 query grids + the banded stage-B path (small band cap
    forced via a tiny memory budget is not reachable here, so call
    nls_dists_at_cells with explicit bands instead)."""
    from stnls_tpu.ops.nls_k import nls_dists_at_cells
    ws, wt, ps, K, HD = 3, 1, 3, 4, 1
    vid, _ = _mk(F=8, HD=HD, wt=wt)
    rng = np.random.default_rng(3)
    # flows live on the query grid (reference search_flow contract)
    flows = jnp.asarray(
        2.5 * rng.standard_normal((1, 4, 2 * wt, 2, 8, 8)), jnp.float32)
    kw = dict(nheads=HD, stride0=2, stride1=1, self_action="anchor",
              itype="float", dist_type="l2")
    d1, i1 = NonLocalSearch(ws, wt, ps, K, grad="sparse_k", **kw)(
        vid, vid, flows)
    d0, i0 = NonLocalSearch(ws, wt, ps, K, grad="dense", **kw)(
        vid, vid, flows)
    fin = jnp.isfinite(d0)
    assert float(jnp.max(jnp.abs(jnp.where(fin, d1 - d0, 0.)))) < 2e-4

    # banded == unbanded for the recompute
    from stnls_tpu.search.utils import shape_vids, shape_flows
    from stnls_tpu.search.non_local_search import _select_cells
    v6 = shape_vids(HD, [vid])[0]
    fl = shape_flows(HD, flows)
    cfg = dict(ws=ws, wt=wt, ps=ps, k=K, stride0=2, stride1=1.0,
               dist_type="l2", dilation=1, pt=1, self_action="anchor",
               topk_mode="all", ws_interior=0, reflect_bounds=True,
               full_ws=True, use_adj=False, off_Hq=0, off_Wq=0,
               strideQ=None, itype="float", impl="auto", qchunk=None)
    cells = _select_cells(v6, v6, fl, cfg)
    kw2 = dict(ws=ws, wt=wt, ps=ps, stride0=2, stride1=1.0,
               dist_type="l2", itype="float")
    d_full, off_full = nls_dists_at_cells(v6, v6, fl, cells, **kw2)
    nH = cells.shape[-3]
    rows = nH // 2
    parts = []
    for b in range(2):
        sl = slice(b * rows, (b + 1) * rows)
        d_b, _ = nls_dists_at_cells(
            v6, v6, fl[..., sl, :], cells[:, :, :, sl], row0=b * rows,
            **kw2)
        parts.append(d_b)
    d_band = jnp.concatenate(parts, axis=3)
    assert float(jnp.max(jnp.abs(d_band - d_full))) < 1e-5
