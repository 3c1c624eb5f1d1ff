"""Cross-implementation equivalence: matmul-based N3MM search vs the
lattice-engine NonLocalSearch (the reference's primary oracle pattern,
tests/search/test_non_local_search_int.py:51-133)."""

import numpy as np
import jax.numpy as jnp

from stnls_tpu.search import NonLocalSearch, N3MatMultSearch


def test_n3mm_matches_nls_prod():
    rng = np.random.default_rng(0)
    B, T, C, H, W = 1, 3, 4, 8, 8
    vid0 = jnp.asarray(rng.standard_normal((B, T, C, H, W)), jnp.float32)
    vid1 = jnp.asarray(rng.standard_normal((B, T, C, H, W)), jnp.float32)
    ws, wt, ps, k = 3, 1, 3, -1

    n3mm = N3MatMultSearch(ws, wt, ps, k, nheads=1, dist_type="prod",
                           stride0=1, stride1=1)
    d_mm, i_mm = n3mm(vid0, vid1)  # zero flows

    nls = NonLocalSearch(ws, wt, ps, k, nheads=1, dist_type="prod",
                         stride0=1, stride1=1, topk_mode="none",
                         itype="float")
    d_ref, i_ref = nls(vid0, vid1)

    d_mm = np.asarray(d_mm)
    d_ref = np.asarray(d_ref)
    # mask invalid (out-of-window) entries of the lattice search
    valid = np.isfinite(d_ref)
    # n3mm evaluates every lattice point (its grid is pre-clamped), so
    # compare the intersection: sort both lists per query and compare the
    # shared finite prefix
    ds_mm = np.sort(d_mm.reshape(-1, d_mm.shape[-1]), axis=-1)[:, ::-1]
    d_ref2 = np.where(valid, d_ref, -np.inf)
    ds_ref = np.sort(d_ref2.reshape(-1, d_ref.shape[-1]), axis=-1)[:, ::-1]
    n_valid = valid.reshape(-1, d_ref.shape[-1]).sum(-1)
    for i in range(ds_mm.shape[0]):
        nv = int(n_valid[i])
        np.testing.assert_allclose(ds_mm[i, :nv], ds_ref[i, :nv],
                                   rtol=1e-4, atol=1e-4)
