"""NonLocalGatherAdd pallas fast path (K-reduced fused gather) vs the jnp
engine at the degenerate strideIn=strideOut=1 config — forward and grads,
including the reference's -1e8 invalid-fill skip
(gather_add_kernel.cu:71-73)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stnls_tpu.agg.gather_add import non_local_gather_add


def make_data(B=1, HD=1, T=3, F=4, H=24, W=24, K=3, wt=1, seed=0):
    rng = np.random.default_rng(seed)
    vid = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)), jnp.float32)
    w = jnp.asarray(rng.random((B, HD, T * H * W, K)), jnp.float32)
    fl = np.zeros((B, HD, T, H, W, K, 3), np.float32)
    fl[..., 0] = rng.integers(-wt, wt + 1, fl.shape[:-1])
    fl[..., 1:] = 3.0 * (2 * rng.random(fl.shape[:-1] + (2,)) - 1) + 0.25
    # a few reference-style invalid fills
    fl[0, 0, 1, 5, 5, 0] = (-1e8, -1e8, -1e8)
    fl[0, 0, 0, 2, 9, 1] = (-1e8, -1e8, -1e8)
    return vid, w, jnp.asarray(fl)


@pytest.mark.parametrize("itype,ps", [("float", 3), ("int", 1)])
def test_gather_add_pallas_matches_jnp(itype, ps):
    vid, w, fl = make_data()
    kw = dict(ps=ps, strideIn=1, strideOut=1, itype=itype)
    ref = non_local_gather_add(vid, w, fl, impl="jnp", **kw)
    got = non_local_gather_add(vid, w, fl, impl="pallas", budget=4,
                               spread=10, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gather_add_pallas_gradients():
    vid, w, fl = make_data(F=2)
    kw = dict(ps=3, strideIn=1, strideOut=1, itype="float")

    def loss(impl):
        def f(v, ww, fx):
            out = non_local_gather_add(v, ww, fx, impl=impl, budget=4,
                                       spread=10, **kw)
            return jnp.mean(out ** 2)
        return f

    gr = jax.grad(loss("jnp"), (0, 1, 2))(vid, w, fl)
    gp = jax.grad(loss("pallas"), (0, 1, 2))(vid, w, fl)
    for name, a, b in zip(("vid", "w", "flows"), gr, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)
