"""Fused Pallas ScatterAdd / Pool kernels (interpret mode) vs the jnp
engines — forward values and vid/weights gradients (the kernels are
int-offset ops like the reference: scatter_add rounds flows, pool is
int-only; reference lib/csrc/agg/scatter_add_kernel.cu,
pool_int_kernel.cu)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stnls_tpu.ops.agg import nl_scatter_add, nl_pool, nl_gather_stack
from stnls_tpu.ops.agg_pallas_sp import (
    nl_scatter_add_pallas, nl_pool_pallas,
)
from stnls_tpu.ops.agg_pallas import nl_gather_stack_pallas


def make_data(seed=0, B=1, HD=1, T=3, F=4, H=16, W=16, K=3, s0=1,
              fmax=2, tmax=1):
    rng = np.random.default_rng(seed)
    nH, nW = (H - 1) // s0 + 1, (W - 1) // s0 + 1
    vid = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    w = jnp.asarray(rng.random((B, HD, T, nH, nW, K)), jnp.float32)
    fl = np.asarray(rng.integers(-fmax, fmax + 1,
                                 (B, HD, T, nH, nW, K, 3)), np.float32)
    fl[..., 0] = np.clip(fl[..., 0], -tmax, tmax)
    return vid, w, jnp.asarray(fl)


def test_scatter_add_pallas_smoke():
    vid, w, fl = make_data()
    o_ref, _ = nl_scatter_add(vid, w, fl, ps=3, strideIn=1, strideOut=1)
    o_p, outl = nl_scatter_add_pallas(vid, w, fl, ps=3, budget=8,
                                      spread=12, interpret=True)
    assert int(jnp.sum(outl)) == 0
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)

    def lr(v, ww):
        o, _ = nl_scatter_add(v, ww, fl, ps=3, strideIn=1, strideOut=1)
        return jnp.mean(jnp.tanh(o))

    def lp(v, ww):
        o, _ = nl_scatter_add_pallas(v, ww, fl, ps=3, budget=8,
                                     spread=12, interpret=True)
        return jnp.mean(jnp.tanh(o))

    gr = jax.grad(lr, (0, 1))(vid, w)
    gp = jax.grad(lp, (0, 1))(vid, w)
    for a, b in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)


def test_pool_pallas_smoke():
    vid, w, fl = make_data(seed=3, H=32, W=32)
    o_ref = nl_pool(vid, w, fl, ps=3, stride0=1)
    o_p, outl = nl_pool_pallas(vid, w, fl, ps=3, budget=4, spread=8,
                               interpret=True)
    assert o_p.shape == o_ref.shape
    assert int(jnp.sum(outl)) == 0
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)

    def lr(v, ww):
        return jnp.mean(jnp.tanh(nl_pool(v, ww, fl, ps=3, stride0=1)))

    def lp(v, ww):
        o, _ = nl_pool_pallas(v, ww, fl, ps=3, budget=4, spread=8,
                              interpret=True)
        return jnp.mean(jnp.tanh(o))

    gr = jax.grad(lr, (0, 1))(vid, w)
    gp = jax.grad(lp, (0, 1))(vid, w)
    for a, b in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)


def test_strided_gather_scatter_add_pallas():
    """stride0 > 1 rides the stride-1 kernels via pixel-grid field
    dilation (VERDICT r4 #5: the reference agg default is stride 4)."""
    vid, w, fl = make_data(seed=1, T=2, H=32, W=32, K=2, s0=2)
    st_ref = nl_gather_stack(vid, w, fl, ps=3, stride0=2, itype="int")
    st_p, outl = nl_gather_stack_pallas(vid, w, fl, ps=3, stride0=2,
                                        itype="int", budget=8, spread=12,
                                        interpret=True)
    assert int(jnp.sum(outl)) == 0
    np.testing.assert_allclose(np.asarray(st_p), np.asarray(st_ref),
                               rtol=2e-5, atol=2e-5)
    o_ref, _ = nl_scatter_add(vid, w, fl, ps=3, strideIn=2, strideOut=2)
    o_p, outl2 = nl_scatter_add_pallas(vid, w, fl, ps=3, stride0=2,
                                       budget=8, spread=12,
                                       interpret=True)
    assert int(jnp.sum(outl2)) == 0
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("ps,K,T", [(1, 2, 2), (5, 2, 2), (3, 5, 4)])
def test_scatter_add_pallas_grid(ps, K, T):
    vid, w, fl = make_data(seed=ps + K, T=T, H=32, W=32, K=K)
    o_ref, _ = nl_scatter_add(vid, w, fl, ps=ps, strideIn=1, strideOut=1)
    o_p, outl = nl_scatter_add_pallas(vid, w, fl, ps=ps, budget=8,
                                      spread=12, interpret=True)
    assert int(jnp.sum(outl)) == 0
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("ps,K", [(1, 2), (5, 3)])
def test_pool_pallas_grid(ps, K):
    vid, w, fl = make_data(seed=ps + K, H=32, W=32, K=K)
    o_ref = nl_pool(vid, w, fl, ps=ps, stride0=1)
    o_p, outl = nl_pool_pallas(vid, w, fl, ps=ps, budget=4, spread=8,
                               interpret=True)
    assert int(jnp.sum(outl)) == 0
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)
