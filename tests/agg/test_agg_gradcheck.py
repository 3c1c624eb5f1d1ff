"""Numeric finite-difference gradchecks for the aggregation ops (role of
reference torch.autograd.gradcheck on agg backward kernels): gather /
gather_add / scatter_add / pool grads in vid and weights, plus flow grads
on the float gather path."""

import numpy as np
import pytest
import jax.numpy as jnp

from stnls_tpu.ops.agg import (
    nl_gather_stack, nl_gather_add, nl_scatter_add, nl_pool,
)
from stnls_tpu.testing.checks import gradcheck


def make_inputs(seed=0, B=1, HD=1, T=2, F=3, H=8, W=8, K=3, frac=0.3):
    rng = np.random.default_rng(seed)
    vid = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    w = jnp.asarray(rng.random((B, HD, T, H, W, K)), jnp.float32)
    fl = np.zeros((B, HD, T, H, W, K, 3), np.float32)
    fl[..., 0] = rng.integers(-1, 2, fl.shape[:-1])
    fl[..., 1:] = np.round(
        2.0 * (2 * rng.random(fl.shape[:-1] + (2,)) - 1)) + frac
    return vid, w, jnp.asarray(fl)


@pytest.mark.parametrize("itype", ["float", "int"])
def test_gradcheck_gather(itype):
    vid, w, fl = make_inputs()

    def loss(v, ww):
        s = nl_gather_stack(v, ww, fl, ps=3, stride0=1, itype=itype)
        return jnp.sum(s * jnp.cos(jnp.arange(s.size).reshape(s.shape)
                                   * 0.01))

    assert gradcheck(loss, (vid, w), argnums=(0, 1), eps=1e-2, rtol=8e-2,
                     atol=2e-2, n_checks=6)


def test_gradcheck_gather_flows_float():
    vid, w, fl = make_inputs(frac=0.35)

    def loss(f):
        s = nl_gather_stack(vid, w, f, ps=1, stride0=1, itype="float")
        return jnp.sum(s ** 2)

    assert gradcheck(loss, (fl,), argnums=0, eps=5e-3, rtol=8e-2,
                     atol=2e-2, n_checks=6)


def test_gradcheck_gather_add():
    vid, w, fl = make_inputs()

    def loss(v, ww):
        out = nl_gather_add(v, ww, fl, ps=3, strideIn=1, strideOut=1,
                            itype="int")
        return jnp.sum(out ** 2)

    assert gradcheck(loss, (vid, w), argnums=(0, 1), eps=1e-2, rtol=8e-2,
                     atol=2e-2, n_checks=6)


def test_gradcheck_scatter_add():
    vid, w, fl = make_inputs()

    def loss(v, ww):
        out, counts = nl_scatter_add(v, ww, fl, ps=3, strideIn=1,
                                     strideOut=1, itype="int")
        return jnp.sum(out ** 2)

    assert gradcheck(loss, (vid, w), argnums=(0, 1), eps=1e-2, rtol=8e-2,
                     atol=2e-2, n_checks=6)


def test_gradcheck_pool():
    # pool reads queries from the stride0=2 grid
    rng = np.random.default_rng(4)
    B, HD, T, F, H, W, K = 1, 1, 2, 3, 8, 8, 3
    vid = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    w = jnp.asarray(rng.random((B, HD, T, 4, 4, K)), jnp.float32)
    fl = np.zeros((B, HD, T, 4, 4, K, 3), np.float32)
    fl[..., 0] = rng.integers(-1, 2, fl.shape[:-1])
    fl[..., 1:] = rng.integers(-2, 3, fl.shape[:-1] + (2,))
    fl = jnp.asarray(fl)

    def loss(v, ww):
        out = nl_pool(v, ww, fl, ps=2, stride0=2)
        return jnp.sum(out ** 2)

    assert gradcheck(loss, (vid, w), argnums=(0, 1), eps=1e-2, rtol=8e-2,
                     atol=2e-2, n_checks=6)
