"""Fused Pallas aggregation kernel (interpret mode) vs the jnp gather
engine: forward stacks and full gradients (vid, weights, flows) must
match; out-of-budget offsets are flagged, not silently wrong."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stnls_tpu.ops.agg import nl_gather_stack
from stnls_tpu.ops.agg_pallas import nl_gather_stack_pallas


def make_data(B=1, HD=1, T=3, F=4, H=24, W=24, K=4, wt=2, seed=0, fmax=3.0):
    rng = np.random.default_rng(seed)
    vid = jnp.asarray(rng.standard_normal((B, HD, T, F, H, W)), jnp.float32)
    w = jnp.asarray(rng.random((B, HD, T, H, W, K)), jnp.float32)
    fl = np.zeros((B, HD, T, H, W, K, 3), np.float32)
    fl[..., 0] = rng.integers(-wt, wt + 1, fl.shape[:-1])
    fl[..., 1:] = fmax * (2 * rng.random(fl.shape[:-1] + (2,)) - 1) + 0.25
    return vid, w, jnp.asarray(fl)


@pytest.mark.parametrize("itype,ps", [("int", 1), ("int", 3),
                                      ("float", 1), ("float", 3)])
def test_agg_pallas_matches_jnp(itype, ps):
    vid, w, fl = make_data()
    ref = nl_gather_stack(vid, w, fl, ps=ps, stride0=1, itype=itype)
    got, outl = nl_gather_stack_pallas(vid, w, fl, ps=ps, stride0=1,
                                       itype=itype, budget=4, spread=10)
    assert not bool(jnp.any(outl))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("itype,ps", [
    pytest.param("float", 3),
    pytest.param("int", 3, marks=pytest.mark.slow),
    pytest.param("float", 1, marks=pytest.mark.slow),
])
def test_agg_pallas_gradients(itype, ps):
    vid, w, fl = make_data(K=3, T=2, wt=1)
    rng = np.random.default_rng(2)
    gd = jnp.asarray(rng.standard_normal(
        (vid.shape[0], vid.shape[1], 3, 2, 4, 24, 24)), jnp.float32)

    def lr(v, ww, f):
        return jnp.sum(nl_gather_stack(v, ww, f, ps=ps, stride0=1,
                                       itype=itype) * gd)

    def lp(v, ww, f):
        out, _ = nl_gather_stack_pallas(v, ww, f, ps=ps, stride0=1,
                                        itype=itype, budget=4, spread=10)
        return jnp.sum(out * gd)

    gr = jax.grad(lr, (0, 1, 2))(vid, w, fl)
    gp = jax.grad(lp, (0, 1, 2))(vid, w, fl)
    for name, a, b in zip(("vid", "w", "flows"), gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=5e-4, err_msg=name)


def test_agg_pallas_gradients_integer_valued_float_flows():
    """Exactly-integer float flows (th/tw == 0): the upper bilinear corner
    has zero lerp weight but still carries g_th/g_tw — the kernel's
    sparsity skip must not drop it (round-1 advisor finding)."""
    vid, w, fl = make_data(K=3, T=2, wt=1)
    fl = jnp.round(fl)  # integer-valued, dtype float
    rng = np.random.default_rng(3)
    gd = jnp.asarray(rng.standard_normal(
        (vid.shape[0], vid.shape[1], 3, 2, 4, 24, 24)), jnp.float32)

    def lr(v, ww, f):
        return jnp.sum(nl_gather_stack(v, ww, f, ps=3, stride0=1,
                                       itype="float") * gd)

    def lp(v, ww, f):
        out, _ = nl_gather_stack_pallas(v, ww, f, ps=3, stride0=1,
                                        itype="float", budget=4, spread=10)
        return jnp.sum(out * gd)

    gr = jax.grad(lr, (0, 1, 2))(vid, w, fl)
    gp = jax.grad(lp, (0, 1, 2))(vid, w, fl)
    for name, a, b in zip(("vid", "w", "flows"), gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=5e-4, err_msg=name)


def test_agg_pallas_outlier_flagging():
    vid, w, fl = make_data(fmax=0.0)
    fl = fl.at[0, 0, 1, 5, 5, 0, 1].set(9.0)   # row offset past budget
    got, outl = nl_gather_stack_pallas(vid, w, fl, ps=1, stride0=1,
                                       itype="float", budget=4, spread=10)
    assert bool(jnp.any(outl))


@pytest.mark.parametrize("fori", ["zw", "szw"])
def test_agg_pallas_fori_modes_match(fori):
    """The fori loop modes (compile-size lever for big ZLc*W_t configs)
    must be numerically identical to the unrolled kernel — fwd and full
    grads."""
    vid, w, fl = make_data()
    gd = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 1, 4, 3, 4, 24, 24)), jnp.float32)
    ref = nl_gather_stack(vid, w, fl, ps=3, stride0=1, itype="float")

    def run(mode):
        def f(v, ww, fx):
            out, _ = nl_gather_stack_pallas(
                v, ww, fx, ps=3, stride0=1, itype="float", budget=4,
                spread=10, fori=mode)
            return jnp.sum(out * gd)
        val, grads = jax.value_and_grad(f, (0, 1, 2))(vid, w, fl)
        return val, grads

    out_f, _ = nl_gather_stack_pallas(vid, w, fl, ps=3, stride0=1,
                                      itype="float", budget=4, spread=10,
                                      fori=fori)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    v0, g0 = run("")
    v1, g1 = run(fori)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
