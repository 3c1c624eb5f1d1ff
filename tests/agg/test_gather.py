"""NonLocalGather vs naive loop GT (reference tests/agg/test_gather.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stnls_tpu.agg import NonLocalGather
from stnls_tpu.testing.agg_gt import gather_stack_gt


def make_inputs(B=1, HD=1, T=3, F=2, H=8, W=8, K=3, stride0=1, seed=0,
                int_flows=False):
    rng = np.random.default_rng(seed)
    nH = (H - 1) // stride0 + 1
    nW = (W - 1) // stride0 + 1
    vid = rng.standard_normal((B, HD, T, F, H, W)).astype(np.float32)
    weights = rng.random((B, HD, T, nH, nW, K)).astype(np.float32)
    flows = np.stack([
        rng.integers(-1, 2, (B, HD, T, nH, nW, K)).astype(np.float32),
        2.0 * rng.standard_normal((B, HD, T, nH, nW, K)).astype(np.float32),
        2.0 * rng.standard_normal((B, HD, T, nH, nW, K)).astype(np.float32),
    ], axis=-1)
    if int_flows:
        flows = np.round(flows)
    return jnp.asarray(vid), jnp.asarray(weights), jnp.asarray(flows)


@pytest.mark.parametrize("ps,stride0,itype", [
    (1, 1, "int"), (3, 1, "int"), (3, 2, "int"),
    (1, 1, "float"), (3, 1, "float"), (2, 1, "float"),
])
def test_gather_vs_gt(ps, stride0, itype):
    vid, weights, flows = make_inputs(stride0=stride0,
                                      int_flows=(itype == "int"))
    agg = NonLocalGather(ps=ps, stride0=stride0, itype=itype)
    stack = agg(vid, weights, flows)
    gt = gather_stack_gt(np.asarray(vid), np.asarray(weights),
                         np.asarray(flows), ps, stride0, itype=itype)
    assert stack.shape == gt.shape
    np.testing.assert_allclose(np.asarray(stack), gt, rtol=2e-4, atol=2e-4)


def test_gather_gradients():
    vid, weights, flows = make_inputs()
    agg = NonLocalGather(ps=3, stride0=1, itype="float")

    def loss(v, w, f):
        return jnp.sum(agg(v, w, f) ** 2)

    gv, gw, gf = jax.grad(loss, argnums=(0, 1, 2))(vid, weights, flows)
    for g in (gv, gw, gf):
        assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(gf[..., 1:])).max() > 0  # flow grads flow

    # finite-difference check on a weight entry (smooth everywhere)
    eps = 1e-3
    idx = (0, 0, 1, 2, 2, 1)
    e = jnp.zeros_like(weights).at[idx].set(eps)
    fd = (loss(vid, weights + e, flows) - loss(vid, weights - e, flows)) \
        / (2 * eps)
    np.testing.assert_allclose(float(gw[idx]), float(fd), rtol=2e-2,
                               atol=1e-3)


def test_gather_head_folding():
    """5-dim vid input with folded heads matches 6-dim input."""
    vid, weights, flows = make_inputs(HD=2, F=2)
    agg = NonLocalGather(ps=1, stride0=1, itype="float")
    out6 = agg(vid, weights, flows)
    vid5 = jnp.transpose(vid, (0, 2, 1, 3, 4, 5)).reshape(1, 3, 4, 8, 8)
    out5 = agg(vid5, weights, flows)
    np.testing.assert_allclose(np.asarray(out6), np.asarray(out5), atol=1e-6)
