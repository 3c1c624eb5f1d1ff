"""StackConv + proj_menu: gather-stack followed by the Conv3d projection
menu (reference lib/stnls/agg/stack_conv.py:22-50, proj_menu.py:44-62)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stnls_tpu.agg import stack_conv as stack_conv_mod
from stnls_tpu.agg import proj_menu


def make_inputs(B=1, HD=2, T=2, F=4, H=8, W=8, K=3, seed=0):
    rng = np.random.default_rng(seed)
    vid = jnp.asarray(rng.standard_normal((B, T, HD * F, H, W)), jnp.float32)
    weights = jnp.asarray(rng.random((B, HD, T, H, W, K)), jnp.float32)
    flows = jnp.asarray(
        np.stack([np.zeros((B, HD, T, H, W, K)),
                  rng.integers(-1, 2, (B, HD, T, H, W, K)),
                  rng.integers(-1, 2, (B, HD, T, H, W, K))], -1),
        jnp.float32)
    return vid, weights, flows


@pytest.mark.parametrize("version", ["v1", "v2"])
def test_stack_conv_init_apply(version):
    B, HD, T, F, H, W, K = 1, 2, 2, 4, 8, 8, 3
    ps = 3
    cfg = {"ps": ps, "stride0": 1, "itype": "int", "impl": "jnp",
           "embed_dim": F, "inner_mult": 1, "k_agg": K, "nheads": HD,
           "nlstack_proj_version": version,
           "attn_proj_ksize": "k_ps_ps", "attn_proj_stride": "k_1_1",
           "attn_proj_ngroups": "nheads"}
    mod = stack_conv_mod.init(cfg)
    vid, weights, flows = make_inputs(B, HD, T, F, H, W, K)
    params = mod.init(jax.random.PRNGKey(0), vid, weights, flows)
    out = mod.apply(params, vid, weights, flows)
    assert out.shape == (B, T, HD * F, H, W)
    assert np.isfinite(np.asarray(out)).all()


def test_stack_conv_grad_flows():
    """Projection output differentiates back to the video input."""
    B, HD, T, F, H, W, K = 1, 1, 2, 4, 8, 8, 2
    cfg = {"ps": 3, "stride0": 1, "itype": "int", "impl": "jnp",
           "embed_dim": F, "inner_mult": 1, "k_agg": K, "nheads": HD,
           "nlstack_proj_version": "v1"}
    mod = stack_conv_mod.init(cfg)
    vid, weights, flows = make_inputs(B, HD, T, F, H, W, K, seed=2)
    params = mod.init(jax.random.PRNGKey(1), vid, weights, flows)

    def loss(v):
        return jnp.sum(mod.apply(params, v, weights, flows) ** 2)

    g = jax.grad(loss)(vid)
    assert g.shape == vid.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.


def test_proj_menu_v1_shapes():
    HD, F, K, ps = 2, 4, 3, 3
    cfg = {"ps": ps, "embed_dim": F, "inner_mult": 1, "k_agg": K,
           "nheads": HD, "nlstack_proj_version": "v1"}
    proj = proj_menu.init(cfg)
    BT, C = 2, HD * F
    stack = jnp.ones((BT, C, K, 8, 8), jnp.float32)
    params = proj.init(jax.random.PRNGKey(0), stack)
    out = proj.apply(params, stack)
    assert out.shape == (BT, C, 1, 8, 8)


def test_proj_menu_unknown_version_raises():
    with pytest.raises(ValueError):
        proj_menu.get_defaults("v3")
