"""Composite attention modules (reference nn/non_local_attn.py usage):
flax init/apply, output shapes, gradient flow, recurrent state."""

import numpy as np
import jax
import jax.numpy as jnp

from stnls_tpu.nn import NonLocalAttention, NonLocalAttentionStack
from stnls_tpu.models import NonLocalDenoiser
from stnls_tpu.utils.config import ConfigDict


def make_cfgs(embed_dim=4, nheads=2, ws=3, wt=1, ps=1, k=4):
    attn_cfg = {"nheads": nheads, "embed_dim": embed_dim,
                "use_attn_projection": True, "use_attn_flow": True}
    search_cfg = {"search_name": "nls", "ws": ws, "wt": wt, "ps": ps,
                  "k": k, "nheads": nheads, "stride0": 1,
                  "self_action": "anchor", "itype": "float",
                  "dist_type": "l2"}
    normz_cfg = {"normz_name": "softmax", "normz_scale": 10,
                 "dist_type": "l2"}
    agg_cfg = {"agg_name": "gather", "ps": ps, "stride0": 1,
               "itype": "float"}
    return attn_cfg, search_cfg, normz_cfg, agg_cfg


def make_flows(B, T, H, W, seed=0):
    rng = np.random.default_rng(seed)
    flows = ConfigDict()
    flows.fflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)),
                              jnp.float32)
    flows.bflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)),
                              jnp.float32)
    return flows


def test_non_local_attention_forward_and_grads():
    B, T, H, W = 1, 3, 8, 8
    attn_cfg, search_cfg, normz_cfg, agg_cfg = make_cfgs()
    io_dim = attn_cfg["nheads"] * attn_cfg["embed_dim"]
    model = NonLocalAttention(attn_cfg, search_cfg, normz_cfg, agg_cfg)
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, io_dim, H, W)), jnp.float32)
    flows = make_flows(B, T, H, W)
    params = model.init(jax.random.PRNGKey(0), vid, flows)
    out, state = model.apply(params, vid, flows)
    assert out.shape == (B, T, io_dim, H, W)
    assert bool(jnp.isfinite(out).all())

    def loss(p, v):
        o, _ = model.apply(p, v, flows)
        return jnp.mean(o ** 2)

    gp, gv = jax.grad(loss, argnums=(0, 1))(params, vid)
    leaves = jax.tree.leaves(gp)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
    assert np.abs(np.asarray(gv)).max() > 0


def test_non_local_attention_stack_forward():
    B, T, H, W = 1, 3, 8, 8
    attn_cfg, search_cfg, normz_cfg, agg_cfg = make_cfgs()
    io_dim = attn_cfg["nheads"] * attn_cfg["embed_dim"]
    model = NonLocalAttentionStack(attn_cfg, search_cfg, normz_cfg, agg_cfg)
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, io_dim, H, W)), jnp.float32)
    flows = make_flows(B, T, H, W)
    params = model.init(jax.random.PRNGKey(0), vid, flows)
    out, _ = model.apply(params, vid, flows)
    assert out.shape == (B, T, io_dim, H, W)
    assert bool(jnp.isfinite(out).all())


def test_denoiser_forward():
    B, T, C, H, W = 1, 3, 3, 8, 8
    model = NonLocalDenoiser(in_dim=C, embed_dim=4, nheads=2, ws=3, wt=1,
                             ps=1, k=4, nres=1)
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, C, H, W)), jnp.float32)
    flows = make_flows(B, T, H, W)
    params = model.init(jax.random.PRNGKey(0), vid, flows)
    out, _ = model.apply(params, vid, flows)
    assert out.shape == (B, T, C, H, W)
    assert bool(jnp.isfinite(out).all())
