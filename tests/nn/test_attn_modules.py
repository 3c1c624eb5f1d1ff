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


def test_attn_stack_refine_state_path():
    """Stack block with search_name='refine': consumes the previous call's
    top-K inds as the refinement state (reference non_local_attn_stack.py
    run_search/update_state) and ref_itype mangles the refine itype."""
    B, T, H, W = 1, 3, 8, 8
    attn_cfg, search_cfg, normz_cfg, agg_cfg = make_cfgs()
    io_dim = attn_cfg["nheads"] * attn_cfg["embed_dim"]
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, io_dim, H, W)), jnp.float32)
    flows = make_flows(B, T, H, W)

    # first stage: plain nls with state recording
    s1_cfg = dict(search_cfg, use_state_update=True)
    m1 = NonLocalAttentionStack(attn_cfg, s1_cfg, normz_cfg, agg_cfg)
    p1 = m1.init(jax.random.PRNGKey(0), vid, flows, state=[None, None])
    out1, state = m1.apply(p1, vid, flows, state=[jnp.zeros(()), None])
    assert state[0] is not None and state[0].ndim == 7

    # second stage: refine from the recorded inds, int refinement
    s2_cfg = dict(search_cfg, search_name="refine", wr=1, kr=-1,
                  ref_itype="int", use_state_update=True)
    m2 = NonLocalAttentionStack(attn_cfg, s2_cfg, normz_cfg, agg_cfg)
    p2 = m2.init(jax.random.PRNGKey(1), vid, flows, state=state)
    out2, state2 = m2.apply(p2, vid, flows, state=state)
    assert out2.shape == (B, T, io_dim, H, W)
    assert bool(jnp.isfinite(out2).all())


def test_attn_timer_eager():
    """attn_timer=True records per-stage wall times outside jit."""
    B, T, H, W = 1, 2, 8, 8
    attn_cfg, search_cfg, normz_cfg, agg_cfg = make_cfgs()
    attn_cfg = dict(attn_cfg, attn_timer=True)
    io_dim = attn_cfg["nheads"] * attn_cfg["embed_dim"]
    model = NonLocalAttention(attn_cfg, search_cfg, normz_cfg, agg_cfg)
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, T, io_dim, H, W)), jnp.float32)
    flows = make_flows(B, T, H, W)
    params = model.init(jax.random.PRNGKey(0), vid, flows)
    bound = model.bind(params)
    out, _ = bound(vid, flows)
    times = bound._times
    assert set(times) == {"qkv", "search", "normz", "agg", "proj"}
    assert all(t >= 0 for t in times.values())
