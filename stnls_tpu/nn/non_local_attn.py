"""NonLocalAttention: the composite search->normalize->aggregate block.

API parity with reference lib/stnls/nn/non_local_attn.py: ConvQKV 1x1
projections (reflect padding), menu-dispatched search (refinement consumes
the recurrent `state`), softmax normalization, menu-dispatched aggregation,
and an output Conv2d projection.

TPU-native differences: a flax.linen module (pure/functional — the
recurrent state is threaded through the call instead of mutated in place),
stages wrapped in jax.named_scope so jax.profiler traces show per-stage
cost (replacing the reference's cuda-synchronized ExpTimer plumbing,
non_local_attn.py:110-144).
"""

import jax
import jax.numpy as jnp
import flax.linen as fnn

from stnls_tpu.utils import config
from stnls_tpu.utils.config import optional, ConfigDict
from stnls_tpu.nn.utils import rescale_flows
from stnls_tpu import search as search_mod
from stnls_tpu import normz as normz_mod
from stnls_tpu import agg as agg_mod


def default_pairs():
    return {"nheads": 1, "inner_mult": 1,
            "embed_dim": 16,
            "qk_frac": 1., "qkv_bias": True,
            "qkv_ngroups": 1,
            "use_attn_projection": True,
            "drop_rate_proj": 0.,
            "attn_timer": False, "use_attn_flow": True,
            "use_norm_layer": False}


def extract_config(cfg, restrict=True):
    return config.extract_pairs(cfg, default_pairs(), restrict=restrict)


class LayerNorm2D(fnn.Module):
    """Channel layernorm on [B,T,C,H,W] (reference non_local_attn.py:386)."""
    dim: int

    @fnn.compact
    def __call__(self, vid):
        x = jnp.moveaxis(vid, 2, -1)
        x = fnn.LayerNorm()(x)
        return jnp.moveaxis(x, -1, 2)


class ConvQKV(fnn.Module):
    """1x1 (or kxk reflect-padded) convs producing q,k,v
    (reference non_local_attn.py:265-305)."""
    input_dim: int
    heads: int = 8
    dim_head: int = 64
    qk_frac: float = 1.
    kernel_size: int = 1
    bias: bool = True
    ngroups: int = 1

    @fnn.compact
    def __call__(self, x, attn_kv=None):
        # x: [N, C, H, W] torch layout
        inner_dim = self.dim_head * self.heads
        inner_dim_qk = max(int(self.qk_frac * self.dim_head), 1) * self.heads
        attn_kv = x if attn_kv is None else attn_kv

        def conv(z, out_dim, name):
            z = jnp.moveaxis(z, 1, -1)  # NHWC
            pad = (self.kernel_size - 1) // 2
            if pad > 0:
                z = jnp.pad(z, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                            mode="reflect")
            z = fnn.Conv(out_dim, (self.kernel_size, self.kernel_size),
                         use_bias=self.bias, padding="VALID",
                         feature_group_count=self.ngroups, name=name)(z)
            return jnp.moveaxis(z, -1, 1)

        q = conv(x, inner_dim_qk, "to_q")
        k = conv(attn_kv, inner_dim_qk, "to_k")
        v = conv(attn_kv, inner_dim, "to_v")
        return q, k, v


class NonLocalAttention(fnn.Module):
    """attn = NonLocalAttention(attn_cfg, search_cfg, normz_cfg, agg_cfg);
    vid_out, state = attn.apply(params, vid, flows, state)."""
    attn_cfg: dict
    search_cfg: dict
    normz_cfg: dict
    agg_cfg: dict

    def setup(self):
        attn_cfg = extract_config(self.attn_cfg, restrict=False)
        nheads = attn_cfg.nheads
        inner_mult = optional(attn_cfg, "inner_mult", 1)
        embed_dim = attn_cfg.embed_dim * inner_mult
        io_dim = attn_cfg.embed_dim * nheads
        self.dim = io_dim
        self._attn_cfg = attn_cfg

        self.search = search_mod.init(self.search_cfg)
        self.normz = normz_mod.init(self.normz_cfg)
        self.agg = agg_mod.init(self.agg_cfg)

        self.use_norm_layer = attn_cfg.use_norm_layer
        self.use_flow = attn_cfg.use_attn_flow
        self.use_state_update = optional(self.search_cfg,
                                         "use_state_update", False)
        self.search_name = optional(self.search_cfg, "search_name", "nls")
        self.stride0 = optional(self.search_cfg, "stride0", 1)

        self.qkv = ConvQKV(input_dim=io_dim, heads=nheads,
                           dim_head=embed_dim, qk_frac=attn_cfg.qk_frac,
                           bias=attn_cfg.qkv_bias,
                           ngroups=attn_cfg.qkv_ngroups)
        if attn_cfg.use_attn_projection:
            self.proj = fnn.Conv(io_dim, (1, 1))
            self.proj_drop_rate = attn_cfg.drop_rate_proj
        else:
            self.proj = None
            self.proj_drop_rate = 0.0
        self.norm_layer = LayerNorm2D(io_dim) if self.use_norm_layer else None

    def __call__(self, vid, flows=None, state=None, deterministic=True):
        from stnls_tpu.nn.non_local_attn_stack import _StageTimer
        timer = _StageTimer(optional(self._attn_cfg, "attn_timer", False),
                            vid)
        B, T, C, H, W = vid.shape
        if self.use_flow and flows is not None:
            flows = rescale_flows(flows, H, W)

        if self.norm_layer is not None:
            vid = self.norm_layer(vid)
        with timer("qkv"):
            q_vid, k_vid, v_vid = self.get_qkv(vid)
        with timer("search"):
            dists, inds = self.run_search(q_vid, k_vid, flows, state)
        state = self._next_state(state, inds, q_vid.shape)
        with timer("normz"):
            weights, inds = self.normz(dists, inds)
        with timer("agg"):
            vid = self.run_aggregation(v_vid, weights, inds)
        with timer("proj"):
            vid = self.run_projection(vid, deterministic)
        object.__setattr__(self, "_times", timer.times)
        return vid, state

    def get_qkv(self, vid):
        B, T, C, H, W = vid.shape
        q, k, v = self.qkv(vid.reshape(B * T, C, H, W))
        return (q.reshape(B, T, -1, H, W), k.reshape(B, T, -1, H, W),
                v.reshape(B, T, -1, H, W))

    def run_search(self, q_vid, k_vid, flows, state):
        if self.search_name == "refine":
            inds_p = _inds_rs1(state[0])
            dists, inds = self.search(q_vid, k_vid, inds_p)
        elif self.search_name == "rand_inds":
            dists, inds = self.search(q_vid, k_vid)
        else:
            dists, inds = self.search(q_vid, k_vid, flows.fflow, flows.bflow)
        return dists, inds

    def _next_state(self, state, inds, vshape):
        if not self.use_state_update or state is None:
            return state
        T, C, H, W = vshape[-4:]
        nH = (H - 1) // self.stride0 + 1
        nW = (W - 1) // self.stride0 + 1
        return [_inds_rs0(jax.lax.stop_gradient(inds), nH, nW), state[0]]

    def run_aggregation(self, v_vid, weights, inds):
        return self.agg(v_vid, weights, inds)

    def run_projection(self, vid, deterministic=True):
        if self.proj is None:
            return vid
        if vid.ndim == 7:  # [B,HD,K,T,F,H,W] stack from gather
            B, HD, K, T, F, H, W = vid.shape
            vid = jnp.mean(vid, axis=2)  # reduce stack
            vid = jnp.transpose(vid, (0, 2, 1, 3, 4, 5)) \
                .reshape(B, T, HD * F, H, W)
        elif vid.ndim == 6:  # [B,HD,T,F,H,W]
            B, HD, T, F, H, W = vid.shape
            vid = jnp.transpose(vid, (0, 2, 1, 3, 4, 5)) \
                .reshape(B, T, HD * F, H, W)
        B, T, C, H, W = vid.shape
        x = jnp.moveaxis(vid.reshape(B * T, C, H, W), 1, -1)
        x = self.proj(x)
        x = jnp.moveaxis(x, -1, 1).reshape(B, T, C, H, W)
        return x

    def flops(self, H, W):
        """qkv + search + normz + agg + projection (reference
        non_local_attn.py:226-252)."""
        nrefs = ((H - 1) // self.stride0 + 1) * ((W - 1) // self.stride0 + 1)
        total = 0
        # ConvQKV: three 1x1 convs, dim -> dim each
        total += 3 * H * W * self.dim * self.dim
        if hasattr(self.search, "flops"):
            total += self.search.flops(1, self.dim, H, W)
        if hasattr(self.normz, "flops"):
            total += self.normz.flops()
        k = optional(self.search_cfg, "k", 10)
        nheads = optional(self.search_cfg, "nheads", 1)
        if hasattr(self.agg, "flops"):
            total += self.agg.flops(nrefs, self.dim // max(nheads, 1),
                                    nheads, max(k, 1))
        total += nrefs * self.dim * self.dim
        return total


def _inds_rs0(inds, nH, nW):
    """[B,HD,Q,K,3] or [B,HD,T,nH,nW,K,3] -> state layout
    [T,nH,nW,B,HD,K,3] (reference non_local_attn_stack.py inds_rs0)."""
    if inds.ndim == 5:
        B, HD, Q, K, tr = inds.shape
        T = Q // (nH * nW)
        inds = inds.reshape(B, HD, T, nH, nW, K, tr)
    elif inds.ndim != 7:
        return inds
    return jnp.transpose(inds, (2, 3, 4, 0, 1, 5, 6))


def _inds_rs1(inds):
    if inds.ndim != 7:
        return inds
    T, nH, nW, B, HD, K, tr = inds.shape
    inds = jnp.transpose(inds, (3, 4, 0, 1, 2, 5, 6))
    return inds.reshape(B, HD, T * nH * nW, K, tr)
