"""NonLocalAttentionStack: attention block whose aggregation is the
NonLocalGather stack followed by a Conv3d projection over the K axis
(reference lib/stnls/nn/non_local_attn_stack.py:40-90; share_kv shares the
k/v projection)."""

import jax
import jax.numpy as jnp
import flax.linen as fnn

from stnls_tpu.utils import config
from stnls_tpu.utils.config import optional
from stnls_tpu.nn.utils import rescale_flows
from stnls_tpu.nn.non_local_attn import ConvQKV, LayerNorm2D, default_pairs
from stnls_tpu import search as search_mod
from stnls_tpu import normz as normz_mod
from stnls_tpu.agg.gather import NonLocalGather


def extract_config(cfg, restrict=True):
    pairs = dict(default_pairs())
    pairs.update({"share_kv": False, "ref_itype": "int",
                  "ps_stack": 7, "k_agg": -1})
    return config.extract_pairs(cfg, pairs, restrict=restrict)


class NonLocalAttentionStack(fnn.Module):
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
        self.share_kv = attn_cfg.share_kv

        self.search = search_mod.init(self.search_cfg)
        self.normz = normz_mod.init(self.normz_cfg)
        agg_cfg = dict(self.agg_cfg)
        self.stacker = NonLocalGather(
            ps=optional(agg_cfg, "ps", 7),
            stride0=optional(agg_cfg, "stride0", 1),
            itype=optional(agg_cfg, "itype", "float"))
        self.k_agg = optional(self.search_cfg, "k_agg", -1)

        self.use_norm_layer = attn_cfg.use_norm_layer
        self.use_flow = attn_cfg.use_attn_flow
        self.search_name = optional(self.search_cfg, "search_name", "nls")
        self.stride0 = optional(self.search_cfg, "stride0", 1)

        self.qkv = ConvQKV(input_dim=io_dim, heads=nheads,
                           dim_head=embed_dim, qk_frac=attn_cfg.qk_frac,
                           bias=attn_cfg.qkv_bias,
                           ngroups=attn_cfg.qkv_ngroups)
        k_eff = self.k_agg if self.k_agg > 0 else \
            optional(self.search_cfg, "k", 1)
        self.proj_k = max(int(k_eff), 1)
        self.proj = fnn.Conv(io_dim, (1, 1))
        self.norm_layer = LayerNorm2D(io_dim) if self.use_norm_layer else None
        self.stack_weight_dim = io_dim

    @fnn.compact
    def __call__(self, vid, flows=None, state=None, deterministic=True):
        B, T, C, H, W = vid.shape
        if self.use_flow and flows is not None:
            flows = rescale_flows(flows, H, W)
        if self.norm_layer is not None:
            vid = self.norm_layer(vid)
        q_vid, k_vid, v_vid = self.get_qkv(vid)
        dists, inds = self.search(q_vid, k_vid, flows.fflow, flows.bflow) \
            if flows is not None else self.search(q_vid, k_vid)
        weights, inds = self.normz(dists, inds)
        stack = self.stacker(v_vid, weights, inds)  # [B,HD,K,T,F,H,W]
        # Conv3d projection over (K,1,1) == per-k linear mix, then merge
        B_, HD, K, T_, F, H_, W_ = stack.shape
        x = jnp.transpose(stack, (0, 3, 5, 6, 2, 1, 4)) \
            .reshape(B_ * T_, H_, W_, K * HD * F)
        x = fnn.Conv(self.dim, (1, 1), name="stack_proj")(x)
        x = jnp.moveaxis(x, -1, 1).reshape(B_, T_, self.dim, H_, W_)
        x = self.run_projection(x)
        return x, state

    def get_qkv(self, vid):
        B, T, C, H, W = vid.shape
        q, k, v = self.qkv(vid.reshape(B * T, C, H, W))
        if self.share_kv:
            v = k
        return (q.reshape(B, T, -1, H, W), k.reshape(B, T, -1, H, W),
                v.reshape(B, T, -1, H, W))

    def run_projection(self, vid):
        B, T, C, H, W = vid.shape
        x = jnp.moveaxis(vid.reshape(B * T, C, H, W), 1, -1)
        x = self.proj(x)
        return jnp.moveaxis(x, -1, 1).reshape(B, T, C, H, W)
