"""Projection menu for stack aggregation (reference
lib/stnls/agg/proj_menu.py:44-62): Conv3d over the (K, ps, ps) stack axes.

flax.linen implementation; convs run channels-last (NDHWC) for TPU, with
`feature_group_count` standing in for torch's `groups`.
"""

import flax.linen as fnn
import jax.numpy as jnp

from stnls_tpu.utils.config import extract_pairs, optional


class StackProj(fnn.Module):
    """Conv3d [io_dim*inner_mult -> io_dim] over (k_agg, ps, ps), stride
    (k_agg,1,1) — the "v1" projection; "v2" parameterizes kernel/stride."""
    io_dim: int
    inner_mult: int = 1
    k_agg: int = -1
    ps: int = 3
    ngroups: int = 1
    drop_rate: float = 0.0
    ksizes: tuple = None
    strides: tuple = None

    @fnn.compact
    def __call__(self, stack, deterministic=True):
        # stack: [BT, C, K, H, W] (torch layout) -> NDHWC
        x = jnp.transpose(stack, (0, 2, 3, 4, 1))
        k = self.ksizes or (max(self.k_agg, 1), self.ps, self.ps)
        s = self.strides or (max(self.k_agg, 1), 1, 1)
        pads = [(0, 0), (k[1] // 2, k[1] // 2), (k[2] // 2, k[2] // 2)]
        x = fnn.Conv(self.io_dim, kernel_size=k, strides=s, padding=pads,
                     feature_group_count=self.ngroups)(x)
        x = fnn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        x = jnp.transpose(x, (0, 4, 1, 2, 3))  # back to [BT, C, K', H, W]
        return jnp.mean(x, axis=2, keepdims=True)


def get_defaults(version):
    if version == "v1":
        return {"ps": -1, "embed_dim": -1, "inner_mult": -1, "k_agg": -1,
                "nheads": -1, "attn_drop_rate_proj": 0.}
    if version == "v2":
        return {"attn_proj_ksize": -1, "attn_proj_stride": "k_ps_ps",
                "attn_proj_ngroups": "ngroups", "attn_drop_rate_proj": 0.}
    raise ValueError(f"Unknown projection version [{version}]")


def extract_config(_cfg, restrict=True):
    version = optional(_cfg, "nlstack_proj_version", "v1")
    defaults = get_defaults(version)
    defaults["nlstack_proj_version"] = version
    return extract_pairs(_cfg, defaults, restrict=restrict)


def init(cfg):
    cfg = extract_config(cfg, False)
    io_dim = cfg.embed_dim * cfg.nheads
    version = cfg.nlstack_proj_version
    if version == "v1":
        return StackProj(io_dim=io_dim, inner_mult=cfg.inner_mult,
                         k_agg=cfg.k_agg, ps=cfg.ps, ngroups=cfg.nheads,
                         drop_rate=cfg.attn_drop_rate_proj)
    if version == "v2":
        def parse(spec, kagg, ps):
            vals = []
            for tok in spec.split("_"):
                vals.append({"k": kagg, "ps": ps, "ps//2": ps // 2}
                            .get(tok, None) or int(tok))
            return tuple(vals)
        kagg = optional(_cfg := cfg, "k_agg", 1)
        ps = optional(cfg, "ps", 3)
        ks = parse(cfg.attn_proj_ksize, kagg, ps)
        st = parse(cfg.attn_proj_stride, kagg, ps)
        ng = cfg.nheads if cfg.attn_proj_ngroups == "nheads" else \
            int(cfg.attn_proj_ngroups)
        return StackProj(io_dim=io_dim, ksizes=ks, strides=st, ngroups=ng,
                         drop_rate=cfg.attn_drop_rate_proj)
    raise NotImplementedError(version)
