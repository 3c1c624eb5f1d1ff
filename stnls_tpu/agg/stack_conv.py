"""StackConv: NonLocalGather stack followed by a Conv3d projection
(reference lib/stnls/agg/stack_conv.py:22-50)."""

import jax.numpy as jnp
import flax.linen as fnn

from stnls_tpu.utils.config import extract_pairs
from stnls_tpu.agg.gather import (
    extract_config as extract_config_stack, init as init_stack)
from stnls_tpu.agg.proj_menu import (
    extract_config as extract_config_proj, init as init_proj)


class StackConv(fnn.Module):
    stacker: object  # NonLocalGather (stateless callable)
    proj: fnn.Module
    proj_version: str = "v1"

    @fnn.compact
    def __call__(self, vid, weights, flows, deterministic=True):
        stack = self.stacker(vid, weights, flows)
        # [B,HD,K,T,C,H,W] -> [(B T), (HD C), K, H, W]
        B, HD, K, T, C, H, W = stack.shape
        stack = jnp.transpose(stack, (0, 3, 1, 4, 2, 5, 6)) \
            .reshape(B * T, HD * C, K, H, W)
        out = self.proj(stack, deterministic=deterministic)
        out = out.reshape(B, T, -1, H, W)
        return out


def _apply(vid, weights, flows, **kwargs):
    raise NotImplementedError(
        "StackConv holds parameters; build it with stnls_tpu.agg.stack_conv"
        ".init(cfg) and call via flax init/apply.")


def extract_config(_cfg, restrict=True):
    stack_cfg = extract_config_stack(_cfg, restrict=restrict)
    proj_cfg = extract_config_proj(_cfg, restrict=restrict)
    pairs = dict(stack_cfg)
    pairs.update(proj_cfg)
    return extract_pairs(_cfg, pairs, restrict=restrict)


def init(cfg):
    cfg = extract_config(cfg, False)
    stacker = init_stack(cfg)
    proj = init_proj(cfg)
    return StackConv(stacker=stacker, proj=proj,
                     proj_version=cfg.nlstack_proj_version)
