"""Assess optical-flow quality by comparing flow-linked patches
(reference lib/stnls/misc/flow_patches.py: get_patches / get_mse)."""

import jax.numpy as jnp

from stnls_tpu.utils.config import ConfigDict
from stnls_tpu.ops.geometry import reflect_bounds, num_queries


def _unfold_at_flow(vid, flow, ps, direction):
    """Patches at flow-shifted positions of the next/prev frame vs the
    current frame's patches. vid [B,T,C,H,W], flow [B,T,2,H,W]."""
    B, T, C, H, W = vid.shape
    hs = jnp.arange(H, dtype=jnp.float32)[None, None, :, None]
    ws_ = jnp.arange(W, dtype=jnp.float32)[None, None, None, :]
    nh = reflect_bounds(hs + flow[:, :, 1], H)
    nw = reflect_bounds(ws_ + flow[:, :, 0], W)
    nh = jnp.round(nh).astype(jnp.int32)
    nw = jnp.round(nw).astype(jnp.int32)
    tgt = jnp.clip(jnp.arange(T) + direction, 0, T - 1)
    vid_t = vid[:, tgt]
    off = -(ps // 2)
    cur, lnk = [], []
    vf = vid.reshape(B, T, C, H * W)
    vtf = vid_t.reshape(B, T, C, H * W)
    for pi in range(ps):
        for pj in range(ps):
            ph = reflect_bounds(jnp.arange(H) + pi + off, H)
            pw = reflect_bounds(jnp.arange(W) + pj + off, W)
            cur.append(vid[:, :, :, ph][:, :, :, :, pw])
            qh = reflect_bounds(nh + pi + off, H)
            qw = reflect_bounds(nw + pj + off, W)
            idx = (qh * W + qw).reshape(B, T, 1, H * W)
            idx = jnp.broadcast_to(idx, (B, T, C, H * W))
            lnk.append(jnp.take_along_axis(vtf, idx, axis=3)
                       .reshape(B, T, C, H, W))
    return jnp.stack(cur, 2), jnp.stack(lnk, 2)  # [B,T,ps2,C,H,W]


def get_patches(vid, flows, ps):
    """Current and flow-linked patches for fflow/bflow."""
    out = ConfigDict()
    out.fflow = _unfold_at_flow(vid, flows.fflow, ps, +1)
    out.bflow = _unfold_at_flow(vid, flows.bflow, ps, -1)
    return out


def get_mse(vid, flows, ps):
    """Per-direction mean squared error between flow-linked patches —
    the flow-quality score (reference get_mse)."""
    patches = get_patches(vid, flows, ps)
    mse = ConfigDict()
    for key in ("fflow", "bflow"):
        cur, lnk = patches[key]
        mse[key] = float(jnp.mean((cur - lnk) ** 2))
    return mse
