"""Padding helpers (reference lib/stnls/utils/pads.py)."""

import jax.numpy as jnp


def comp_pads(vshape, ps, stride, dil):
    """Padded size + offsets for a ps/stride/dil patch grid over (H, W)."""
    H, W = vshape[-2:]
    pad = dil * (ps // 2)
    Hp, Wp = H + 2 * pad, W + 2 * pad
    nH = (Hp - dil * (ps - 1) - 1) // stride + 1
    nW = (Wp - dil * (ps - 1) - 1) // stride + 1
    return Hp, Wp, nH, nW


def same_padded(vid, ps, stride=1, dil=1, mode="reflect"):
    """Reflect-pad the last two dims by dil*(ps//2)."""
    pad = dil * (ps // 2)
    cfg = [(0, 0)] * (vid.ndim - 2) + [(pad, pad), (pad, pad)]
    return jnp.pad(vid, cfg, mode=mode)
