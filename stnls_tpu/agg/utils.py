"""Shared agg-layer shaping helpers (reference lib/stnls/agg/gather.py
ensure_ndim6 etc.)."""

import jax.numpy as jnp


def ensure_ndim6(vid, nheads):
    if vid.ndim == 5:
        B, T, C, H, W = vid.shape
        if C % nheads == 0:
            vid = vid.reshape(B, T, nheads, C // nheads, H, W)
            vid = jnp.transpose(vid, (0, 2, 1, 3, 4, 5))
        else:
            vid = vid[:, None]
    assert vid.ndim == 6
    return vid


def ensure_flow_heads(flows):
    if flows.ndim == 4:  # [B,Q,K,3]
        flows = flows[:, None]
    return flows


def expand_heads(arr, HD):
    """Broadcast a 1-head array over HD heads."""
    if arr.shape[1] == HD:
        return arr
    assert arr.shape[1] == 1
    return jnp.broadcast_to(arr, (arr.shape[0], HD) + arr.shape[2:])
