"""Misc utilities (reference lib/stnls/utils/misc.py): offset <-> absolute
coordinate conversion, reflection, seeding, pickling."""

import pickle
import random

import numpy as np
import jax.numpy as jnp

from stnls_tpu.utils.config import optional, optional_delete  # noqa: F401
from stnls_tpu.ops.geometry import reflect_bounds


def set_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


def assert_nonan(tensor):
    assert not bool(jnp.any(jnp.isnan(tensor)))


def rslice(vid, coords):
    if coords is None or len(coords) == 0:
        return vid
    fs, fe, t, l, b, r = [int(c) for c in coords]
    return vid[fs:fe, :, t:b, l:r]


def write_pickle(fn, obj):
    with open(str(fn), "wb") as f:
        pickle.dump(obj, f)


def read_pickle(fn):
    with open(str(fn), "rb") as f:
        return pickle.load(f)


def get_space_grid(H, W, dtype=jnp.float32):
    """[1, H, W, 2] grid of (x, y) coordinates."""
    y, x = jnp.meshgrid(jnp.arange(H, dtype=dtype),
                        jnp.arange(W, dtype=dtype), indexing="ij")
    return jnp.stack((x, y), -1)[None]


def reflect_inds(inds, H, W):
    """Reflect absolute (t,h,w) coordinates into frame bounds."""
    h = reflect_bounds(inds[..., 1], H)
    w = reflect_bounds(inds[..., 2], W)
    return jnp.concatenate([inds[..., :1], h[..., None], w[..., None]], -1)


def flow2inds(flow, stride0):
    """Relative offsets -> absolute (t,h,w) coordinates
    (reference misc.py:67-83). flow [B(,HD),T,nH,nW,K,3]."""
    ndim = flow.ndim
    if ndim == 7:
        B, HD = flow.shape[:2]
        flow = flow.reshape((B * HD,) + flow.shape[2:])
    _, T, nH, nW, K, _ = flow.shape
    grid = stride0 * get_space_grid(nH, nW).astype(flow.dtype)
    # grid stores (x,y); offsets are (h,w) -> flip
    hw = flow[..., 1:] + grid[:, None, :, :, None][..., ::-1]
    t = flow[..., 0] + jnp.arange(T, dtype=flow.dtype).reshape(1, T, 1, 1, 1)
    inds = jnp.concatenate([t[..., None], hw], -1)
    if ndim == 7:
        inds = inds.reshape((B, HD) + inds.shape[1:])
    return inds


def inds2flow(inds, stride0):
    """Absolute (t,h,w) coordinates -> relative offsets
    (reference misc.py:85-103)."""
    ndim = inds.ndim
    if ndim == 7:
        B, HD = inds.shape[:2]
        inds = inds.reshape((B * HD,) + inds.shape[2:])
    _, T, nH, nW, K, _ = inds.shape
    grid = stride0 * get_space_grid(nH, nW).astype(inds.dtype)
    hw = inds[..., 1:] - grid[:, None, :, :, None][..., ::-1]
    t = inds[..., 0] - jnp.arange(T, dtype=inds.dtype).reshape(1, T, 1, 1, 1)
    flow = jnp.concatenate([t[..., None], hw], -1)
    if ndim == 7:
        flow = flow.reshape((B, HD) + flow.shape[1:])
    return flow
