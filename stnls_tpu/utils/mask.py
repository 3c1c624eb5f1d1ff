"""Index masks over videos (parity slot for reference
lib/stnls/utils/mask.py, which ships as an empty stub `inds_mask(): pass`;
this implementation completes the documented intent: turn search indices
into a boolean mask over the video pixels they touch).

mask.shape = [T, H, W]
"""

import numpy as np
import jax.numpy as jnp

from stnls_tpu.ops.geometry import reflect_bounds


def inds_mask(inds, T, H, W, stride0=1):
    """Boolean [T,H,W] mask of pixels referenced by search offsets.

    inds: [..., T, nH, nW, K, 3] relative (dt,dh,dw) offsets from the
    stride0 query grid (the search output contract, reference
    non_local_search.py:103-104). Marks each (t+dt, h+dh, w+dw) target
    pixel, reflect-bounded.
    """
    inds = jnp.round(jnp.asarray(inds)).astype(jnp.int32)
    lead = inds.shape[:-5]
    inds = inds.reshape((-1,) + inds.shape[len(lead):])
    _, T_, nH, nW, K, _ = inds.shape
    t = jnp.arange(T_, dtype=jnp.int32)[None, :, None, None, None]
    h = (jnp.arange(nH, dtype=jnp.int32) * stride0)[None, None, :, None, None]
    w = (jnp.arange(nW, dtype=jnp.int32) * stride0)[None, None, None, :, None]
    nt = reflect_bounds(t + inds[..., 0], T)
    nh = reflect_bounds(h + inds[..., 1], H)
    nw = reflect_bounds(w + inds[..., 2], W)
    flat = (nt * H + nh) * W + nw
    mask = jnp.zeros((T * H * W,), bool)
    mask = mask.at[flat.ravel()].set(True)
    return mask.reshape(T, H, W)


def mask_to_coords(mask):
    """[T,H,W] bool -> [N,3] int coordinates of set pixels (numpy)."""
    return np.argwhere(np.asarray(mask)).astype(np.int32)
