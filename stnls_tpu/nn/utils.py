"""NN-layer utilities (reference lib/stnls/nn/utils.py): flow rescaling to
feature resolution."""

import jax
import jax.numpy as jnp

from stnls_tpu.utils.config import ConfigDict


def _interp_bilinear(x, H, W):
    """Bilinear resize with align_corners=True semantics on [N,2,h,w]."""
    N, C, h, w = x.shape
    if h == H and w == W:
        return x
    ys = jnp.linspace(0., h - 1., H)
    xs = jnp.linspace(0., w - 1., W)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[None, None, :, None]
    wx = (xs - x0)[None, None, None, :]
    g = lambda yi, xi: x[:, :, yi][:, :, :, xi]
    out = ((1 - wy) * (1 - wx) * g(y0, x0) + (1 - wy) * wx * g(y0, x1)
           + wy * (1 - wx) * g(y1, x0) + wy * wx * g(y1, x1))
    return out


def rescale_flows(flows_og, H, W):
    """Resize + rescale fflow/bflow to resolution (H, W) (reference
    nn/utils.py:6-41)."""
    if flows_og is None:
        return None
    fshape = list(flows_og.fflow.shape)
    _H, _W = fshape[-2:]
    if _H == H:
        return flows_og
    fflow = flows_og.fflow.reshape(-1, 2, _H, _W)
    bflow = flows_og.bflow.reshape(-1, 2, _H, _W)
    scale = jnp.asarray([_W / W, _H / H]).reshape(1, 2, 1, 1)
    fshape[-2], fshape[-1] = H, W
    out = ConfigDict()
    out.fflow = _interp_bilinear(fflow / scale, H, W).reshape(fshape)
    out.bflow = _interp_bilinear(bflow / scale, H, W).reshape(fshape)
    return out
