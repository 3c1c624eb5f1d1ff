"""RGB <-> orthonormal-YUV conversion (reference lib/stnls/utils/color.py).

Functional (jnp is immutable): rgb2yuv/yuv2rgb return new arrays rather
than mutating in place like the reference.
"""

import numpy as np
import jax.numpy as jnp

_W3 = 1. / np.sqrt(3)
_W2 = 1. / np.sqrt(2)
_W23 = np.sqrt(2.) / np.sqrt(3)


def rgb2gray(burst):
    """[..., 3, H, W] -> [..., 1, H, W] luma."""
    w = jnp.asarray([0.2989, 0.5870, 0.1140], burst.dtype)
    gray = jnp.tensordot(jnp.moveaxis(burst, -3, -1), w, axes=1)
    return gray[..., None, :, :].swapaxes(-3, -3)


def rgb2yuv(burst):
    """[..., 3, H, W] RGB -> orthonormal YUV."""
    r, g, b = burst[..., 0, :, :], burst[..., 1, :, :], burst[..., 2, :, :]
    y = _W3 * (r + g + b)
    u = _W2 * (r - b)
    v = (_W23 * 2.) * (.25 * r - 0.5 * g + .25 * b)
    return jnp.stack([y, u, v], axis=-3)


def yuv2rgb(burst):
    """Orthonormal YUV -> RGB (inverse of rgb2yuv)."""
    y, u, v = burst[..., 0, :, :], burst[..., 1, :, :], burst[..., 2, :, :]
    r = _W3 * y + _W2 * u + _W23 * 0.5 * v
    g = _W3 * y - _W23 * v
    b = _W3 * y - _W2 * u + _W23 * 0.5 * v
    return jnp.stack([r, g, b], axis=-3)


def yuv2rgb_patches(patches):
    """[b, k, pt, c, ph, pw] patch layout wrapper."""
    return yuv2rgb(patches)
