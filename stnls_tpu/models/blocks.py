"""Misc model blocks (reference lib/stnls/misc/res.py ResBlockList and
lib/stnls/misc/chnl_attn.py ChannelAttention), flax.linen, channels-last
convs internally."""

import jax.numpy as jnp
import flax.linen as fnn


def _conv2d(x, features, ksize, name=None):
    """x [N,C,H,W] -> conv -> [N,C',H,W]."""
    y = jnp.moveaxis(x, 1, -1)
    y = fnn.Conv(features, (ksize, ksize), padding="SAME", name=name)(y)
    return jnp.moveaxis(y, -1, 1)


class ResBlock(fnn.Module):
    dim: int
    ksize: int = 3

    @fnn.compact
    def __call__(self, x):
        y = _conv2d(x, self.dim, self.ksize, "conv0")
        y = fnn.relu(y)
        y = _conv2d(y, self.dim, self.ksize, "conv1")
        return x + y


class ResBlockList(fnn.Module):
    nblocks: int
    dim: int
    ksize: int = 3

    @fnn.compact
    def __call__(self, x):
        for i in range(self.nblocks):
            x = ResBlock(self.dim, self.ksize, name=f"block{i}")(x)
        return x


class ChannelAttention(fnn.Module):
    """Squeeze-excite channel attention (reference misc/chnl_attn.py)."""
    dim: int
    reduction: int = 4

    @fnn.compact
    def __call__(self, x):
        # x [N,C,H,W]
        pooled = jnp.mean(x, axis=(-2, -1))  # [N,C]
        h = fnn.Dense(max(self.dim // self.reduction, 1))(pooled)
        h = fnn.relu(h)
        h = fnn.Dense(self.dim)(h)
        gate = fnn.sigmoid(h)[..., None, None]
        return x * gate
