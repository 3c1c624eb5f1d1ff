"""Softmax normalization of search distances (reference
lib/stnls/normz/softmax.py:10-48): optionally truncate to k_agg, negate l2
distances, scale, softmax over K, dropout."""

import jax
import jax.numpy as jnp


class SoftmaxNormalize:

    def __init__(self, scale, drop_rate=0., dist_type="l2", k_agg=-1):
        self.scale = scale
        self.drop_rate = drop_rate
        self.dist_type = dist_type
        self.k_agg = k_agg

    def __call__(self, dists, inds, *, rng=None, deterministic=True):
        if self.k_agg > 0:
            dists = dists[..., :self.k_agg]
            inds = inds[..., :self.k_agg, :]
        if self.dist_type == "l2":
            dists = -dists
        dists = self.scale * dists
        dists = jax.nn.softmax(dists, axis=-1)
        if self.drop_rate > 0 and not deterministic:
            assert rng is not None, "dropout needs an rng key"
            keep = jax.random.bernoulli(rng, 1. - self.drop_rate, dists.shape)
            dists = jnp.where(keep, dists / (1. - self.drop_rate), 0.)
        return dists, inds

    forward = __call__

    def flops(self, *args):
        return 0


def init(cfg):
    return SoftmaxNormalize(cfg.normz_scale, cfg.normz_drop_rate,
                            cfg.dist_type, cfg.k_agg)
