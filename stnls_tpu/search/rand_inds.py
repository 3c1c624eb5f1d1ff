"""RandIndsSearch: search at randomized indices (reference
lib/stnls/search/rand_inds.py:18-48): exact NLS on noise videos generates
inds, then RefineSearch evaluates the real videos at those inds.

JAX is purely functional, so the noise comes from an explicit PRNG key
(default seed 0) instead of torch's global RNG.
"""

import jax
import jax.numpy as jnp

from stnls_tpu.search.non_local_search import (
    init as init_nls, extract_config as extract_config_nls)
from stnls_tpu.search.refinement import (
    init as init_refine, extract_config as extract_config_refine)


class RandIndsSearch:

    def __init__(self, nls, refine, seed=0):
        self.nls = nls
        self.refine = refine
        self.seed = seed

    def __call__(self, vid0, vid1, rng=None):
        rng = jax.random.PRNGKey(self.seed) if rng is None else rng
        r0, r1 = jax.random.split(rng)
        rand0 = jax.random.normal(r0, vid0.shape, vid0.dtype)
        rand1 = jax.random.normal(r1, vid1.shape, vid1.dtype)
        B = vid0.shape[0]
        T = vid0.shape[1] if vid0.ndim == 5 else vid0.shape[2]
        H, W = vid0.shape[-2:]
        zflow = jnp.zeros((B, T, 2, H, W), vid0.dtype)
        _, inds = self.nls(rand0, rand1, zflow, zflow)
        return self.refine(vid0, vid1, inds)

    forward = __call__


def extract_config(cfg, restrict=True):
    out = extract_config_nls(cfg, restrict=restrict)
    ref = extract_config_refine(cfg, restrict=restrict)
    for key, val in ref.items():
        if key not in out:
            out[key] = val
    return out


def init(cfg):
    cfg = extract_config(cfg, False)
    for key, val in {"wr": 1, "kr": -1}.items():
        if cfg[key] != val:
            cfg[key] = val
            print(f"WARNING: rand_inds requires ({key},{val}). "
                  "Changing config.")
    return RandIndsSearch(init_nls(cfg), init_refine(cfg))
