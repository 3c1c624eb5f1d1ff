"""Reference-convention anchoring wrappers (lib/stnls/nn/anchor_self.py).

The reference mutates dists/inds in place; here the functions are pure and
return the reordered (dists, inds[, order]). Offsets use the public
trailing-component convention [..., 3]; internally they move to the leading
axis (see ops/nls.py layout notes)."""

import jax.numpy as jnp

from stnls_tpu.ops import anchor as _anchor


def anchor_self(dists, inds, stride0=None, nH=None, nW=None):
    """dists [B,HD,Q,...flatK], inds [..., 2or3] -> (dists, inds, order)."""
    i3 = jnp.moveaxis(inds, -1, 0)
    d, i, order = _anchor.anchor_self(dists, i3)
    return d, jnp.moveaxis(i, 0, -1), order


def anchor_self_time(dists, inds, flows=None, wt=None, stride0=None,
                     qH=None, qW=None, kH=None, kW=None):
    """dists [..., W_t, S], inds [..., W_t, S, 3]."""
    i3 = jnp.moveaxis(inds, -1, 0)
    d, i, order = _anchor.anchor_self_time(dists, i3)
    return d, jnp.moveaxis(i, 0, -1), order


def anchor_self_refine(dists, inds, flows, stride0=None, qH=None, qW=None,
                       kH=None, kW=None):
    """dists [..., Ks, S], inds [..., Ks, S, 3], flows [..., Ks, 3]."""
    i3 = jnp.moveaxis(inds, -1, 0)
    f3 = jnp.moveaxis(flows, -1, 0)
    d, i, order = _anchor.anchor_self_refine(dists, i3, f3)
    return d, jnp.moveaxis(i, 0, -1), order


def anchor_self_paired(dists, inds, flows, stride0=None, qH=None, qW=None,
                       kH=None, kW=None):
    """2-d variant (anchor_self_kernel.cu:548): same as refine with 2-d
    offsets/flows."""
    i3 = jnp.moveaxis(inds, -1, 0)
    f3 = jnp.moveaxis(flows, -1, 0)
    d, i, order = _anchor.anchor_self_refine(dists, i3, f3)
    return d, jnp.moveaxis(i, 0, -1), order
