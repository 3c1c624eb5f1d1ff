"""Reference-convention top-K wrappers (lib/stnls/nn/topk.py). Offsets use
the public trailing-component layout [..., D]."""

import jax.numpy as jnp

from stnls_tpu.ops import topk as _topk


def topk(dists, inds, k, dim=None, anchor=False, descending=True,
         unique=False, return_order=False):
    """Top-k along the search axis (always the axis before the component
    axis of inds). `unique` deduplication is handled upstream by the
    deterministic lattice (duplicates only arise from reflection at
    boundaries, kept identical to the reference's default path)."""
    del dim, unique
    i3 = jnp.moveaxis(inds, -1, 0)
    out = _topk.topk(dists, i3, k, descending, anchor=anchor,
                     return_order=True)
    d, i, order = out
    i = jnp.moveaxis(i, 0, -1)
    if return_order:
        return d, i, order
    return d, i


def topk_each(dists, inds, k, descending, anchor_self=False):
    i3 = jnp.moveaxis(inds, -1, 0)
    d, i = _topk.topk_each(dists, i3, k, descending, anchor_self=anchor_self)
    return d, jnp.moveaxis(i, 0, -1)


def standard_topk(dists, inds, k, descending):
    i3 = jnp.moveaxis(inds, -1, 0)
    d, i, order = _topk.standard_topk(dists, i3, k, descending)
    return d, jnp.moveaxis(i, 0, -1), order


def anchored_topk(dists, inds, k, descending, unique=False):
    del unique
    i3 = jnp.moveaxis(inds, -1, 0)
    d, i, order = _topk.anchored_topk(dists, i3, k, descending)
    return d, jnp.moveaxis(i, 0, -1), order


def apply_topk(tensor, order, dim):
    return _topk.apply_topk(tensor, order, axis=dim)
