"""Anchor-self reordering (reference lib/stnls/nn/anchor_self.py +
lib/csrc/nn/anchor_self_kernel.cu:25-116).

Moves each query's "self" entry (the one whose offset is ~zero) to slot 0 of
the flattened search volume. The CUDA kernel does an in-place compare-and-
swap; here it is a functional permutation built from argmin + masked
select, fully vectorized and differentiable through the dist values.

Layout: offset components travel on a *leading* [3, ..., S] axis (see
ops/nls.py TPU layout notes); a trailing 3-axis would pad 42x on TPU.

Semantics preserved from the kernel:
  * int inds: the first entry with offset exactly (0,0,0);
  * float inds: the first entry minimizing |dt|+|dh|+|dw| (the kernel's
    early-exit at delta < 1e-8 coincides with first-argmin);
  * dists: slot0 and the self slot swap values;
  * inds: slot0 is overwritten with exact zeros, and the *old* slot-0 offset
    triple is written into the self slot.
"""

import jax.numpy as jnp


def anchor_self(dists, inds3):
    """dists [..., S], inds3 [C, ..., S] -> (dists, inds3, order [...])."""
    S = dists.shape[-1]
    delta = jnp.sum(jnp.abs(inds3), axis=0)
    self_idx = jnp.argmin(delta, axis=-1)  # first min (matches kernel scan)

    s_ids = jnp.arange(S)
    is_self = s_ids == self_idx[..., None]
    is_zero = s_ids == 0

    d0 = dists[..., :1]
    dself = jnp.take_along_axis(dists, self_idx[..., None], axis=-1)
    new_dists = jnp.where(is_zero, dself, jnp.where(is_self, d0, dists))

    i0 = inds3[..., :1]
    new_inds3 = jnp.where(is_zero, jnp.zeros_like(i0),
                          jnp.where(is_self, i0, inds3))
    return new_dists, new_inds3, self_idx.astype(jnp.int32)


def anchor_self_time(dists, inds3):
    """Per-time-slot anchoring (anchor_self_time kernel): dists
    [..., W_t, S], inds3 [3, ..., W_t, S]; anchors the min |dh|+|dw| entry of
    each time slot to that slot's position 0 while keeping its dt."""
    S = dists.shape[-1]
    delta = jnp.sum(jnp.abs(inds3[1:]), axis=0)  # spatial offset only
    self_idx = jnp.argmin(delta, axis=-1)

    s_ids = jnp.arange(S)
    is_self = s_ids == self_idx[..., None]
    is_zero = s_ids == 0

    d0 = dists[..., :1]
    dself = jnp.take_along_axis(dists, self_idx[..., None], axis=-1)
    new_dists = jnp.where(is_zero, dself, jnp.where(is_self, d0, dists))

    i0 = inds3[..., :1]
    iself = jnp.take_along_axis(inds3, self_idx[None, ..., None], axis=-1)
    # slot0 keeps the self entry's (dt, 0, 0): spatial components zeroed
    zeroed = jnp.concatenate([iself[:1], jnp.zeros_like(iself[1:])], axis=0)
    new_inds3 = jnp.where(is_zero, zeroed, jnp.where(is_self, i0, inds3))
    return new_dists, new_inds3, self_idx.astype(jnp.int32)


def anchor_self_refine(dists, inds3, flows3):
    """Refinement anchoring (anchor_self_refine kernel): per source-k group,
    move the entry closest to the *given* flow back to slot 0 of the group.

    dists [..., Ks, S], inds3 [3, ..., Ks, S], flows3 [3, ..., Ks].
    """
    S = dists.shape[-1]
    delta = jnp.sum(jnp.abs(inds3 - flows3[..., None]), axis=0)
    self_idx = jnp.argmin(delta, axis=-1)

    s_ids = jnp.arange(S)
    is_self = s_ids == self_idx[..., None]
    is_zero = s_ids == 0

    d0 = dists[..., :1]
    dself = jnp.take_along_axis(dists, self_idx[..., None], axis=-1)
    new_dists = jnp.where(is_zero, dself, jnp.where(is_self, d0, dists))

    i0 = inds3[..., :1]
    iself = jnp.take_along_axis(inds3, self_idx[None, ..., None], axis=-1)
    new_inds3 = jnp.where(is_zero, iself, jnp.where(is_self, i0, inds3))
    return new_dists, new_inds3, self_idx.astype(jnp.int32)
