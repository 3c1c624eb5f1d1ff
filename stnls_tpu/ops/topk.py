"""Top-K selection over the flattened search volume.

Reference: lib/stnls/nn/topk.py (standard_topk:196-220, anchored_topk:107-156,
topk_each:224-268). Built on argsort + take_along_axis so gradients flow
back into the selected dists exactly like torch.gather's backward.

Layout: offset components on a leading [C, ..., S] axis (see ops/nls.py).
"""

import jax
import jax.numpy as jnp


def standard_topk(dists, inds3, k, descending):
    """dists [..., S], inds3 [C, ..., S] -> top-k along the search axis.

    Returns (dists_k, inds3_k, order) with order [..., k] int32.
    Uses lax.top_k (TPU-native partial selection) instead of the
    reference's full argsort (topk.py:209).
    """
    S = dists.shape[-1]
    k = min(k, S) if k > 0 else S
    key = dists if descending else -dists
    _, order = jax.lax.top_k(key, k)
    dists_k = jnp.take_along_axis(dists, order, axis=-1)
    inds3_k = jnp.take_along_axis(inds3, order[None], axis=-1)
    return dists_k, inds3_k, order.astype(jnp.int32)


def anchored_topk(dists, inds3, k, descending):
    """Keep slot 0 fixed, top-(k-1) over the rest (anchored_topk)."""
    d0, i0 = dists[..., :1], inds3[..., :1]
    dk, ik, order = standard_topk(dists[..., 1:], inds3[..., 1:],
                                  k - 1 if k > 0 else -1, descending)
    dists_k = jnp.concatenate([d0, dk], axis=-1)
    inds3_k = jnp.concatenate([i0, ik], axis=-1)
    order = jnp.concatenate(
        [jnp.zeros_like(order[..., :1]), order + 1], axis=-1)
    return dists_k, inds3_k, order


def topk(dists, inds3, k, descending, anchor=False, return_order=False):
    """Menu dispatch (reference topk.run / topk_menu)."""
    if k <= 0:
        return (dists, inds3, None) if return_order else (dists, inds3)
    if anchor:
        out = anchored_topk(dists, inds3, k, descending)
    else:
        out = standard_topk(dists, inds3, k, descending)
    return out if return_order else out[:2]


def topk_each(dists, inds3, k, descending, anchor_self=False):
    """Per-group top-k: dists [..., G, S], inds3 [C, ..., G, S] -> top-k
    within each group (reference run_each/topk_each_impl)."""
    if k <= 0:
        return dists, inds3
    if anchor_self:
        d0, i0 = dists[..., :1], inds3[..., :1]
        if k > 1 and dists.shape[-1] > 1:
            dk, ik, _ = standard_topk(dists[..., 1:], inds3[..., 1:],
                                      k - 1, descending)
            return (jnp.concatenate([d0, dk], axis=-1),
                    jnp.concatenate([i0, ik], axis=-1))
        return d0, i0
    dk, ik, _ = standard_topk(dists, inds3, k, descending)
    return dk, ik


def apply_topk(tensor, order, axis=-1):
    """Permute `tensor` along `axis` by a previously returned order."""
    if order is None:
        return tensor
    return jnp.take_along_axis(tensor, order, axis=axis)
