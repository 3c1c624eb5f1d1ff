"""Inverse gather by slot labels (reference
lib/stnls/graph_opts/gather_tensor.py — note the reference ships broken,
with a stray exit() at gather_tensor.py:56; this implementation completes
the documented contract).

gather_tensor[b,hd,q0,s,m] = tensor[b,hd,q1,k,m] where (q0,k) is the edge
with slot label s whose destination is key-grid query q1.
"""

import jax.numpy as jnp

from stnls_tpu.graph_opts.scatter_labels import _dest_raster


def run(tensor, flows_k, labels, stride0, stride1, H, W, invalid=jnp.inf,
        S=None):
    B, HD, T, nH, nW, K = flows_k.shape[:6]
    Q0 = T * nH * nW
    # pass S statically (scatter_labels.slot_bound) to stay jittable
    if S is None:
        S = int(jnp.max(labels)) + 1
    nH1 = (H - 1) // stride1 + 1
    nW1 = (W - 1) // stride1 + 1
    Q1 = T * nH1 * nW1
    tensor = tensor.reshape(B, HD, Q1, K, -1)
    M = tensor.shape[-1]

    in_dtype = tensor.dtype
    if jnp.issubdtype(in_dtype, jnp.integer):
        tensor = tensor.astype(jnp.float32)

    q1, _ = _dest_raster(flows_k, stride0, int(stride1), T, H, W)
    q1 = q1.reshape(B, HD, Q0, K)
    lab = labels.reshape(B, HD, Q0, K)

    # value at edge = tensor[q1, k]
    bidx = jnp.arange(B)[:, None, None, None]
    hidx = jnp.arange(HD)[None, :, None, None]
    kidx = jnp.arange(K)[None, None, None, :]
    vals = tensor[bidx, hidx, q1, kidx]  # [B,HD,Q0,K,M]

    out = jnp.full((B, HD, Q0, S, M), invalid, tensor.dtype)
    bidx2 = jnp.arange(B)[:, None, None]
    hidx2 = jnp.arange(HD)[None, :, None]
    q0 = jnp.broadcast_to(jnp.arange(Q0)[None, None, :, None],
                          (B, HD, Q0, K)).reshape(B, HD, -1)
    out = out.at[bidx2, hidx2, q0,
                 jnp.clip(lab, 0, S - 1).reshape(B, HD, -1)].set(
        vals.reshape(B, HD, -1, M), mode="drop")

    if jnp.issubdtype(in_dtype, jnp.integer):
        out = out.astype(in_dtype)
    if M == 1:
        out = out[..., 0]
    return out


def apply(*args, **kwargs):
    return run(*args, **kwargs)
