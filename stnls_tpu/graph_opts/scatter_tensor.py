"""Slot-indexed scatter of per-edge tensors (reference
lib/stnls/graph_opts/scatter_tensor.py + scatter_tensor_kernel.cu).

scatter_tensor[b,hd,q1,s,m] = tensor[b,hd,q0,k,m] for the edge (q0,k) whose
destination is key-grid query q1 with slot label s. Pure jnp scatter
(`.at[].set`, collision-free by the label construction), differentiable in
`tensor` — jax.grad replaces scatter_tensor_backward.
"""

import jax.numpy as jnp

from stnls_tpu.graph_opts.scatter_labels import _dest_raster


def run(tensor, flows_k, labels, stride0, stride1, H, W, invalid=jnp.inf,
        S=None):
    B, HD, T, nH0, nW0, K = tensor.shape[:6]
    Q0 = T * nH0 * nW0
    # slot count: pass S statically (e.g. scatter_labels.slot_bound) to stay
    # jittable; the labels.max()+1 fallback matches the reference but forces
    # a host sync.
    if S is None:
        S = int(jnp.max(labels)) + 1
    tensor = tensor.reshape(B, HD, Q0, K, -1)
    M = tensor.shape[-1]
    nH1 = (H - 1) // stride1 + 1
    nW1 = (W - 1) // stride1 + 1
    Q1 = T * nH1 * nW1

    in_dtype = tensor.dtype
    if jnp.issubdtype(in_dtype, jnp.integer):
        tensor = tensor.astype(jnp.float32)

    q1, _ = _dest_raster(flows_k, stride0, int(stride1), T, H, W)
    q1 = q1.reshape(B, HD, Q0 * K)
    lab = labels.reshape(B, HD, Q0 * K)

    out = jnp.full((B, HD, Q1, S, M), invalid, tensor.dtype)
    bidx = jnp.arange(B)[:, None, None]
    hidx = jnp.arange(HD)[None, :, None]
    out = out.at[bidx, hidx, q1, jnp.clip(lab, 0, S - 1)].set(
        tensor.reshape(B, HD, Q0 * K, M), mode="drop")

    if jnp.issubdtype(in_dtype, jnp.integer):
        out = out.astype(in_dtype)
    if M == 1:
        out = out[..., 0]
    return out


def apply(tensor, flows_k, labels, stride0, stride1, H, W, invalid=jnp.inf,
          S=None):
    return run(tensor, flows_k, labels, stride0, stride1, H, W, invalid, S)


def run_topk(weights, flows_k, labels, K, descending=True):
    """Top-K over the slot axis of scattered weights (reference
    scatter_tensor.py run_topk)."""
    B, HD, Q, S, _ = flows_k.shape
    if K <= 0:
        K = S
    key = -weights if descending else weights
    order = jnp.argsort(key, axis=-1)[..., :K]
    w_k = jnp.take_along_axis(weights, order, axis=-1)
    l_k = jnp.take_along_axis(labels, order, axis=-1)
    f_k = jnp.take_along_axis(flows_k, order[..., None], axis=-2)
    return w_k, f_k, l_k
