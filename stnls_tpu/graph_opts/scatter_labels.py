"""Slot labels for NonLocalScatter (reference
lib/stnls/graph_opts/scatter_labels.py + scatter_labels_kernel.cu:116,251).

Each (query, k) edge of the search graph points at a destination key
location; edges sharing a destination must land in distinct slots `s` so the
scatter has no write collisions. The reference derives the label from window
geometry inside a CUDA kernel; on TPU we don't need atomics at all, so the
label is defined directly as the *rank of the edge among all edges sharing
its destination* — computed with one sort (deterministic, works for any
flows_k, not just exact search outputs). The slot-count bound S keeps the
reference's allocation formula (scatter_labels.py:40-47).
"""

import jax
import jax.numpy as jnp

from stnls_tpu.ops.geometry import reflect_bounds


def slot_bound(ws, wt, stride0, T, full_ws):
    """Max slots per destination (reference scatter_labels.py:40-47)."""
    Wt_num = T if wt > 0 else 1
    wsNum = ws // stride0 + 1
    Ws_num = wsNum * wsNum
    if full_ws:
        Ws_num += 2 * wsNum * (wsNum // 2) + (wsNum // 2) ** 2
    return Wt_num * Ws_num


def _dest_raster(flows_k, stride0, stride1, T, H, W):
    """Absolute destination (t,h,w) per edge -> raster index on the stride1
    key grid. flows_k [B,HD,T,nH,nW,K,3] int offsets from the stride0 query
    grid."""
    B, HD, T_, nH, nW, K, _ = flows_k.shape
    t = jnp.arange(T_, dtype=jnp.int32)[None, None, :, None, None, None]
    h = (jnp.arange(nH, dtype=jnp.int32) * stride0)[None, None, None, :, None, None]
    w = (jnp.arange(nW, dtype=jnp.int32) * stride0)[None, None, None, None, :, None]
    fk = jnp.round(flows_k).astype(jnp.int32) \
        if jnp.issubdtype(flows_k.dtype, jnp.floating) else flows_k
    nt = reflect_bounds(t + fk[..., 0], T)
    nh = reflect_bounds(h + fk[..., 1], H)
    nw = reflect_bounds(w + fk[..., 2], W)
    nH1 = (H - 1) // stride1 + 1
    nW1 = (W - 1) // stride1 + 1
    q1 = (nt * nH1 + nh // stride1) * nW1 + nw // stride1
    return q1, (nt, nh, nw)


def run(flows, flows_k, ws, wt, stride0, stride1, H, W, full_ws):
    """Returns (names, labels):
    labels [B,HD,Q,K] int32 slot per edge;
    names [B,HD,S,T,H,W,2] inverse map holding (qi, ki) per (slot, dest)
    (-1 where empty), matching the reference's output contract."""
    B, HD, T, nH, nW, K, _ = flows_k.shape
    Q = T * nH * nW
    S = slot_bound(ws, wt, stride0, T, full_ws)

    q1, (nt, nh, nw) = _dest_raster(flows_k, stride0, int(stride1), T, H, W)
    dest = q1.reshape(B, HD, Q * K)

    # rank within equal-destination runs via one stable sort
    order = jnp.argsort(dest, axis=-1, stable=True)
    d_sorted = jnp.take_along_axis(dest, order, axis=-1)
    idx = jnp.arange(Q * K)
    new_run = jnp.concatenate(
        [jnp.ones_like(d_sorted[..., :1], bool),
         d_sorted[..., 1:] != d_sorted[..., :-1]], axis=-1)
    run_start = jnp.where(new_run, idx, 0)
    run_start = jax.lax.cummax(run_start, axis=run_start.ndim - 1)
    rank_sorted = idx - run_start
    # unsort
    inv = jnp.argsort(order, axis=-1, stable=True)
    labels = jnp.take_along_axis(rank_sorted, inv, axis=-1) \
        .reshape(B, HD, Q, K).astype(jnp.int32)

    # inverse names map
    names = -jnp.ones((B, HD, S, T, H, W, 2), jnp.int32)
    qi = jnp.broadcast_to(
        jnp.arange(Q, dtype=jnp.int32).reshape(T, nH, nW)[None, None, ..., None],
        (B, HD, T, nH, nW, K))
    ki = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32),
                          (B, HD, T, nH, nW, K))
    lab6 = labels.reshape(B, HD, T, nH, nW, K)
    bidx = jnp.arange(B)[:, None, None]
    hidx = jnp.arange(HD)[None, :, None]
    flat = lambda x: x.reshape(B, HD, -1)
    names = names.at[bidx, hidx, flat(jnp.clip(lab6, 0, S - 1)), flat(nt),
                     flat(nh), flat(nw)].set(
        jnp.stack([flat(qi), flat(ki)], -1), mode="drop")
    return names, labels


def apply(*args, **kwargs):
    return run(*args, **kwargs)
