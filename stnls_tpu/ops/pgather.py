"""Shared patch-gather primitive with a TPU-fast transpose.

`patch_gather(frames, (tj, oi, oj), (S, Tp, Hp, Wp))` fetches, for every
query in an arbitrary index tail, the S x S block of integer pixels whose
top-left corner is (oi, oj) in frame tj — one XLA gather for all C
channels.

Its custom VJP is the load-bearing part: the automatic transpose of a big
take_along_axis is a scalar-index scatter that XLA TPU serializes (~210 ms
for 30M indices on v5e, measured in benchmarks/probe_scatter.py), while a
windowed `lax.scatter_add` over [N, S, S, C] patch updates hits a fast
path (~0.06 ms for the same work). This is the TPU replacement for the
reference's atomicAdd gradient accumulation (lib/csrc/search/
nls_bilin2d.cu:171-180, lib/csrc/agg/gather_int.cu) — and deterministic,
which the CUDA version is not.

Layout rules (measured, see benchmarks/probe_scatter*.py + MEMORY notes):
updates MUST be [N, S, S, C] with the index dim leading; C kept small
(<= 8) or the (8,128) tile padding of the minor dims OOMs; window dims
leading ([S,S,C,N]) falls off the fast path entirely.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def patch_gather(frames, idx3, dims):
    """frames [B,HD,C,M] flat (M = Tp*Hp*Wp); idx3 = (tj, oi, oj) int32
    arrays [B,HD,*tail]; dims = (S, Tp, Hp, Wp) static.
    Returns P [B,HD,C,S,S,*tail]."""
    return _patch_gather_impl(frames, idx3, dims)


def _patch_gather_impl(frames, idx3, dims):
    S, Tp, Hp, Wp = dims
    tj, oi, oj = idx3
    B, HD, C, M = frames.shape
    tail = tj.shape[2:]
    base = (tj * Hp + oi) * Wp + oj  # [B,HD,*tail]
    u_off = (jnp.arange(S, dtype=jnp.int32) * Wp)[:, None] \
        + jnp.arange(S, dtype=jnp.int32)[None, :]
    u_off = u_off.reshape((1, 1, 1, S, S) + (1,) * len(tail))
    # fold (b, hd, c) into a GLOBAL flat index and gather from a 1-D
    # operand: a 1-D array has a single possible layout, so upstream dots
    # can't push a transposed layout into the operand — with a 2-D
    # [BH, M] operand XLA then emits a scalarized custom gather with
    # per-element address arithmetic (~350 ms vs ~0.2 ms per call,
    # profiled at the 128^2 bench config).
    bh_off = (jnp.arange(B, dtype=jnp.int32)[:, None] * HD
              + jnp.arange(HD, dtype=jnp.int32)[None, :]) * (C * M)
    c_off = jnp.arange(C, dtype=jnp.int32) * M
    off = bh_off[:, :, None] + c_off[None, None, :]  # [B,HD,C]
    idx = (base[:, :, None, None, None]
           + off.reshape((B, HD, C, 1, 1) + (1,) * len(tail))
           + u_off)  # [B,HD,C,S,S,*tail]
    # clip (not fill): garbage coordinates from "invalid"-filled flows are
    # weight-masked by the caller, and 0 * NaN-fill would poison the sum
    P = jnp.take(frames.reshape(-1), idx.reshape(-1), mode="clip")
    return P.reshape((B, HD, C, S, S) + tail)


def _patch_gather_fwd(frames, idx3, dims):
    return _patch_gather_impl(frames, idx3, dims), (idx3, frames.shape)


def _patch_gather_bwd(dims, res, g):
    S, Tp, Hp, Wp = dims
    (tj, oi, oj), (B, HD, C, M) = res
    tail = tj.shape[2:]
    nt = len(tail)
    Nq = int(np.prod(tail))
    N = B * HD * Nq
    # g [B,HD,C,S,S,*tail] -> updates [N, S, S, C]
    perm = (0, 1) + tuple(range(5, 5 + nt)) + (3, 4, 2)
    upd = jnp.transpose(g, perm).reshape(N, S, S, C)
    full = (B, HD) + tail
    bh = jnp.broadcast_to(
        jnp.arange(B * HD, dtype=jnp.int32)[:, None], (B * HD, Nq)) \
        .reshape(N)
    # clip like the forward: invalid-flow coordinates carry zero cotangent
    # but must stay in range for the scatter
    idx4 = jnp.stack([
        bh,
        jnp.clip(jnp.broadcast_to(tj, full), 0, Tp - 1).reshape(N),
        jnp.clip(jnp.broadcast_to(oi, full), 0, Hp - S).reshape(N),
        jnp.clip(jnp.broadcast_to(oj, full), 0, Wp - S).reshape(N)], axis=1)
    op = jnp.zeros((B * HD, Tp, Hp, Wp, C), g.dtype)
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(0, 1),
        scatter_dims_to_operand_dims=(0, 1, 2, 3))
    out = lax.scatter_add(op, idx4, upd, dn)
    g_frames = jnp.transpose(out.reshape(B, HD, Tp, Hp, Wp, C),
                             (0, 1, 5, 2, 3, 4)).reshape(B, HD, C, M)
    zeros_i = jax.tree.map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), (tj, oi, oj))
    return g_frames, zeros_i


patch_gather.defvjp(_patch_gather_fwd, _patch_gather_bwd)


def pad_frames_cf(vid, pad, mode="reflect"):
    """vid [B,HD,T,F,H,W] -> (flat padded channels-first [B,HD,F,M],
    (T, Hp, Wp)). Reflect-padding makes every reflected read an in-bounds
    read of the padded frame (reflection is an exact per-cell mirror), so
    patch_gather needs no per-pixel reflect/clip."""
    B, HD, T, F, H, W = vid.shape
    vp = jnp.pad(vid, ((0, 0),) * 4 + ((pad, pad), (pad, pad)), mode=mode)
    Hp, Wp = H + 2 * pad, W + 2 * pad
    vp = vp.reshape(B, HD, T, F, Hp * Wp).transpose(0, 1, 3, 2, 4) \
        .reshape(B, HD, F, T * Hp * Wp)
    return vp, (T, Hp, Wp)
