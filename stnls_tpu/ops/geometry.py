"""Geometry core: index math shared by every stnls_tpu op.

TPU-native reimplementation of the device helpers in the reference CUDA header
(`lib/csrc/shared_kernel.cu`). Everything here is pure jnp on arrays with
*static* shape parameters, so all functions are jit/vmap/shard_map compatible
and differentiable where the reference is (reflection is piecewise-linear, so
autodiff recovers the reference's hand-written sign tracking `signH/signW`).

Reference semantics covered:
  - reflect_bounds      <- bounds()            shared_kernel.cu:50-60
  - reflect_bounds_clip <- bounds_clip()       shared_kernel.cu:62-73
  - in_interval         <- check_interval()    shared_kernel.cu:143-147
  - pixel_grid          <- get_pixel_loc()     shared_kernel.cu:76-98
  - search_offsets      <- set_search_offsets() shared_kernel.cu:248-287
  - time_window_frames  <- set_time_range()+t-loop
                           shared_kernel.cu:307-312, search/utils.py:311-331
  - bilinear_gather     <- bilin2d_interpolate() shared_kernel.cu:738-771
"""

import numpy as np
import jax.numpy as jnp


def reflect_bounds(val, lim):
    """Single reflection at the boundary: -1 -> 1, lim -> lim-2.

    Works on int or float arrays (matches the templated CUDA `bounds`).
    Only a single reflection is applied, exactly like the reference.
    """
    below = -val
    above = 2 * (lim - 1) - val
    out = jnp.where(val < 0, below, val)
    out = jnp.where(val > (lim - 1), above, out)
    return out


def reflect_bounds_clip(val, lim):
    """Reflection with fallback clip for |val| >= lim (bounds_clip)."""
    below = jnp.where(-val > (lim - 1), 0, -val)
    above = jnp.where(2 * (lim - 1) - val < 0, lim - 1, 2 * (lim - 1) - val)
    out = jnp.where(val < 0, below, val)
    out = jnp.where(val > (lim - 1), above, out)
    return out


def in_interval(val, lower, upper):
    """check_interval: lower <= val <= upper-1 (inclusive of upper-1)."""
    return jnp.logical_and(val >= lower, val <= (upper - 1))


def in_bounds(val, upper):
    return in_interval(val, 0, upper)


def num_queries(H, W, stride0):
    """Query-grid size along each axis for a given stride (nH, nW)."""
    return (H - 1) // stride0 + 1, (W - 1) // stride0 + 1


def pixel_grid(T, nH, nW, stride, H, W):
    """Reference pixel locations of the query grid.

    Returns int32 arrays (t[T], h[nH], w[nW]); h = (i*stride) % H mirroring
    get_pixel_loc (the modulo is a no-op for legal grids but kept for parity).
    """
    t = np.arange(T, dtype=np.int32)
    h = (np.arange(nH, dtype=np.int64) * stride) % H
    w = (np.arange(nW, dtype=np.int64) * stride) % W
    return (jnp.asarray(t, jnp.int32), jnp.asarray(h.astype(np.int32)),
            jnp.asarray(w.astype(np.int32)))


def time_window_frames(T, wt):
    """Static [T, W_t] table: target frame tj for (query frame ti, slot st).

    Mirrors the kernel's `set_time_range` + in-loop shift: slots walk forward
    from ti to t_max, then wrap to ti-1, ti-2, ... (boundary-shifted window).
    W_t = min(2*wt+1, T).
    """
    W_t = min(2 * wt + 1, T)
    table = np.zeros((T, W_t), dtype=np.int32)
    for ti in range(T):
        t_shift = min(0, ti - wt) + max(0, ti + wt - (T - 1))
        t_max = min(T - 1, ti + wt - t_shift)
        for st in range(W_t):
            tj = ti + st
            table[ti, st] = tj if tj <= t_max else t_max - st
    return table


def search_offsets(hi, wi, stride1, ws, H, W, full_ws, is_int):
    """Window-offset (wsOff_h, wsOff_w) per search center (set_search_offsets).

    `hi`/`wi` are arrays of center coordinates (int or float); `stride1` may be
    fractional in the float path. With full_ws, offsets are shifted so the
    whole ws-window stays inside the image; the reference rounds float offsets
    so the center is on the search lattice.
    """
    wsHalf = (ws - 1) // 2
    dtype = hi.dtype if not is_int else jnp.int32

    def one_axis(xi, L):
        off = jnp.full_like(xi, wsHalf)
        if not full_ws:
            return off
        # bound min: first lattice point >= 0
        off_min = jnp.floor(xi / (1.0 * stride1)).astype(dtype)
        off = jnp.where(xi - stride1 * wsHalf < 0, off_min, off)
        # bound max: last lattice point <= L-1
        x_max = xi + stride1 * ((ws - 1) - off)
        off_max = jnp.ceil((xi - (L - 1)) / (1.0 * stride1) + (ws - 1)).astype(dtype)
        off = jnp.where(x_max > (L - 1), off_max, off)
        if not is_int:
            off = jnp.round(off)
        return off

    return one_axis(hi, H), one_axis(wi, W)


def bilinear_gather(frame, hi, wi, H, W):
    """Bilinearly interpolate `frame` [..., H, W] at float coords (hi, wi).

    Out-of-bounds corners contribute zero (mirrors bilin2d_interpolate's
    check_bound + skip). hi/wi broadcast against frame's leading dims; the
    returned array has the broadcast shape of (hi, wi) with frame's leading
    dims. Expects frame laid out [..., H, W] with coords indexing the last
    two axes.
    """
    h0 = jnp.floor(hi)
    w0 = jnp.floor(wi)
    out = None
    for di in (0, 1):
        for dj in (0, 1):
            hc = h0 + di
            wc = w0 + dj
            wgt = (jnp.maximum(0.0, 1.0 - jnp.abs(hc - hi))
                   * jnp.maximum(0.0, 1.0 - jnp.abs(wc - wi)))
            valid = jnp.logical_and(in_bounds(hc, H), in_bounds(wc, W))
            hci = jnp.clip(hc, 0, H - 1).astype(jnp.int32)
            wci = jnp.clip(wc, 0, W - 1).astype(jnp.int32)
            pix = frame[..., hci, wci]
            term = jnp.where(valid, wgt, 0.0) * pix
            out = term if out is None else out + term
    return out


def flat_gather(frames_flat, idx, fill=0.0, valid=None):
    """Gather along the flattened last axis with optional validity mask.

    frames_flat: [..., N]; idx: int array broadcastable over leading dims.
    """
    took = jnp.take_along_axis(frames_flat, idx, axis=-1)
    if valid is not None:
        took = jnp.where(valid, took, fill)
    return took
