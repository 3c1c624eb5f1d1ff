"""Flow composition ops (TPU-native).

Reference: lib/stnls/nn/search_flow.py + lib/csrc/nn/search_flow_kernel.cu
(:17-90) and lib/stnls/nn/accumulate_flow.py + accumulate_flow_kernel.cu.

Both ops compose per-frame optical flows into multi-frame offsets by
repeatedly bilinearly sampling the next frame's flow at the current
accumulated position (`update_centers_flow_acc`, shared_flows.cu:76-107,
which *reflects* out-of-bounds corners rather than zeroing them). Here the
walk is a `lax.scan` over time steps, vectorized over every query, and
differentiable — `jax.grad` replaces the hand-written backward kernels
(search_flow.py:69-95's chain-rule buffer).
"""

import numpy as np
import jax
import jax.numpy as jnp

from stnls_tpu.ops.geometry import reflect_bounds, num_queries


def _sample_flow(flow, h, w, H, W):
    """Bilinear sample `flow` [B,T,2,H,W] at float coords h,w [B,T,nH,nW];
    out-of-bounds corners are reflect-indexed (shared_flows.cu:93-99).
    Returns (dW, dH) components sampled at (h, w).

    ONE row gather per sample: per-element scalar gathers cost ~9 ns/elem
    on TPU (even 1-D flat ones), so the 4 corner x 2 component values are
    packed into 18-lane rows (the 3x3 pixel neighborhood of the reflected
    base corner) and fetched with a single row-index gather. The corners'
    reflected coordinates are recovered from the neighborhood via the
    reflection-direction sign: reflect(h0+1) == reflect(h0) + s with
    s = +1 iff 0 <= h0 <= H-2 else -1 (single-reflection domain, same as
    the reference's bounds()).

    MEMORY NOTE: the packed operand materializes 9 shifted copies of the
    padded flow field (~9x the flow bytes) as a [B*T*H*W, 18] transient —
    about 1.5 GB at 1080p T=10 on top of the live arrays. Fits today's
    benchmark configs; if a larger T/batch OOMs here, build the pack
    per-frame inside the accumulation scan instead (ADVICE r4 #5)."""
    B, T = flow.shape[:2]
    h0f = jnp.floor(h)
    w0f = jnp.floor(w)
    fh = h - h0f
    fw = w - w0f
    h0 = h0f.astype(jnp.int32)
    w0 = w0f.astype(jnp.int32)
    hr = reflect_bounds(h0, H)
    wr = reflect_bounds(w0, W)
    sh = jnp.where((h0 >= 0) & (h0 <= H - 2), 1, -1)
    sw = jnp.where((w0 >= 0) & (w0 <= W - 2), 1, -1)

    # packed operand: rows (b,t,y,x) hold flow[b,t,:,y+dy-1,x+dx-1] for
    # the 3x3 neighborhood (edge-clamped pad; clamped rows are only read
    # at coordinates where the reference itself indexes out of frame)
    fp = jnp.pad(flow, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)),
                 mode="edge")
    packs = [fp[:, :, :, dy:dy + H, dx:dx + W]
             for dy in (0, 1, 2) for dx in (0, 1, 2)]
    P9 = jnp.stack(packs, axis=-1)               # [B,T,2,H,W,9]
    P9 = jnp.transpose(P9, (0, 1, 3, 4, 2, 5)).reshape(B * T * H * W, 18)

    bt = (jnp.arange(B, dtype=jnp.int32)[:, None] * T
          + jnp.arange(T, dtype=jnp.int32)[None, :])[:, :, None, None]
    ridx = (bt * H + hr) * W + wr
    rows = jnp.take(P9, ridx.reshape(-1), axis=0,
                    mode="clip").reshape(h.shape + (18,))

    def corner(comp, dy, dx):
        # lane (comp, 1 + s*dy, 1 + s*dx) of the 3x3 pack
        lp = rows[..., comp * 9 + (1 + dy) * 3 + (1 + dx)]
        lm = rows[..., comp * 9 + (1 - dy) * 3 + (1 - dx)]
        lpm = rows[..., comp * 9 + (1 + dy) * 3 + (1 - dx)]
        lmp = rows[..., comp * 9 + (1 - dy) * 3 + (1 + dx)]
        vp = jnp.where(sw > 0, lp, lpm)
        vm = jnp.where(sw > 0, lmp, lm)
        return jnp.where(sh > 0, vp, vm)

    outW, outH = 0., 0.
    for di in (0, 1):
        wh = jnp.maximum(0., 1. - jnp.abs(di - fh))
        for dj in (0, 1):
            wgt = wh * jnp.maximum(0., 1. - jnp.abs(dj - fw))
            outW = outW + wgt * corner(0, di, dj)
            outH = outH + wgt * corner(1, di, dj)
    return outW, outH


def search_flow(fflow, bflow, wt, stride0=1):
    """Compose fflow/bflow into the W_t-1 search-window offsets.

    fflow/bflow [B,T,2,H,W] -> flows [B,T,W_t-1,2,nH,nW]; slot si-1 holds
    the accumulated offset from frame ti to the si-th frame of the
    boundary-shifted window (search_flow_kernel.cu:60-86).
    """
    B, T, _, H, W = fflow.shape
    W_t = min(2 * wt + 1, T)
    nH, nW = num_queries(H, W, stride0)
    if wt <= 0:
        return jnp.zeros((B, T, 0, 2, nH, nW), fflow.dtype)

    # static walk tables per (ti, si)
    tj_tab = np.zeros((T, W_t), np.int32)
    for ti in range(T):
        t_shift = min(0, ti - wt) + max(0, ti + wt - (T - 1))
        t_max = min(T - 1, ti + wt - t_shift)
        for si in range(W_t):
            tj = ti + si
            tj_tab[ti, si] = tj if tj <= t_max else t_max - si
    # swap at step si: forward run just ended (search_flow_kernel.cu:69)
    swaps = np.zeros((T, W_t), bool)
    frame_pick = np.zeros((T, W_t), np.int32)  # frame index into f/b flow
    use_fwd = np.zeros((T, W_t), bool)
    for ti in range(T):
        t_shift = min(0, ti - wt) + max(0, ti + wt - (T - 1))
        t_max = min(T - 1, ti + wt - t_shift)
        for si in range(1, W_t):
            tj = int(tj_tab[ti, si])
            swaps[ti, si] = (ti + si - 1) == t_max
            use_fwd[ti, si] = tj > ti
            frame_pick[ti, si] = tj - 1 if tj > ti else tj + 1

    h_ref = (jnp.arange(nH, dtype=jnp.float32) * stride0)[None, None, :, None]
    w_ref = (jnp.arange(nW, dtype=jnp.float32) * stride0)[None, None, None, :]
    h_ref = jnp.broadcast_to(h_ref, (B, T, nH, nW)).astype(fflow.dtype)
    w_ref = jnp.broadcast_to(w_ref, (B, T, nH, nW)).astype(fflow.dtype)

    # per-step frame selection as a one-hot [T, T] matmul over the frame
    # axis (the picks are static tables; a take_along_axis on the 5-D
    # operand sends XLA-TPU down the scalarized gather path)
    sel = np.zeros((W_t - 1, T, T), np.float32)
    for si in range(1, W_t):
        for ti in range(T):
            sel[si - 1, ti, frame_pick[ti, si]] = 1.0
    ff2 = fflow.reshape(B, T, -1)
    bf2 = bflow.reshape(B, T, -1)

    def step(carry, si_arrs):
        h_curr, w_curr = carry
        swap, fwd, m_sel = si_arrs
        # reset the walk when wrapping from the forward run to backward
        sw = swap[None, :, None, None]
        h_curr = jnp.where(sw, h_ref, h_curr)
        w_curr = jnp.where(sw, w_ref, w_curr)
        # select per-ti flow frame: fflow[tj-1] forward, bflow[tj+1] backward
        ff = jnp.einsum("ij,bjc->bic", m_sel, ff2).reshape(fflow.shape)
        bf = jnp.einsum("ij,bjc->bic", m_sel, bf2).reshape(fflow.shape)
        flow = jnp.where(fwd[None, :, None, None, None], ff, bf)
        dW, dH = _sample_flow(flow, h_curr, w_curr, H, W)
        h_curr = h_curr + dH
        w_curr = w_curr + dW
        out = jnp.stack([w_curr - w_ref, h_curr - h_ref], axis=2)
        return (h_curr, w_curr), out

    si_arrs = (jnp.asarray(swaps[:, 1:].T), jnp.asarray(use_fwd[:, 1:].T),
               jnp.asarray(sel))
    (_, _), outs = jax.lax.scan(step, (h_ref, w_ref), si_arrs)
    # outs [W_t-1,B,T,2,nH,nW] -> [B,T,W_t-1,2,nH,nW]
    return jnp.moveaxis(outs, 0, 2)


def accumulate_flow(fflow, bflow, stride0=1):
    """All-pairs accumulated flows (nn/accumulate_flow.py:22-28):
    returns (pfflow, pbflow), each [B,T,T-1,2,nH,nW]; pfflow[:,ti,k] is the
    offset from frame ti to frame ti+k+1 (walk via fflow), pbflow[:,ti,k]
    to frame ti-k-1 (walk via bflow)."""
    B, T, _, H, W = fflow.shape
    nH, nW = num_queries(H, W, stride0)
    h_ref = (jnp.arange(nH, dtype=fflow.dtype) * stride0)[None, None, :, None]
    w_ref = (jnp.arange(nW, dtype=fflow.dtype) * stride0)[None, None, None, :]
    h_ref = jnp.broadcast_to(h_ref, (B, T, nH, nW))
    w_ref = jnp.broadcast_to(w_ref, (B, T, nH, nW))

    def walk(flow, direction):
        # frame to sample at step k, walking from ti: forward uses
        # fflow[ti+k], backward uses bflow[ti-k] (accumulate_flow_kernel.cu).
        picks = np.zeros((T - 1, T), np.int32)
        valid = np.zeros((T - 1, T), bool)
        for ti in range(T):
            for k in range(T - 1):
                tj = ti + direction * k
                ok = 0 <= ti + direction * (k + 1) < T
                picks[k, ti] = min(max(tj, 0), T - 1)
                valid[k, ti] = ok

        # static one-hot frame select (see search_flow note)
        sel = np.zeros((T - 1, T, T), np.float32)
        for k in range(T - 1):
            for ti in range(T):
                sel[k, ti, picks[k, ti]] = 1.0
        fl2 = flow.reshape(B, T, -1)

        def step(carry, arrs):
            h_curr, w_curr = carry
            m_sel, ok = arrs
            fl = jnp.einsum("ij,bjc->bic", m_sel, fl2).reshape(flow.shape)
            dW, dH = _sample_flow(fl, h_curr, w_curr, H, W)
            okb = ok[None, :, None, None]
            h_new = jnp.where(okb, h_curr + dH, h_curr)
            w_new = jnp.where(okb, w_curr + dW, w_curr)
            out = jnp.stack([w_new - w_ref, h_new - h_ref], axis=2)
            return (h_new, w_new), out

        arrs = (jnp.asarray(sel), jnp.asarray(valid))
        _, outs = jax.lax.scan(step, (h_ref, w_ref), arrs)
        return jnp.moveaxis(outs, 0, 2)  # [B,T,T-1,2,nH,nW]

    return walk(fflow, +1), walk(bflow, -1)


def extract_search_from_accumulated(pfflow, pbflow, wt, T):
    """Slice the W_t-1 search-window offsets out of the all-pairs volume
    (accumulate_flow.py:127-153)."""
    B = pfflow.shape[0]
    W_t = min(2 * wt + 1, T)
    outs = []
    for ti in range(T):
        t_shift = min(0, ti - wt) + max(0, ti + wt - (T - 1))
        t_max = min(T - 1, ti + wt - t_shift)
        slots = []
        for si in range(1, W_t):
            tj = ti + si
            tj = tj if tj <= t_max else t_max - si
            if tj > ti:
                slots.append(pfflow[:, ti, tj - ti - 1])
            else:
                slots.append(pbflow[:, ti, ti - tj - 1])
        outs.append(jnp.stack(slots, axis=1))
    return jnp.stack(outs, axis=1)  # [B,T,W_t-1,2,nH,nW]


def index_grid(T, nH, nW, dtype=jnp.float32):
    """Absolute (t,h,w) coordinate grid (accumulate_flow.py:218)."""
    t = jnp.arange(T, dtype=dtype)[:, None, None]
    h = jnp.arange(nH, dtype=dtype)[None, :, None]
    w = jnp.arange(nW, dtype=dtype)[None, None, :]
    grid = jnp.stack([jnp.broadcast_to(t, (T, nH, nW)),
                      jnp.broadcast_to(h, (T, nH, nW)),
                      jnp.broadcast_to(w, (T, nH, nW))], axis=0)
    return grid


def non_local_inds(fflow, bflow, ws, wt, stride0, stride1):
    """Absolute float (t,h,w) coordinates of the whole search grid
    (nn/non_local_inds.py:10-27 + non_local_inds_kernel.cu): the flow-shifted
    window centers expanded over the ws x ws lattice, no distances."""
    B, T, _, H, W = fflow.shape
    nH, nW = num_queries(H, W, stride0)
    W_t = min(2 * wt + 1, T)
    flows = search_flow(fflow, bflow, wt, stride0)  # [B,T,W_t-1,2,nH,nW]
    from stnls_tpu.ops.geometry import time_window_frames, search_offsets
    tj_tab = jnp.asarray(time_window_frames(T, wt))
    base_h = (jnp.arange(nH, dtype=fflow.dtype) * stride0)[None, None, :, None]
    base_w = (jnp.arange(nW, dtype=fflow.dtype) * stride0)[None, None, None, :]
    zero = jnp.zeros((B, T, 1, 2, nH, nW), flows.dtype)
    flows_full = jnp.concatenate([zero, flows], axis=2)
    ctr_h = reflect_bounds(base_h[:, :, None] + flows_full[:, :, :, 1], H)
    ctr_w = reflect_bounds(base_w[:, :, None] + flows_full[:, :, :, 0], W)
    off_h, off_w = search_offsets(ctr_h, ctr_w, float(stride1), ws, H, W,
                                  True, False)
    cells = jnp.arange(ws, dtype=fflow.dtype)
    # [B,T,W_t,ws,nH,nW]
    ph = ctr_h[:, :, :, None] + stride1 * (cells[:, None, None]
                                           - off_h[:, :, :, None])
    pw = ctr_w[:, :, :, None] + stride1 * (cells[:, None, None]
                                           - off_w[:, :, :, None])
    tj = jnp.broadcast_to(
        tj_tab[None, :, :, None, None, None, None].astype(fflow.dtype),
        (B, T, W_t, ws, ws, nH, nW))
    ph = jnp.broadcast_to(ph[:, :, :, :, None], (B, T, W_t, ws, ws, nH, nW))
    pw = jnp.broadcast_to(pw[:, :, :, None, :], (B, T, W_t, ws, ws, nH, nW))
    return jnp.stack([tj, ph, pw], axis=0)  # [3,B,T,W_t,ws,ws,nH,nW]
