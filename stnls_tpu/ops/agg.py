"""Aggregation cores: weighted non-local patch stacking / summing.

Reference ops covered (lib/stnls/agg/, lib/csrc/agg/):
  * nl_gather_stack   <- NonLocalGather  (gather_{int,bilin2d}_kernel.cu):
      stack[b,hd,k,t,:,ref_ij] += w[q,k] * vid[b,hd,nl_t,:,nl_ij]
      normalized by patch-overlap counts.
  * nl_gather_add     <- NonLocalGatherAdd (gather_add_kernel.cu):
      same accumulation collapsed over K into an output *video*.
  * nl_scatter_add    <- NonLocalScatterAdd (scatter_add_kernel.cu):
      transposed op: out[nl_ij] += w[q,k] * vid[ref_ij].
  * nl_pool           <- PooledPatchSum (pool_int_kernel.cu): patch sums on
      a ps-upsampled grid.

TPU design notes:
  * The CUDA kernels scatter with atomicAdd. Here the *reference-side*
    pixel coordinates are static affine functions of the query grid
    (ref_ij = nh*stride0 + patch offset), so every "scatter" to ref
    locations lowers to strided-slice `.at[...].add` updates — no scatter
    op, bitwise deterministic. Only the scatter_add family needs true
    dynamic scatters (`.at[].add`, deterministic on TPU).
  * Layout discipline (see ops/nls.py): the public API carries K and F on
    trailing axes, but TPU tiles pad any small minor axis to (8,128), so
    internally everything is K-major / channels-separate with the (nH,nW)
    spatial grid minor, and gathers run one channel at a time.

Gradients (vid, weights, and flow offsets in the float path) come from
jax.grad of these forwards, replacing gather_{int,bilin2d}_backward.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from stnls_tpu.ops.geometry import reflect_bounds, in_bounds, num_queries
from stnls_tpu.ops.pgather import patch_gather, pad_frames_cf


def _fold_count_1d(L, n, stride, d):
    """Static count of queries covering each position for one patch offset d:
    positions nh*stride + d for nh in [0,n) intersected with [0,L)."""
    c = np.zeros(L, np.float32)
    pos = np.arange(n) * stride + d
    ok = (pos >= 0) & (pos < L)
    c[pos[ok]] += 1
    return c


def patch_overlap_counts(H, W, ps, stride0, dilation=1, use_adj=False):
    """Static [H,W] overlap counts of the query patch fold (the gather
    kernels' `counts`, gather_int.cu:72-74). Separable."""
    patch_offset = 0 if use_adj else -(ps // 2)
    nH, nW = num_queries(H, W, stride0)
    ch = np.zeros(H, np.float32)
    cw = np.zeros(W, np.float32)
    for p in range(ps):
        d = dilation * (p + patch_offset)
        ch += _fold_count_1d(H, nH, stride0, d)
        cw += _fold_count_1d(W, nW, stride0, d)
    return ch[:, None] * cw[None, :]


def _valid_ref_slices(n, stride, d, L):
    """Query-index range [n0, n1) whose ref position nh*stride + d lies in
    [0, L), plus the matching strided image slice."""
    n0 = max(0, int(np.ceil(-d / stride)))
    n1 = min(n, (L - 1 - d) // stride + 1)
    n1 = max(n0, n1)
    return n0, n1, slice(n0 * stride + d, (n1 - 1) * stride + d + 1, stride)


def _km_centers(flows_km, ref_t, ref_h, ref_w, T, H, W, is_int):
    """Non-local patch centers, K-major: flows_km [B,HD,K,T,nH,nW,3]
    (component trailing on a tiny fixed axis is fine — it is consumed
    immediately). Returns (nl_t, nl_h, nl_w) each [B,HD,K,T,nH,nW],
    reflect-bounded (gather_int_kernel.cu:70-76)."""
    dt = flows_km[..., 0]
    dh = flows_km[..., 1]
    dw = flows_km[..., 2]
    t = ref_t[None, None, None, :, None, None]
    h = ref_h[None, None, None, None, :, None]
    w = ref_w[None, None, None, None, None, :]
    if is_int:
        nl_t = reflect_bounds(t + dt.astype(jnp.int32), T)
        nl_h = reflect_bounds(h + dh.astype(jnp.int32), H)
        nl_w = reflect_bounds(w + dw.astype(jnp.int32), W)
    else:
        nl_t = reflect_bounds(t + jnp.round(dt).astype(jnp.int32), T)
        nl_h = reflect_bounds(h.astype(dh.dtype) + dh, H)
        nl_w = reflect_bounds(w.astype(dw.dtype) + dw, W)
    return nl_t, nl_h, nl_w


def _km_inputs(weights, flows, B, HD, T, nH, nW, K):
    """Public trailing-K layout -> K-major internal layout."""
    w_km = jnp.transpose(weights.reshape(B, HD, T, nH, nW, K),
                         (0, 1, 5, 2, 3, 4))
    f_km = jnp.transpose(flows.reshape(B, HD, T, nH, nW, K, 3),
                         (0, 1, 5, 2, 3, 4, 6))
    return w_km, f_km


def _pix_corners(ph, pw, H, W, is_int):
    """Corner index/weight lists for a (possibly fractional) pixel read;
    coordinates [B,HD,K,T,nH,nW]."""
    if is_int:
        ok = in_bounds(ph, H) & in_bounds(pw, W)
        idx = jnp.clip(ph, 0, H - 1) * W + jnp.clip(pw, 0, W - 1)
        return [(jnp.where(ok, 1., 0.), idx)]
    ok = in_bounds(ph, H) & in_bounds(pw, W)
    h0 = jnp.floor(ph)
    w0 = jnp.floor(pw)
    corners = []
    for di in (0, 1):
        for dj in (0, 1):
            hc = h0 + di
            wc = w0 + dj
            wgt = (jnp.maximum(0., 1. - jnp.abs(hc - ph))
                   * jnp.maximum(0., 1. - jnp.abs(wc - pw)))
            wgt = jnp.where(in_bounds(hc, H) & in_bounds(wc, W), wgt, 0.)
            wgt = jnp.where(ok, wgt, 0.)
            idx = jnp.clip(hc, 0, H - 1).astype(jnp.int32) * W \
                + jnp.clip(wc, 0, W - 1).astype(jnp.int32)
            corners.append((wgt, idx))
    return corners


def _take1(chan, idx):
    """Per-channel gather: chan [B,HD,M], idx [B?,HD?,...] ->
    [B,HD,*idx.shape[2:]]."""
    B, HD = chan.shape[:2]
    tail = idx.shape[2:]
    n = int(np.prod(tail))
    idx2 = jnp.broadcast_to(idx, (B, HD) + tail).reshape(B, HD, n)
    return jnp.take_along_axis(chan, idx2, axis=2).reshape((B, HD) + tail)


def _patch_geometry(nl_h, nl_w, ps, dilation, patch_offset, pad, H, W,
                    is_int):
    """Patch-gather geometry shared by the gather ops: integer patch
    origin (top-left support pixel, padded coords), bilinear fractional
    parts (float path), and the support size S."""
    o_h = nl_h + dilation * patch_offset
    o_w = nl_w + dilation * patch_offset
    if is_int:
        S = dilation * (ps - 1) + 1
        oi = o_h.astype(jnp.int32) + pad
        oj = o_w.astype(jnp.int32) + pad
        fh = fw = None
    else:
        S = dilation * (ps - 1) + 2
        fi = jnp.floor(o_h)
        fj = jnp.floor(o_w)
        fh = o_h - fi
        fw = o_w - fj
        oi = fi.astype(jnp.int32) + pad
        oj = fj.astype(jnp.int32) + pad
    return oi, oj, fh, fw, S, o_h, o_w


def _patch_pixel(P, pi, pj, dilation, fh, fw, is_int, *, masks=None):
    """Read patch pixel (pi, pj) from the gathered support P
    [B,HD,C,S,S,*tail] -> [B,HD,C,*tail]; bilinear in the float path.
    masks: optional (ok, mh0, mh1, mw0, mw1) validity multipliers for
    reflect_bounds=False (each broadcastable to the tail)."""
    a, b = pi * dilation, pj * dilation
    if is_int:
        pv = P[:, :, :, a, b]
        if masks is not None:
            pv = pv * masks[0]
        return pv
    wh = (1. - fh, fh)
    ww = (1. - fw, fw)
    if masks is not None:
        ok, mh0, mh1, mw0, mw1 = masks
        wh = (wh[0] * mh0 * ok, wh[1] * mh1 * ok)
        ww = (ww[0] * mw0, ww[1] * mw1)
    pv = 0.
    for u in (0, 1):
        for v in (0, 1):
            pv = pv + (wh[u] * ww[v])[:, :, None] * P[:, :, :, a + u, b + v]
    return pv


def nl_gather_stack(vid, weights, flows, *, ps, stride0, pt=1, dilation=1,
                    reflect_bounds_=True, use_adj=False, itype="float",
                    channel_chunk=4):
    """NonLocalGather: weighted non-local patch stack.

    vid [B,HD,T,F,H,W]; weights [B,HD,T,nH,nW,K]; flows [B,HD,T,nH,nW,K,3]
    (relative offsets) -> stack [B,HD,K,T,F,H,W], count-normalized.

    TPU structure: ONE patch_gather per (channel chunk, pt) fetches the
    S x S integer support of every (k, query) from a reflect-padded frame
    (S = dilation*(ps-1)+1 int / +2 float); patch pixels then come from
    static slices of the support with per-query bilinear corner weights.
    Replaces gather_{int,bilin2d}_kernel.cu; the backward rides
    patch_gather's windowed-scatter VJP instead of atomicAdd.
    """
    B, HD, T, F, H, W = vid.shape
    K = flows.shape[-2]
    nH, nW = num_queries(H, W, stride0)
    is_int = (itype == "int")
    patch_offset = 0 if use_adj else -(ps // 2)
    if is_int and jnp.issubdtype(flows.dtype, jnp.floating):
        flows = jnp.round(flows)
    w_km, f_km = _km_inputs(weights, flows, B, HD, T, nH, nW, K)

    ref_t = jnp.arange(T, dtype=jnp.int32)
    ref_h = jnp.arange(nH, dtype=jnp.int32) * stride0
    ref_w = jnp.arange(nW, dtype=jnp.int32) * stride0
    nl_t, nl_h, nl_w = _km_centers(f_km, ref_t, ref_h, ref_w, T, H, W, is_int)

    pad = dilation * (ps - 1) + 2
    assert pad <= min(H, W) - 1, "frame too small for single-fold pad"
    vp, (Tp, Hp, Wp) = pad_frames_cf(vid, pad)
    oi, oj, fh, fw, S, o_h, o_w = _patch_geometry(
        nl_h, nl_w, ps, dilation, patch_offset, pad, H, W, is_int)

    def pixel_masks(pi, pj):
        if reflect_bounds_:
            return None
        a, b = pi * dilation, pj * dilation
        ok = (in_bounds(o_h + a, H) & in_bounds(o_w + b, W)).astype(vid.dtype)
        if is_int:
            return (ok,)
        mh = [in_bounds(oi - pad + a + u, H).astype(vid.dtype)
              for u in (0, 1)]
        mw = [in_bounds(oj - pad + b + v, W).astype(vid.dtype)
              for v in (0, 1)]
        return (ok, mh[0], mh[1], mw[0], mw[1])

    C = max(1, min(channel_chunk, F))
    while F % C:
        C -= 1
    nchunks = F // C
    vp_scan = jnp.moveaxis(vp.reshape(B, HD, nchunks, C, -1), 2, 0)

    def chunk_fn(v_c):
        stack_c = jnp.zeros((B, HD, C, K, T, H, W), vid.dtype)
        for pk in range(pt):
            tj = jnp.broadcast_to(reflect_bounds(nl_t + pk, T),
                                  (B, HD, K, T, nH, nW)).astype(jnp.int32)
            P = patch_gather(v_c, (tj, oi, oj), (S, Tp, Hp, Wp))
            for pi in range(ps):
                dHp = dilation * (pi + patch_offset)
                h0, h1, sh = _valid_ref_slices(nH, stride0, dHp, H)
                for pj in range(ps):
                    dWp = dilation * (pj + patch_offset)
                    w0, w1, sw = _valid_ref_slices(nW, stride0, dWp, W)
                    if h0 >= h1 or w0 >= w1:
                        continue
                    pv = _patch_pixel(P, pi, pj, dilation, fh, fw, is_int,
                                      masks=pixel_masks(pi, pj))
                    val = pv * w_km[:, :, None]  # [B,HD,C,K,T,nH,nW]
                    stack_c = stack_c.at[:, :, :, :, :, sh, sw].add(
                        val[..., h0:h1, w0:w1])
        return stack_c

    stacks = lax.map(jax.checkpoint(chunk_fn), vp_scan)
    # [nchunks,B,HD,C,K,T,H,W] -> [B,HD,K,T,F,H,W]
    stack = jnp.transpose(stacks, (1, 2, 4, 5, 0, 3, 6, 7)) \
        .reshape(B, HD, K, T, F, H, W)

    counts = jnp.asarray(
        patch_overlap_counts(H, W, ps, stride0, dilation, use_adj), vid.dtype)
    return stack / (counts + 1e-10)


def default_out_size(inH, inW, nH, nW, strideOut, outH=0, outW=0):
    """Output-size defaulting shared by gather_add/scatter_add
    (gather_add.py:66-72)."""
    if outH == 0 or outH is None:
        outH = strideOut * nH if strideOut == 1 else inH
    if outW == 0 or outW is None:
        outW = strideOut * nW if strideOut == 1 else inW
    return outH, outW


def nl_gather_add(vid, weights, flows, *, ps, strideIn, strideOut, pt=1,
                  dilation=1, reflect_bounds_=True, use_adj=False,
                  itype="float", outH=0, outW=0):
    """NonLocalGatherAdd (gather_add_kernel.cu:60-135): weighted patch sum
    directly into an output video [B,HD,T,F,outH,outW]. Queries read their K
    non-local patches from the strideIn grid of vid and write at the
    strideOut grid of the output; normalized by out-grid overlap counts."""
    B, HD, T, F, H, W = vid.shape
    K = flows.shape[-2]
    nH, nW = num_queries(H, W, strideIn)
    outH, outW = default_out_size(H, W, nH, nW, strideOut, outH, outW)
    is_int = (itype == "int")
    patch_offset = 0 if use_adj else -(ps // 2)
    if is_int and jnp.issubdtype(flows.dtype, jnp.floating):
        flows = jnp.round(flows)
    w_km, f_km = _km_inputs(weights, flows, B, HD, T, nH, nW, K)
    # drop the -1e8 "invalid" fill entries (gather_add_kernel.cu:71-73)
    finite = (jnp.abs(f_km[..., 1]) < 1e7) & (jnp.abs(f_km[..., 2]) < 1e7)
    w_km = jnp.where(finite, w_km, 0.)

    ref_t = jnp.arange(T, dtype=jnp.int32)
    in_h = jnp.arange(nH, dtype=jnp.int32) * strideIn
    in_w = jnp.arange(nW, dtype=jnp.int32) * strideIn
    nl_t, nl_h, nl_w = _km_centers(f_km, ref_t, in_h, in_w, T, H, W, is_int)

    pad = dilation * (ps - 1) + 2
    assert pad <= min(H, W) - 1, "frame too small for single-fold pad"
    vp, (Tp, Hp, Wp) = pad_frames_cf(vid, pad)
    oi, oj, fh, fw, S, o_h, o_w = _patch_geometry(
        nl_h, nl_w, ps, dilation, patch_offset, pad, H, W, is_int)

    def pixel_masks(pi, pj):
        if reflect_bounds_:
            return None
        a, b = pi * dilation, pj * dilation
        ok = (in_bounds(o_h + a, H) & in_bounds(o_w + b, W)).astype(vid.dtype)
        if is_int:
            return (ok,)
        mh = [in_bounds(oi - pad + a + u, H).astype(vid.dtype)
              for u in (0, 1)]
        mw = [in_bounds(oj - pad + b + v, W).astype(vid.dtype)
              for v in (0, 1)]
        return (ok, mh[0], mh[1], mw[0], mw[1])

    C = max(1, min(4, F))
    while F % C:
        C -= 1
    nchunks = F // C
    vp_scan = jnp.moveaxis(vp.reshape(B, HD, nchunks, C, -1), 2, 0)

    def chunk_fn(v_c):
        out_c = jnp.zeros((B, HD, C, T, outH, outW), vid.dtype)
        for pk in range(pt):
            tj = jnp.broadcast_to(reflect_bounds(nl_t + pk, T),
                                  (B, HD, K, T, nH, nW)).astype(jnp.int32)
            P = patch_gather(v_c, (tj, oi, oj), (S, Tp, Hp, Wp))
            for pi in range(ps):
                dHp = dilation * (pi + patch_offset)
                h0, h1, sh = _valid_ref_slices(nH, strideOut, dHp, outH)
                for pj in range(ps):
                    dWp = dilation * (pj + patch_offset)
                    w0, w1, sw = _valid_ref_slices(nW, strideOut, dWp, outW)
                    if h0 >= h1 or w0 >= w1:
                        continue
                    pv = _patch_pixel(P, pi, pj, dilation, fh, fw, is_int,
                                      masks=pixel_masks(pi, pj))
                    # sum over K while still K-major -> [B,HD,C,T,nH,nW]
                    val = jnp.sum(pv * w_km[:, :, None], axis=3)
                    out_c = out_c.at[:, :, :, :, sh, sw].add(
                        val[..., h0:h1, w0:w1])
        return out_c

    outs = lax.map(jax.checkpoint(chunk_fn), vp_scan)
    out = jnp.transpose(outs, (1, 2, 4, 0, 3, 5, 6)) \
        .reshape(B, HD, T, F, outH, outW)

    counts = jnp.asarray(
        patch_overlap_counts(outH, outW, ps, strideOut, dilation, use_adj),
        vid.dtype)
    return out / (counts + 1e-10)


def nl_scatter_add(vid, weights, flows, *, ps, strideIn, strideOut, pt=1,
                   dilation=1, reflect_bounds_=True, use_adj=False,
                   itype="float", outH=0, outW=0):
    """NonLocalScatterAdd (scatter_add_kernel.cu:62-140): transposed
    aggregation — each query patch (read on the strideIn grid of vid) is
    scattered, weighted, to its K non-local locations on the strideOut grid
    of the output. Returns (out [B,HD,T,F,outH,outW], counts [outH,outW]);
    the reference leaves the output *unnormalized* (scatter_add.py:105-107).

    Needs a true scatter; `.at[].add` keeps it deterministic (unlike the
    reference's atomicAdd)."""
    B, HD, T, F, H, W = vid.shape
    K = flows.shape[-2]
    nH, nW = num_queries(H, W, strideIn)
    outH, outW = default_out_size(H, W, nH, nW, strideOut, outH, outW)
    patch_offset = 0 if use_adj else -(ps // 2)
    if jnp.issubdtype(flows.dtype, jnp.floating):
        flows = jnp.round(flows)
    flows = flows.astype(jnp.int32)
    w_km, f_km = _km_inputs(weights, flows, B, HD, T, nH, nW, K)
    finite = (jnp.abs(f_km[..., 1]) < 1e7) & (jnp.abs(f_km[..., 2]) < 1e7)

    ref_t = jnp.arange(T, dtype=jnp.int32)
    in_h = jnp.arange(nH, dtype=jnp.int32) * strideIn
    in_w = jnp.arange(nW, dtype=jnp.int32) * strideIn
    out_h = jnp.arange(nH, dtype=jnp.int32) * strideOut
    out_w = jnp.arange(nW, dtype=jnp.int32) * strideOut
    # scatter destinations: strideOut grid + offsets, always reflected
    nl_t, nl_h, nl_w = _km_centers(f_km, ref_t, out_h, out_w, T, outH, outW,
                                   True)

    # rows-of-F layout: one gather/scatter moves a contiguous F-vector per
    # edge instead of F scalar ops (the old per-channel Python loop issued
    # F separate gathers+scatters per patch tap — pathological at scale)
    vid_rf = vid.reshape(B, HD, T, F, H * W).transpose(0, 1, 2, 4, 3) \
        .reshape(B, HD, T * H * W, F)
    out_rf = jnp.zeros((B, HD, T * outH * outW + 1, F), vid.dtype)
    cnt_flat = jnp.zeros(outH * outW + 1, vid.dtype)

    t_g = ref_t[None, None, None, :, None, None]
    h_g = in_h[None, None, None, None, :, None]
    w_g = in_w[None, None, None, None, None, :]
    bi = jnp.arange(B)[:, None, None]
    hi_ = jnp.arange(HD)[None, :, None]
    n = K * T * nH * nW
    for pk in range(pt):
        rt = t_g + pk  # ref time not reflected (scatter_add_kernel.cu:121)
        nt = reflect_bounds(nl_t + pk, T) if reflect_bounds_ else nl_t + pk
        tok = in_bounds(rt, T) & in_bounds(nt, T)
        for pi in range(ps):
            dHp = dilation * (pi + patch_offset)
            rh = h_g + dHp
            sh = nl_h + dHp
            if reflect_bounds_:
                sh = reflect_bounds(sh, outH)
            for pj in range(ps):
                dWp = dilation * (pj + patch_offset)
                rw = w_g + dWp
                sw = nl_w + dWp
                if reflect_bounds_:
                    sw = reflect_bounds(sw, outW)
                ok = (finite & in_bounds(rh, H) & in_bounds(rw, W)
                      & in_bounds(sh, outH) & in_bounds(sw, outW) & tok)
                ridx = (jnp.clip(rt, 0, T - 1) * H
                        + jnp.clip(rh, 0, H - 1)) * W + jnp.clip(rw, 0, W - 1)
                ridx = jnp.broadcast_to(ridx, (B, HD, K, T, nH, nW))
                sidx = (jnp.clip(nt, 0, T - 1) * outH
                        + jnp.clip(sh, 0, outH - 1)) * outW \
                    + jnp.clip(sw, 0, outW - 1)
                sidx = jnp.broadcast_to(sidx, (B, HD, K, T, nH, nW))
                sidx_f = jnp.where(jnp.broadcast_to(ok, sidx.shape), sidx,
                                   T * outH * outW).reshape(B, HD, n)
                pix = jnp.take_along_axis(
                    vid_rf, ridx.reshape(B, HD, n)[..., None], axis=2)
                val = jnp.where(ok.reshape(B, HD, n)[..., None],
                                pix * w_km.reshape(B, HD, n)[..., None], 0.)
                out_rf = out_rf.at[bi, hi_, sidx_f].add(val)
                # counts: b=0, hd=0, query frame 0, all k (kernel :110-112)
                if pk == 0:
                    cidx = (jnp.clip(sh, 0, outH - 1) * outW
                            + jnp.clip(sw, 0, outW - 1))
                    cidx = jnp.broadcast_to(cidx, (B, HD, K, T, nH, nW))
                    okb = jnp.broadcast_to(ok, cidx.shape)
                    cidx0 = jnp.where(okb[0, 0, :, 0], cidx[0, 0, :, 0],
                                      outH * outW)
                    cnt_flat = cnt_flat.at[cidx0.reshape(-1)].add(1.)

    out = out_rf[:, :, :-1, :].reshape(B, HD, T, outH, outW, F) \
        .transpose(0, 1, 2, 5, 3, 4)
    counts = cnt_flat[:-1].reshape(outH, outW)
    return out, counts


def nl_pool(vid, weights, flows, *, ps, stride0, pt=1, dilation=1,
            reflect_bounds_=True, use_adj=False):
    """PooledPatchSum (pool_int_kernel.cu:60-115): weighted patch sum onto a
    ps-upsampled grid (outH = ps*nH). Int path only, like the reference
    (pool.py:87-91 comments out bilin2d). Write positions are
    wref + psHalf + (pi + patch_offset) with psHalf=(ps-1)//2+1 and ps
    forced odd (pool.py:92), reproduced exactly. Weights below 1e-8 are
    skipped (kernel :95)."""
    B, HD, T, F, H, W = vid.shape
    K = flows.shape[-2]
    nH, nW = num_queries(H, W, stride0)
    ps = ps + (1 - ps % 2)
    psHalf = (ps - 1) // 2 + 1
    outH, outW = ps * nH, ps * nW
    patch_offset = 0 if use_adj else -(ps // 2)
    flows = jnp.round(flows).astype(jnp.int32) \
        if jnp.issubdtype(flows.dtype, jnp.floating) else flows.astype(jnp.int32)
    w_km, f_km = _km_inputs(weights, flows, B, HD, T, nH, nW, K)
    w_km = jnp.where(w_km < 1e-8, 0., w_km)

    ref_t = jnp.arange(T, dtype=jnp.int32)
    in_h = jnp.arange(nH, dtype=jnp.int32) * stride0
    in_w = jnp.arange(nW, dtype=jnp.int32) * stride0
    nl_t, nl_h, nl_w = _km_centers(f_km, ref_t, in_h, in_w, T, H, W, True)

    # rows-of-F layout (one gather moves a full F-vector per edge; no
    # per-channel Python loop)
    vid_rf = vid.reshape(B, HD, T, F, H * W).transpose(0, 1, 2, 4, 3) \
        .reshape(B, HD, T * H * W, F)
    n = K * T * nH * nW

    out = jnp.zeros((B, HD, T, F, outH, outW), vid.dtype)
    counts = np.zeros((outH, outW), np.float32)
    for pk in range(pt):
        nt = reflect_bounds(nl_t + pk, T)
        for pi in range(ps):
            dOut_h = psHalf + pi + patch_offset
            h0, h1, sh = _valid_ref_slices(nH, ps, dOut_h, outH)
            dHp = dilation * (pi + patch_offset)
            ph = nl_h + dHp
            if reflect_bounds_:
                ph = reflect_bounds(ph, H)
            for pj in range(ps):
                dOut_w = psHalf + pj + patch_offset
                w0, w1, sw = _valid_ref_slices(nW, ps, dOut_w, outW)
                if h0 >= h1 or w0 >= w1:
                    continue
                dWp = dilation * (pj + patch_offset)
                pw = nl_w + dWp
                if reflect_bounds_:
                    pw = reflect_bounds(pw, W)
                corners = _pix_corners(ph, pw, H, W, True)
                pix = 0.
                for wgt, idx in corners:
                    gi = jnp.broadcast_to(nt * (H * W) + idx,
                                          (B, HD, K, T, nH, nW))
                    pv = jnp.take_along_axis(
                        vid_rf, gi.reshape(B, HD, n)[..., None], axis=2)
                    wb = jnp.broadcast_to(wgt, (B, HD, K, T, nH, nW))
                    pix = pix + wb.reshape(B, HD, n)[..., None] * pv
                # pix [B,HD,n,F] -> weighted sum over K
                pix = pix.reshape(B, HD, K, T, nH, nW, F)
                val = jnp.moveaxis(jnp.sum(pix * w_km[..., None], axis=2),
                                   -1, 3)          # [B,HD,T,F,nH,nW]
                out = out.at[:, :, :, :, sh, sw].add(val[..., h0:h1, w0:w1])
                if pk == 0:
                    counts[sh, sw] += 1
    return out / (jnp.asarray(counts) + 1e-10)