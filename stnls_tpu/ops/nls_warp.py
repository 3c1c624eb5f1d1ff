"""Warp-decomposition non-local search forward (fast path).

Same semantics as ops.nls.nls_search_volume's float/bilin2d path, computed
as:

  1. per (query, time-slot): region origin o(q) = center(q) - stride1 *
     wsOff(q) + dilation*patch_offset — the top-left of the union of all
     candidate patches of that query's window;
  2. an R x R stack of whole-frame *warps*: REG[a,b](q) =
     bilinear(vid1[tj], reflect(o(q) + step*(a,b))) — R^2 dense gathers
     over the frame replace the lattice engine's ws^2*ps^2 per-cell
     per-pixel gathers (patches overlap between window cells, so candidate
     pixels are shared: ~30x fewer reads at the reference's benchmark
     config ws=21, ps=7, stride1=1, bench/search.py);
  3. local correlation by *static strided slicing* of the warp stack:
     dist[:, wsi, wsj] += f(P0[pi,pj], REG[wsi*s+pi*p, wsj*s+pj*p]) for the
     ps^2 patch pixels — dense VPU multiply-reduce, no gathers, no
     scatters.

Constraints (asserted): itype == "float", pt == 1, and stride1 integral or
1/stride1 integral (uniform sample step).
"""

import numpy as np
import jax
import jax.numpy as jnp

from stnls_tpu.ops.geometry import (
    reflect_bounds, in_bounds, num_queries, time_window_frames, search_offsets,
)
from stnls_tpu.ops.nls import dist_type_select, _expand_flow_heads


def warp_path_supported(*, itype, pt, stride1, dilation):
    if itype != "float" or pt != 1:
        return False
    s1 = float(stride1)
    if s1 <= 0:
        return False
    if s1.is_integer():
        return True
    inv = 1.0 / s1
    return abs(inv - round(inv)) < 1e-6


def nls_warp_volume(vid0, vid1, flows, *, ws, wt, ps, stride0, stride1,
                    dist_type="l2", dilation=1, reflect_bounds_=True,
                    full_ws=True, use_adj=False, off_Hq=0, off_Wq=0):
    """Returns (dists [B,HD,T,W_t,ws,ws,nH,nW], inds3 [3, ...]) matching
    nls_search_volume's float path."""
    B, HD, T, F, qH, qW = vid0.shape
    kH, kW = vid1.shape[-2:]
    patch_offset = 0 if use_adj else -(ps // 2)
    W_t = min(2 * wt + 1, T)
    nH, nW = num_queries(kH, kW, stride0)
    st_offset = W_t - flows.shape[3]
    assert st_offset in (0, 1)
    stride1 = float(stride1)
    step = stride1 if not stride1.is_integer() else 1.0
    s1s = int(round(stride1 / step))    # window-lattice spacing in steps
    pxs = int(round(dilation / step))   # patch-pixel spacing in steps
    R = (ws - 1) * s1s + (ps - 1) * pxs + 1
    dtype = vid0.dtype

    # -- query grids (float path: ref == anchor, stride0 grid) --
    ref_h = (jnp.arange(nH, dtype=jnp.int32) * stride0) % qH
    ref_w = (jnp.arange(nW, dtype=jnp.int32) * stride0) % qW
    t_ids = jnp.arange(T, dtype=jnp.int32)
    tj_tab = jnp.asarray(time_window_frames(T, wt))  # [T, W_t]

    # -- centers + window offsets (slice components before concat:
    #    ops/nls.py axon workaround note) --
    flows = _expand_flow_heads(flows, HD)
    base_h = ref_h[None, None, None, None, :, None].astype(dtype)
    base_w = ref_w[None, None, None, None, None, :].astype(dtype)
    fH = flows[:, :, :, :, 1]
    fW = flows[:, :, :, :, 0]
    if st_offset == 1:
        zshape = fH.shape[:3] + (1,) + fH.shape[4:]
        zero = jnp.zeros(zshape, fH.dtype)
        fH = jnp.concatenate([zero, fH], axis=3)
        fW = jnp.concatenate([zero, fW], axis=3)
    ctr_h = reflect_bounds(base_h + fH, kH)   # [B,HD,T,W_t,nH,nW]
    ctr_w = reflect_bounds(base_w + fW, kW)
    off_h, off_w = search_offsets(ctr_h, ctr_w, stride1, ws, kH, kW,
                                  full_ws, False)
    o_h = ctr_h - stride1 * off_h + dilation * patch_offset
    o_w = ctr_w - stride1 * off_w + dilation * patch_offset

    # -- per-cell lattice positions + validity --
    cells = jnp.arange(ws, dtype=dtype)
    prop_h = ctr_h[:, :, :, :, None] + stride1 * (cells[:, None, None]
                                                  - off_h[:, :, :, :, None])
    prop_w = ctr_w[:, :, :, :, None] + stride1 * (cells[:, None, None]
                                                  - off_w[:, :, :, :, None])
    # [B,HD,T,W_t,ws,ws,nH,nW]
    valid_patch = (in_bounds(prop_h, kH)[:, :, :, :, :, None] &
                   in_bounds(prop_w, kW)[:, :, :, :, None, :])

    # -- frame-flattened vid1 for warps --
    v1_cf = vid1.reshape(B, HD, T, F, kH * kW).transpose(0, 1, 3, 2, 4) \
        .reshape(B, HD, F, T * kH * kW)
    ptj = reflect_bounds(tj_tab[None, None, :, :, None, None], T)

    def take1(chan, idx):
        tail = idx.shape[2:]
        n = int(np.prod(tail))
        idx2 = jnp.broadcast_to(idx, (B, HD) + tail).reshape(B, HD, n)
        return jnp.take_along_axis(chan, idx2, axis=2).reshape((B, HD) + tail)

    wspan = s1s * (ws - 1) + 1

    def per_channel(v0_f, v1_f, o_h, o_w):
        """Warp stack + correlation for one channel. Wrapped in
        jax.checkpoint: the backward recomputes the R^2 warps and the
        ps^2 correlation slices from the (frame-sized) inputs instead of
        storing ~ps^2 search-volume-sized residuals, which OOMs HBM."""
        # -- corners + warp stack --
        reg_rows, ok_rows = [], []
        for a in range(R):
            ph = o_h + a * step
            if reflect_bounds_:
                ph = reflect_bounds(ph, kH)
            vh = in_bounds(ph, kH)
            h0 = jnp.floor(ph)
            row, okr = [], []
            for b in range(R):
                pw = o_w + b * step
                if reflect_bounds_:
                    pw = reflect_bounds(pw, kW)
                ok = vh & in_bounds(pw, kW)
                w0 = jnp.floor(pw)
                reg = 0.
                for di in (0, 1):
                    for dj in (0, 1):
                        hc = h0 + di
                        wc = w0 + dj
                        wgt = (jnp.maximum(0., 1. - jnp.abs(hc - ph))
                               * jnp.maximum(0., 1. - jnp.abs(wc - pw)))
                        wgt = jnp.where(
                            in_bounds(hc, kH) & in_bounds(wc, kW), wgt, 0.)
                        wgt = jnp.where(ok, wgt, 0.)
                        idx = (ptj * kH + jnp.clip(hc, 0, kH - 1)
                               .astype(jnp.int32)) * kW \
                            + jnp.clip(wc, 0, kW - 1).astype(jnp.int32)
                        reg = reg + wgt * take1(v1_f, idx)
                row.append(reg)
                okr.append(ok)
            reg_rows.append(jnp.stack(row, 0))
            ok_rows.append(jnp.stack(okr, 0))
        REG = jnp.stack(reg_rows, 0)    # [R,R,B,HD,T,W_t,nH,nW]
        vmask = jnp.stack(ok_rows, 0)   # [R,R,B,HD,T,W_t,nH,nW] bool

        # -- correlation by static strided slicing --
        acc = jnp.zeros((B, HD, T, W_t, ws, ws, nH, nW), dtype)
        for pi in range(ps):
            rh = ref_h + off_Hq + dilation * (pi + patch_offset)
            if reflect_bounds_:
                rh = reflect_bounds(rh, qH)
            ok_h = in_bounds(rh, qH)
            a0 = pi * pxs
            for pj in range(ps):
                rw = ref_w + off_Wq + dilation * (pj + patch_offset)
                if reflect_bounds_:
                    rw = reflect_bounds(rw, qW)
                ok0 = ok_h[:, None] & in_bounds(rw, qW)[None, :]
                p0 = v0_f[:, :, :, jnp.clip(rh, 0, qH - 1)][
                    :, :, :, :, jnp.clip(rw, 0, qW - 1)]
                # fold the vid0-side validity into p0 itself
                p0 = jnp.where(ok0[None, None, None], p0, 0.)
                p0 = p0[:, :, :, None, None, None]  # [B,HD,T,1,1,1,nH,nW]
                b0 = pj * pxs
                reg = REG[a0:a0 + wspan:s1s, b0:b0 + wspan:s1s]
                reg = jnp.moveaxis(reg, (0, 1), (4, 5))
                # reg [B,HD,T,W_t,ws,ws,nH,nW]; invalid warp samples are
                # already zero (corner weights were masked).
                if dist_type == "prod":
                    # pair-skip: p0==0 or reg==0 at invalid -> term 0
                    acc = acc + p0 * reg
                else:
                    # expanded l2 so the backward needs no (p0-reg)
                    # residual per patch pixel:
                    #   valid pair:  (p0-reg)^2 = p0^2 - 2 p0 reg + reg^2
                    #   invalid warp sample (vm=0): contribute 0
                    #   invalid query pixel (p0 masked to 0): contribute 0
                    vm = jnp.moveaxis(
                        vmask[a0:a0 + wspan:s1s, b0:b0 + wspan:s1s],
                        (0, 1), (4, 5)).astype(dtype)
                    ok0f = ok0.astype(dtype)[None, None, None, None, None,
                                             None]
                    acc = acc + (vm * (p0 * p0) - 2. * (p0 * reg)
                                 + ok0f * (reg * reg))
        return acc

    per_channel = jax.checkpoint(per_channel)

    # scan over channels: the backward then holds one channel's warp-stack
    # cotangent at a time instead of F of them.
    v0_scan = jnp.moveaxis(vid0, 3, 0)          # [F,B,HD,T,qH,qW]
    v1_scan = jnp.moveaxis(v1_cf, 2, 0)         # [F,B,HD,M]

    def body(acc, xs):
        v0_f, v1_f = xs
        return acc + per_channel(v0_f, v1_f, o_h, o_w), None

    acc0 = jnp.zeros((B, HD, T, W_t, ws, ws, nH, nW), dtype)
    dists, _ = jax.lax.scan(body, acc0, (v0_scan, v1_scan))

    _, _, init_val = dist_type_select(dist_type)
    dists = jnp.where(valid_patch, dists, jnp.asarray(init_val, dtype))

    # -- offsets --
    dt = (tj_tab - t_ids[:, None]).astype(dtype)
    dh = (prop_h - base_h[:, :, :, :, None].astype(dtype))[:, :, :, :, :, None]
    dw = (prop_w - base_w[:, :, :, :, None].astype(dtype))[:, :, :, :, None, :]
    shape8 = dists.shape
    inds3 = jnp.stack([
        jnp.broadcast_to(dt[None, None, :, :, None, None, None, None], shape8),
        jnp.broadcast_to(dh, shape8),
        jnp.broadcast_to(dw, shape8),
    ], axis=0).astype(dtype)
    return dists, inds3
