"""Dense-shift aggregation core (TPU fast path for NonLocalGather).

The reference aggregates with one CUDA thread per (query, k) doing gathers
+ atomicAdd (lib/csrc/agg/gather_int_kernel.cu:49-92). Gathers/scatters
with per-element indices are the slowest thing XLA-TPU does (measured:
the windowed-scatter VJP path costs ~20 s fwd+bwd at the 128^2 bench
config). This module removes indexing entirely:

    stack[b,hd,k,t,:,x] = sum_p w_k(x-p) * vid[b,hd,nl_t,:,x-p+off_k(x-p)+p]

is re-expressed over a *bounded shift domain* z (|off| <= budget):

    stack[k,t,:,x] = sum_z vid_pad[t+zt,:,x+z] * Mtap_k,zt,z[x]
    Mtap = tapsum_p(shift_p(M)),   M_k,zt,z = w_k * D_k,zt * R_k,zh * C_k,zw

where D/R/C are separable one-hot factors of the (t,h,w) offset —
D = [dt==zt], R = sum_u wh_u * [floor(dh)+u == zh] (bilinear corner
weights wh fold in), C likewise for columns. Everything is dense
compare/FMA on the VPU; reflect-padded reads replace per-pixel reflection
(single fold). Offsets beyond the budget contribute nothing (they match
no one-hot); callers using search outputs know |off| <= flow + stride1 *
(ws-1), so exactness is a static knob like the search kernel's
flow_budget.

Differentiable in vid, weights AND flows (the bilinear factors carry the
flow gradient, matching gather_bilin2d_kernel.cu's grad_inds); gradients
come from jax.grad of this dense forward — deterministic, no atomics.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from stnls_tpu.ops.geometry import num_queries


def dense_agg_supported(*, ps, stride0, dilation, budget, H, W, pt,
                        reflect_bounds_):
    """Single-fold reflect pad must fit the frame."""
    if pt != 1 or not reflect_bounds_ or stride0 != 1:
        return False
    Eh = dilation * (ps - 1)
    pad = budget + 1 + Eh + 1
    return pad <= min(H, W) - 1


def _taps(ps, dilation, use_adj):
    patch_offset = 0 if use_adj else -(ps // 2)
    return [dilation * (p + patch_offset) for p in range(ps)]


def _tapsum_queries(M, taps, H, W):
    """Mtap[x] = sum_p M[x - p] over valid query positions: zero-pad M
    (queries only exist on the grid) and add shifted slices."""
    tmax, tmin = max(taps), min(taps)
    Mp = jnp.pad(M, ((0, 0),) * (M.ndim - 2)
                 + ((tmax, -tmin), (tmax, -tmin)))
    acc = None
    for a in taps:
        ya = Mp[..., tmax - a:tmax - a + H, :]
        for b in taps:
            v = ya[..., tmax - b:tmax - b + W]
            acc = v if acc is None else acc + v
    return acc


def nl_gather_stack_dense(vid, weights, flows, *, ps, stride0, wt_hint=None,
                          dilation=1, use_adj=False, itype="float",
                          budget=16):
    """NonLocalGather stack via dense shifts. vid [B,HD,T,F,H,W]; weights
    [B,HD,T,nH,nW,K]; flows [B,HD,T,nH,nW,K,3] relative (dt,dh,dw).
    Returns count-normalized stack [B,HD,K,T,F,H,W].

    Offsets with |dh| or |dw| > budget (or |dt| > T-1) contribute zero
    (cf. the search kernel's outlier semantics)."""
    B, HD, T, F, H, W = vid.shape
    K = flows.shape[-2]
    nH, nW = num_queries(H, W, stride0)
    assert stride0 == 1 and nH == H and nW == W
    is_int = (itype == "int")
    taps = _taps(ps, dilation, use_adj)
    Eh = dilation * (ps - 1)
    R = int(budget)
    padS = R + 1 + Eh + 1
    assert padS <= min(H, W) - 1, "frame too small for dense agg pad"

    # K-major offset fields [B,HD,K,T,H,W]. The reference reflects the
    # patch CENTER first and adds taps after (gather_int_kernel.cu:70-76),
    # so the one-hot runs on the *effective* offset nl - ref where
    # nl = reflect(ref + off); only the tap overhang reflects via padding.
    from stnls_tpu.ops.geometry import reflect_bounds
    f_km = jnp.transpose(flows, (0, 1, 5, 2, 3, 4, 6))
    w_km = jnp.transpose(weights, (0, 1, 5, 2, 3, 4)).astype(vid.dtype)
    r_t = jnp.arange(T, dtype=jnp.int32)[None, None, None, :, None, None]
    r_h = jnp.arange(H, dtype=jnp.int32)[None, None, None, None, :, None]
    r_w = jnp.arange(W, dtype=jnp.int32)[None, None, None, None, None, :]
    dt = reflect_bounds(r_t + jnp.round(f_km[..., 0]).astype(jnp.int32),
                        T) - r_t
    if is_int:
        dh0 = jnp.round(f_km[..., 1]).astype(jnp.int32)
        dw0 = jnp.round(f_km[..., 2]).astype(jnp.int32)
        dh = (reflect_bounds(r_h + dh0, H) - r_h).astype(vid.dtype)
        dw = (reflect_bounds(r_w + dw0, W) - r_w).astype(vid.dtype)
    else:
        dh = (reflect_bounds(r_h.astype(vid.dtype) + f_km[..., 1], H)
              - r_h).astype(vid.dtype)
        dw = (reflect_bounds(r_w.astype(vid.dtype) + f_km[..., 2], W)
              - r_w).astype(vid.dtype)
    fh = jnp.floor(dh)
    fw = jnp.floor(dw)
    th = dh - fh                     # bilinear fractions (0 on int path)
    tw = dw - fw
    fh = fh.astype(jnp.int32)
    fw = fw.astype(jnp.int32)

    # padded video: T reflect by T-1 (any |dt|<T folds once), spatial
    # reflect by padS. Rows-shifted reads become static slices.
    padT = max(T - 1, 1)
    vp = jnp.pad(vid, ((0, 0), (0, 0), (padT, padT), (0, 0),
                       (padS, padS), (padS, padS)), mode="reflect")

    Dz = 2 * (R + 1) + 1             # zh/zw in [-(R+1), R+1]
    zs = np.arange(-(R + 1), R + 2)

    # temporal slots actually reachable
    wt_max = T - 1 if wt_hint is None else min(wt_hint, T - 1)
    zts = [z for z in range(-wt_max, wt_max + 1)]

    out = jnp.zeros((B, HD, K, T, F, H, W), vid.dtype)

    def zh_body(out, ih, *, A, vt):
        zh = zs[0] + ih
        if is_int:
            Rf = A * (fh == zh).astype(vid.dtype)
        else:
            Rf = A * ((fh == zh).astype(vid.dtype) * (1. - th)
                      + (fh == zh - 1).astype(vid.dtype) * th)
        vrow = lax.dynamic_slice_in_dim(vt, padS + zh, H, axis=4)
        for iw, zw in enumerate(zs):
            if is_int:
                M = Rf * (fw == zw).astype(vid.dtype)
            else:
                M = Rf * ((fw == zw).astype(vid.dtype) * (1. - tw)
                          + (fw == zw - 1).astype(vid.dtype) * tw)
            Mt = _tapsum_queries(M, taps, H, W)      # [B,HD,K,T,H,W]
            vz = lax.dynamic_slice_in_dim(vrow, padS + zw, W, axis=5)
            out = out + Mt[:, :, :, :, None] * vz[:, :, None]
        return out, None

    for zt in zts:
        D = (dt == zt).astype(vid.dtype)
        A = w_km * D                                # [B,HD,K,T,H,W]
        vt = lax.dynamic_slice_in_dim(vp, padT + zt, T, axis=2)
        body = functools.partial(zh_body, A=A, vt=vt)
        out, _ = lax.scan(jax.checkpoint(body), out,
                          jnp.arange(Dz, dtype=jnp.int32))

    from stnls_tpu.ops.agg import patch_overlap_counts
    counts = jnp.asarray(
        patch_overlap_counts(H, W, ps, stride0, dilation, use_adj),
        vid.dtype)
    return out / (counts + 1e-10)
