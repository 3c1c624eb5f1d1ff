"""Video Non-Local Bayes denoising (reference lib/stnls/misc/vnlb.py —
shipped there as a partly non-functional sketch; this is a working
TPU-native equivalent of the documented pipeline).

Pipeline per step (classic VNLB, Arias & Morel):
  1. non-local search for K similar patches per query (flow-guided),
  2. group the patches, estimate a per-group Gaussian prior
     (mean + empirical covariance in YUV),
  3. Bayes shrinkage of the group (linear MMSE given noise sigma),
  4. aggregate the filtered patches back to the video (gather_add-style
     count-normalized fold).
"""

import numpy as np
import jax
import jax.numpy as jnp

from stnls_tpu.utils import config
from stnls_tpu.utils.color import rgb2yuv, yuv2rgb
from stnls_tpu.search.non_local_search import NonLocalSearch
from stnls_tpu.ops.geometry import reflect_bounds, in_bounds, num_queries
from stnls_tpu.ops.agg import patch_overlap_counts, _valid_ref_slices


def extract_config(cfg, restrict=True):
    pairs = {"sigma": 30., "ws": 7, "wt": 1, "ps": 5, "k": 10,
             "stride0": 2, "nsteps": 2}
    return config.extract_pairs(cfg, pairs, restrict=restrict)


def _gather_groups(vid, inds, ps, stride0):
    """Patch groups [B,T,nH,nW,K,ps*ps*C] at the searched offsets
    (int path, reflect-padded)."""
    B, T, C, H, W = vid.shape
    nH, nW = num_queries(H, W, stride0)
    K = inds.shape[-2]
    t = jnp.arange(T, dtype=jnp.int32)[None, :, None, None, None]
    h = (jnp.arange(nH, dtype=jnp.int32) * stride0)[None, None, :, None, None]
    w = (jnp.arange(nW, dtype=jnp.int32) * stride0)[None, None, None, :, None]
    ii = jnp.round(inds).astype(jnp.int32)
    nt = reflect_bounds(t + ii[:, 0, :, :, :, :, 0], T)
    nh = reflect_bounds(h + ii[:, 0, :, :, :, :, 1], H)
    nw = reflect_bounds(w + ii[:, 0, :, :, :, :, 2], W)
    off = -(ps // 2)
    vid_f = vid.reshape(B, T * H * W * C)
    pats = []
    for pi in range(ps):
        for pj in range(ps):
            ph = reflect_bounds(nh + pi + off, H)
            pw = reflect_bounds(nw + pj + off, W)
            for c in range(C):
                # vid layout [B,T,C,H,W] flattened over (T,C,H,W)
                idx = (nt * C + c) * H * W + ph * W + pw
                pats.append(jnp.take_along_axis(
                    vid_f, idx.reshape(B, -1), axis=1)
                    .reshape(B, T, nH, nW, K))
    return jnp.stack(pats, axis=-1)  # [B,T,nH,nW,K,ps*ps*C]


def _bayes_filter(groups, sigma):
    """Linear-MMSE shrinkage per group (groups [..., K, D])."""
    mean = jnp.mean(groups, axis=-2, keepdims=True)
    cent = groups - mean
    K = groups.shape[-2]
    cov = jnp.einsum("...kd,...ke->...de", cent, cent) / max(K - 1, 1)
    D = groups.shape[-1]
    s2 = (sigma / 255.) ** 2
    # eigen shrinkage: signal variance max(e - s2, 0), Wiener coefficient
    # lam/(lam + s2) per eigendirection (classic VNLB Bayes filter)
    evals, evecs = jnp.linalg.eigh(cov)
    lam = jnp.maximum(evals - s2, 0.)
    coeff = lam / (lam + s2 + 1e-10)  # [..., D]
    proj = jnp.einsum("...kd,...de->...ke", cent, evecs)
    proj = proj * coeff[..., None, :]
    filtered = mean + jnp.einsum("...ke,...de->...kd", proj, evecs)
    return filtered


def _fold_groups(filtered, inds, vshape, ps, stride0):
    """Count-normalized fold of *all K* filtered patches back to their
    non-local locations (deterministic scatter-add)."""
    B, T, C, H, W = vshape
    nH, nW = num_queries(H, W, stride0)
    K = filtered.shape[-2]
    pats = filtered.reshape(B, T, nH, nW, K, ps, ps, C)
    ii = jnp.round(inds[:, 0]).astype(jnp.int32)  # [B,T,nH,nW,K,3]
    t = jnp.arange(T, dtype=jnp.int32)[None, :, None, None, None]
    h = (jnp.arange(nH, dtype=jnp.int32) * stride0)[None, None, :, None, None]
    w = (jnp.arange(nW, dtype=jnp.int32) * stride0)[None, None, None, :, None]
    nt = reflect_bounds(t + ii[..., 0], T)
    nh = reflect_bounds(h + ii[..., 1], H)
    nw = reflect_bounds(w + ii[..., 2], W)
    off = -(ps // 2)
    out = jnp.zeros((B, C, T * H * W + 1), filtered.dtype)
    cnt = jnp.zeros((B, T * H * W + 1), filtered.dtype)
    bi = jnp.arange(B)[:, None]
    for pi in range(ps):
        ph = nh + pi + off
        for pj in range(ps):
            pw = nw + pj + off
            ok = in_bounds(ph, H) & in_bounds(pw, W)
            idx = (nt * H + jnp.clip(ph, 0, H - 1)) * W \
                + jnp.clip(pw, 0, W - 1)
            idx = jnp.where(ok, idx, T * H * W).reshape(B, -1)
            for c in range(C):
                out = out.at[:, c].set(out[:, c].at[bi, idx].add(
                    pats[..., pi, pj, c].reshape(B, -1)))
            cnt = cnt.at[bi, idx].add(1.)
    out = out[..., :-1].reshape(B, C, T, H, W).transpose(0, 2, 1, 3, 4)
    cnt = cnt[:, :-1].reshape(B, 1, T, H, W).transpose(0, 2, 1, 3, 4)
    return out / (cnt + 1e-10)


def run_vnlb(cfg, vid, flows=None):
    """vid [B,T,C,H,W] in [0,1] (+ optional fflow/bflow dict) -> denoised."""
    cfg = extract_config(cfg, restrict=False)
    vid_yuv = rgb2yuv(vid) if vid.shape[2] == 3 else vid
    search = NonLocalSearch(cfg.ws, cfg.wt, cfg.ps, cfg.k,
                            stride0=cfg.stride0, dist_type="l2",
                            self_action="anchor", itype="int")
    basic = vid_yuv
    for _ in range(cfg.nsteps):
        if flows is not None:
            dists, inds = search(basic, basic, flows.fflow, flows.bflow)
        else:
            dists, inds = search(basic, basic)
        groups = _gather_groups(basic, inds, cfg.ps, cfg.stride0)
        filtered = _bayes_filter(groups, cfg.sigma)
        basic = _fold_groups(filtered, inds, vid_yuv.shape, cfg.ps,
                             cfg.stride0)
    return yuv2rgb(basic) if vid.shape[2] == 3 else basic
