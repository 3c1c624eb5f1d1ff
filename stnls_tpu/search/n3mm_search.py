"""N3MatMultSearch: matmul-based reference search (reference
lib/stnls/search/n3mm_search.py, adapted there from N3Net's indexed batched
matmul, csrc/search/mat_mult1_kernel.cu:1-5 attribution).

Builds the full patch database of both videos, computes the absolute search
grid with stnls_tpu.nn.non_local_inds, and evaluates distances via indexed
batched products — pure jnp gather + einsum (the reference's custom matmul
kernel is exactly XLA's bread and butter, SURVEY item #6). Serves as the
cross-implementation oracle for NonLocalSearch, like the reference's tests
(tests/search/test_non_local_search_int.py:51-133).
"""

from functools import partial

import jax
import jax.numpy as jnp

from stnls_tpu.utils.config import extract_pairs
from stnls_tpu.ops.geometry import reflect_bounds, in_bounds, num_queries
from stnls_tpu.ops.nls import dist_type_select
from stnls_tpu.ops import topk as topk_ops
from stnls_tpu.nn.non_local_inds import non_local_inds
from stnls_tpu.search.utils import shape_vids


def vid2patches(vid, nheads, stride, ps, dilation=1, reflect_bounds=True):
    """[B,T,(HD F),H,W] -> [(B HD), Q, ps*ps*F] patch database (reference
    impl/n3mm_utils.py vid2patches)."""
    B, T, C, H, W = vid.shape
    F = C // nheads
    vid6 = vid.reshape(B, T, nheads, F, H, W).transpose(0, 2, 1, 3, 4, 5)
    nH, nW = num_queries(H, W, stride)
    hs = jnp.arange(nH) * stride
    ws_ = jnp.arange(nW) * stride
    off = -(ps // 2)
    pats = []
    for pi in range(ps):
        for pj in range(ps):
            h = hs + pi + off
            w = ws_ + pj + off
            if reflect_bounds:
                h, w = reflect_bounds_pair(h, H), reflect_bounds_pair(w, W)
            ok = (in_bounds(h, H)[:, None] & in_bounds(w, W)[None, :])
            hc = jnp.clip(h, 0, H - 1)
            wc = jnp.clip(w, 0, W - 1)
            p = vid6[:, :, :, :, hc][:, :, :, :, :, wc]  # [B,HD,T,F,nH,nW]
            p = jnp.where(ok[None, None, None, None], p, 0.)
            pats.append(p)
    # [B,HD,T,F,nH,nW] x ps2 -> [(B HD), T*nH*nW, ps2*F]
    pat = jnp.stack(pats, axis=3)  # [B,HD,T,ps2,F,nH,nW]
    B_, HD, T_, P2, F_, nH_, nW_ = pat.shape
    pat = jnp.transpose(pat, (0, 1, 2, 5, 6, 3, 4)) \
        .reshape(B_ * HD, T_ * nH_ * nW_, P2 * F_)
    return pat


def reflect_bounds_pair(v, L):
    return reflect_bounds(v, L)


def _n3mm_fwd(vid0, vid1, fflow, bflow, cfg):
    nheads = cfg["nheads"]
    ws, wt, ps = cfg["ws"], cfg["wt"], cfg["ps"]
    stride0, stride1 = cfg["stride0"], cfg["stride1"]
    B, T, C, H, W = vid0.shape
    nH0, nW0 = num_queries(H, W, stride0)
    Q = T * nH0 * nW0

    # absolute float coords of the search grid -> int raster on stride1 grid
    inds = non_local_inds(fflow, bflow, ws, wt, stride0, stride1)
    inds = jnp.round(inds).astype(jnp.int32)  # [B,T,nH,nW,L,3]
    inds = inds.reshape(B, Q, -1, 3)
    L = inds.shape[2]

    pat0 = vid2patches(vid0, nheads, stride0, ps, cfg["dilation"],
                       cfg["reflect_bounds"])  # [(B HD), Q, E]
    pat1 = vid2patches(vid1, nheads, int(max(1, stride1)), ps,
                       cfg["dilation"], cfg["reflect_bounds"])

    nH1, nW1 = num_queries(H, W, int(max(1, stride1)))
    r = (inds[..., 0] * nH1 + inds[..., 1] // int(max(1, stride1))) * nW1 \
        + inds[..., 2] // int(max(1, stride1))  # [B,Q,L]
    r = jnp.repeat(r, nheads, axis=0)  # [(B HD), Q, L]

    # indexed batched product: prods[b,q,l] = <pat0[b,q], pat1[b, r[b,q,l]]>
    E = pat0.shape[-1]
    p1 = jnp.take_along_axis(pat1[:, :, None], r.reshape(r.shape[0], -1)
                             [:, :, None, None], axis=1)
    p1 = p1.reshape(r.shape[0], Q, L, E)
    prods = jnp.einsum("bqe,bqle->bql", pat0, p1)

    if cfg["dist_type"] == "prod":
        dists = prods
    else:
        n0 = jnp.sum(pat0 ** 2, -1)[..., None]
        n1 = jnp.sum(p1 ** 2, -1)
        dists = n0 + n1 - 2 * prods

    dists = dists.reshape(B, nheads, Q, L)
    # relative offsets from the absolute grid (reference returns absolute
    # inds; tests convert with utils.misc.inds2flow)
    inds = jnp.repeat(inds[:, None], nheads, axis=1)
    _, descending, _ = dist_type_select(cfg["dist_type"])
    if cfg["k"] > 0:
        i3 = jnp.moveaxis(inds, -1, 0)
        dists, i3 = topk_ops.topk(dists, i3, cfg["k"], descending)
        inds = jnp.moveaxis(i3, 0, -1)
    nH, nW = num_queries(H, W, stride0)
    dists = dists.reshape(B, nheads, T, nH, nW, -1)
    inds = inds.reshape(B, nheads, T, nH, nW, -1, 3)
    return dists, inds


class N3MatMultSearch:

    def __init__(self, ws, wt, ps=1, k=-1, nheads=1, dist_type="l2",
                 stride0=1, stride1=1, dilation=1, pt=1,
                 reflect_bounds=True, full_ws=True, use_adj=False,
                 itype="int"):
        self.cfg = dict(ws=ws, wt=wt, ps=ps, k=k, nheads=nheads,
                        dist_type=dist_type, stride0=stride0,
                        stride1=stride1, dilation=dilation, pt=pt,
                        reflect_bounds=reflect_bounds, full_ws=full_ws,
                        use_adj=use_adj, itype=itype)
        for key, val in self.cfg.items():
            setattr(self, key, val)
        self._fn = jax.jit(partial(_n3mm_fwd, cfg=dict(self.cfg)))

    def __call__(self, vid0, vid1, fflow=None, bflow=None):
        B, T, C, H, W = vid0.shape
        if fflow is None:
            fflow = jnp.zeros((B, T, 2, H, W), vid0.dtype)
        if bflow is None:
            bflow = jnp.zeros((B, T, 2, H, W), vid0.dtype)
        return self._fn(vid0, vid1, fflow, bflow)

    forward = __call__

    def flops(self, T, F, H, W):
        nrefs = T * ((H - 1) // self.stride0 + 1) * ((W - 1) // self.stride0 + 1)
        nsearch = self.ws * self.ws * (2 * self.wt + 1)
        return nrefs * nsearch * 2 * F * self.ps * self.ps


def extract_config(cfg, restrict=True):
    pairs = {"ws": -1, "wt": -1, "ps": 1, "k": -1,
             "nheads": 1, "dist_type": "l2",
             "stride0": 1, "stride1": 1, "dilation": 1, "pt": 1,
             "reflect_bounds": True, "full_ws": True,
             "use_adj": False, "itype": "int"}
    return extract_pairs(cfg, pairs, restrict=restrict)


def init(cfg):
    cfg = extract_config(cfg, False)
    return N3MatMultSearch(cfg.ws, cfg.wt, cfg.ps, cfg.k, cfg.nheads,
                           cfg.dist_type, cfg.stride0, cfg.stride1,
                           cfg.dilation, cfg.pt, cfg.reflect_bounds,
                           cfg.full_ws, cfg.use_adj, cfg.itype)
