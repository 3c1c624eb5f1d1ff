"""SPMD execution of the search pipeline.

Two modes:
  * `shard_search` — (B, HD) sharding by annotation: the search volume is
    independent per (batch, head) (the CUDA kernels' blockIdx.y/z), so a
    NamedSharding on the inputs lets XLA partition everything with zero
    collectives in the forward pass.
  * `time_sharded_search` / `TimeShardedSearch` — context parallelism over
    the frame axis: each device holds T/n frames, `lax.ppermute` exchanges
    a 2*wt-frame halo with ring neighbors over ICI, and the chunked search
    volume (ops.nls.nls_search_volume_chunk) runs on local queries with
    globally-correct boundary-shifted time windows. jax.grad through the
    shard_map routes halo gradients back with the transposed ppermute.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P, NamedSharding
from jax import shard_map

from stnls_tpu.ops.nls import nls_search_volume_chunk, dist_type_select
from stnls_tpu.ops import anchor as anchor_ops
from stnls_tpu.ops import topk as topk_ops


def shard_search(search, mesh, data_axis="data", head_axis=None):
    """Wrap a NonLocalSearch-like module so inputs get (B, HD) shardings;
    XLA SPMD handles the rest (no collectives needed in forward)."""
    vid_sharding = NamedSharding(mesh, P(data_axis, head_axis))
    flow_sharding = NamedSharding(mesh, P(data_axis, head_axis))

    def run(vid0, vid1, flows):
        vid0 = jax.device_put(vid0, vid_sharding)
        vid1 = jax.device_put(vid1, vid_sharding)
        flows = jax.device_put(flows, flow_sharding)
        return search(vid0, vid1, flows)

    return run


def _halo_exchange(x, axis_name, halo):
    """Ring halo exchange along a time-sharded axis: returns x padded with
    `halo` frames from each ring neighbor on axis 2 (wrap-around content at
    the sequence ends is never read by the chunked search)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        pad = jnp.zeros_like(x[:, :, :halo])
        return jnp.concatenate([pad, x, pad], axis=2)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    left = lax.ppermute(x[:, :, -halo:], axis_name, fwd)
    right = lax.ppermute(x[:, :, :halo], axis_name, bwd)
    return jnp.concatenate([left, x, right], axis=2)


def halo_gather(gather, v6, weights, inds, wt, time_axis="time"):
    """Aggregation under temporal context parallelism WITHOUT
    all-gathering the value video: search inds are time-bounded
    (|dt| <= 2*wt from the boundary-shifted window, shared_kernel.cu
    analog ops/geometry.time_window_frames), so a 2*wt-frame ring halo of
    v suffices. Call inside shard_map with the T axis sharded on
    `time_axis`.

    gather:  NonLocalGather-like callable (vid, weights, inds) -> stack
    v6:      [B,HD,T_local,F,H,W] local value shard
    weights: [B,HD,T_local,nH,nW,K]
    inds:    [B,HD,T_local,nH,nW,K,3] relative (dt,dh,dw) offsets
    Returns the local stack [B,HD,K,T_local,F,H,W]. Per-device memory is
    O(T_local + 4*wt) frames instead of O(T_global)."""
    halo = 2 * wt
    Tl = weights.shape[2]
    if halo == 0:
        return gather(v6, weights, inds)
    v_h = _halo_exchange(v6, time_axis, halo)      # [B,HD,Tl+2h,...]
    Th = Tl + 2 * halo

    def pad_t(x):
        z = jnp.zeros(x.shape[:2] + (Th,) + x.shape[3:], x.dtype)
        return lax.dynamic_update_slice_in_dim(z, x, halo, axis=2)

    # halo-frame query rows carry zero weights and only write their own
    # (sliced-away) stack frames, so the crop below is exact
    stack = gather(v_h, pad_t(weights), pad_t(inds))
    return lax.slice_in_dim(stack, halo, halo + Tl, axis=3)


def time_sharded_search(vid0, vid1, flows, mesh, *, ws, wt, ps, k,
                        stride0=1, stride1=1, dist_type="l2",
                        self_action=None, itype="float", time_axis="time",
                        impl="auto", flow_budget=8, spread_budget=8,
                        **kw):
    """Full flow-shifted search with the T axis sharded over `time_axis`.

    vid0/vid1 [B,HD,T,F,H,W], flows [B,HDf,T,W_t-1,2,nH,nW]; T must divide
    the mesh axis size. Returns (dists [B,HD,T,nH,nW,K], inds [...,K,3])
    sharded the same way.

    impl="auto" routes each chunk through the fused Pallas kernel on TPU
    (query_t0/T_global chunk mode of ops.nls_pallas) when supported and
    k>0 with an anchor/None self_action; "pallas" forces it (interpret
    off-TPU), "lattice" forces the jnp engine.
    """
    import jax as _jax
    B, HD, T, F, H, W = vid0.shape
    n = mesh.shape[time_axis]
    assert T % n == 0, "T must divide the time-axis size"
    W_t = min(2 * wt + 1, T)
    halo = 2 * wt

    use_pallas = False
    if impl in ("auto", "pallas") and k > 0 \
            and self_action in (None, "anchor", "anchor_self"):
        from stnls_tpu.ops.nls_pallas import pallas_supported
        ok = pallas_supported(
            itype=itype, pt=1, stride1=stride1, reflect_bounds=True,
            ws=ws, ps=ps, dilation=1, off_Hq=0, off_Wq=0, H=H, W=W,
            stride0=stride0, strideQ=None) and stride0 == 1
        use_pallas = ok and (impl == "pallas"
                             or _jax.default_backend() == "tpu")
        if impl == "pallas":
            assert ok, "pallas impl unsupported for this config"

    def chunk_fn(v0, v1, fl):
        idx = lax.axis_index(time_axis)
        T_local = v0.shape[2]
        t0 = idx * T_local
        v0p = _halo_exchange(v0, time_axis, halo)
        v1p = _halo_exchange(v1, time_axis, halo)
        if use_pallas:
            from stnls_tpu.ops.nls_pallas import nls_pallas_volume
            from stnls_tpu.search.non_local_search import _pallas_topk_aux
            from stnls_tpu.utils.debug import emit_count_warning
            d_vol, aux, outl = nls_pallas_volume(
                v0p, v1p, fl, ws=ws, wt=wt, ps=ps, stride0=stride0,
                stride1=stride1, dist_type=dist_type, itype=itype,
                flow_budget=flow_budget, spread_budget=spread_budget,
                return_aux=True, query_t0=t0, T_global=T)
            emit_count_warning(
                jnp.sum(outl),
                "time_sharded_search pallas chunk: queries exceeded "
                "flow_budget/spread_budget and carry init-valued dists")
            return _pallas_topk_aux(d_vol, aux, self_action=self_action,
                                    k=k, dist_type=dist_type)
        dists, inds3 = nls_search_volume_chunk(
            v0p, v1p, fl, t0=t0, T_global=T, halo=halo, ws=ws, wt=wt,
            ps=ps, stride0=stride0, stride1=stride1, dist_type=dist_type,
            itype=itype, **kw)
        # local anchor + topk (purely per-query)
        Bl, HDl, Tl, G, wsl, _, nHl, nWl = dists.shape
        Q = Tl * nHl * nWl
        d = jnp.transpose(dists, (0, 1, 2, 6, 7, 3, 4, 5)) \
            .reshape(Bl, HDl, Q, -1)
        i3 = jnp.transpose(inds3, (0, 1, 2, 3, 7, 8, 4, 5, 6)) \
            .reshape(3, Bl, HDl, Q, -1)
        anchor_flag = (self_action is not None) and ("anchor" in self_action)
        if anchor_flag:
            d, i3, _ = anchor_ops.anchor_self(d, i3)
        _, descending, _ = dist_type_select(dist_type)
        d, i3 = topk_ops.topk(d, i3, k, descending, anchor=anchor_flag)
        d = d.reshape(Bl, HDl, Tl, nHl, nWl, -1)
        inds = jnp.moveaxis(i3.reshape(3, Bl, HDl, Tl, nHl, nWl, -1), 0, -1)
        return d, inds

    fn = shard_map(
        chunk_fn, mesh=mesh,
        in_specs=(P(None, None, time_axis), P(None, None, time_axis),
                  P(None, None, time_axis)),
        out_specs=(P(None, None, time_axis), P(None, None, time_axis)),
        check_vma=False)
    return fn(vid0, vid1, flows)


class TimeShardedSearch:
    """Module-style wrapper around time_sharded_search."""

    def __init__(self, mesh, ws, wt, ps=1, k=10, stride0=1, stride1=1,
                 dist_type="l2", self_action=None, itype="float",
                 time_axis="time"):
        self.mesh = mesh
        self.kw = dict(ws=ws, wt=wt, ps=ps, k=k, stride0=stride0,
                       stride1=stride1, dist_type=dist_type,
                       self_action=self_action, itype=itype,
                       time_axis=time_axis)

    def __call__(self, vid0, vid1, flows):
        return time_sharded_search(vid0, vid1, flows, self.mesh, **self.kw)

    forward = __call__
