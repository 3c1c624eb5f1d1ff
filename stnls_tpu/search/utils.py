"""Shared search-layer helpers (reference lib/stnls/search/utils.py)."""

import jax.numpy as jnp

from stnls_tpu.ops.nls import dist_type_select  # re-export  # noqa: F401


def shape_vids(nheads, vids):
    """[B,T,(HD F),H,W] -> [B,HD,T,F,H,W] (reference shape_vids:178-190)."""
    out = []
    for vid in vids:
        assert vid.ndim in (5, 6), "vid must be 5 or 6 dims"
        if vid.ndim == 5:
            B, T, C, H, W = vid.shape
            assert C % nheads == 0, "channels must divide nheads"
            vid = vid.reshape(B, T, nheads, C // nheads, H, W)
            vid = jnp.transpose(vid, (0, 2, 1, 3, 4, 5))
        assert vid.shape[1] == nheads or nheads == 1
        out.append(vid)
    return out


def unshape_vid(vid):
    """[B,HD,T,F,H,W] -> [B,T,(HD F),H,W]."""
    B, HD, T, F, H, W = vid.shape
    return jnp.transpose(vid, (0, 2, 1, 3, 4, 5)).reshape(B, T, HD * F, H, W)


def shape_flows(nheads, flows):
    """Add the head dim if missing: [B,T,W_t,2,nH,nW] -> [B,1,T,W_t,2,nH,nW]."""
    if flows.ndim == 7:
        return flows
    if flows.ndim == 6:
        return flows[:, None]
    raise ValueError(f"flows must be 6 or 7 dims, got {flows.ndim}")


def ensure_flow_shape(flow):
    if flow.ndim == 5:
        B, T, _, H, W = flow.shape
        flow = flow.reshape(B, 1, T, 2, H, W)
    return flow


def empty_flows(vid, wt, stride0, nheads=1):
    """All-zero flow volume for the 2-arg search call."""
    B = vid.shape[0]
    H, W = vid.shape[-2:]
    T = vid.shape[2] if vid.ndim == 6 else vid.shape[1]
    W_t = min(2 * wt + 1, T)
    nH = (H - 1) // stride0 + 1
    nW = (W - 1) // stride0 + 1
    return jnp.zeros((B, nheads, T, W_t - 1, 2, nH, nW), jnp.float32)


def empty_flow(vid):
    """Zero flow [B,T,2,H,W] for a [B,T,C,H,W] video (reference
    search/utils.py:208)."""
    B, T = vid.shape[:2]
    H, W = vid.shape[-2:]
    return jnp.zeros((B, T, 2, H, W), vid.dtype)


def search_wrap(name, search):
    """Uniform-signature wrapper over any search flavor (reference
    search/utils.py:283): every call takes
    (vid0, vid1, fflow, bflow, inds, afflow, abflow)."""
    if "refine" in name:
        def wrap(vid0, vid1, fflow, bflow, inds, afflow, abflow):
            return search(vid0, vid1, inds)
        return wrap
    if "pf" in name:
        def wrap(vid0, vid1, fflow, bflow, inds, afflow, abflow):
            return search(vid0, vid1, afflow, abflow)
        return wrap

    def wrap(vid0, vid1, fflow, bflow, inds, afflow, abflow):
        return search(vid0, vid1, fflow, bflow)
    return wrap


def filter_k(inds, kr, k=None):
    """Keep the first Ks of K given a ratio/count kr (reference :115-126)."""
    K = inds.shape[-2] if k is None else k
    kr = K if kr is None else kr
    if kr <= 0:
        return inds
    if isinstance(kr, float):
        assert 0 < kr <= 1
        Ks = int(K * kr)
    else:
        Ks = int(kr)
    return inds[..., :Ks, :]


def get_time_window_inds(ti, wt, T):
    """Python mirror of the boundary-shifted time window (reference :311-331)."""
    t_shift = min(0, ti - wt) + max(0, ti + wt - (T - 1))
    t_max = min(T - 1, ti + wt - t_shift)
    inds = []
    for st in range(2 * wt + 1):
        tj = ti + st
        inds.append(tj if tj <= t_max else t_max - st)
    return inds


def paired_vids(forward, vid0, vid1, flows, wt, skip_self=False):
    """Decompose a full space-time search into 2-frame PairedSearch calls
    (reference search/utils.py:339-382); the natural unit for temporal
    sharding."""
    dists_all, inds_all = [], []
    T = vid0.shape[1]
    if flows.ndim == 6:
        flows = flows[:, None]
    zflow = jnp.zeros_like(flows[:, :, 0, 0])
    for ti in range(T):
        t_grid = get_time_window_inds(ti, wt, T)
        dists_i, inds_i = [], []
        for _tj in range(2 * wt + 1):
            tj = t_grid[_tj]
            if (ti == tj) and skip_self:
                continue
            frame0 = vid0[:, ti]
            frame1 = vid1[:, tj]
            flow = flows[:, :, ti, _tj - 1] if _tj > 0 else zflow
            d_ij, i_ij = forward(frame0, frame1, flow.astype(jnp.float32))
            i_t = (tj - ti) * jnp.ones_like(i_ij[..., :1])
            i_ij = jnp.concatenate([i_t, i_ij], axis=-1)
            dists_i.append(d_ij)
            inds_i.append(i_ij)
        dists_all.append(jnp.concatenate(dists_i, axis=-1))
        inds_all.append(jnp.concatenate(inds_i, axis=-2))
    dists = jnp.stack(dists_all, axis=-4)
    inds = jnp.stack(inds_all, axis=-5)
    return dists, inds


def paired_vids_refine(forward, vid0, vid1, flows, wt, skip_self=False,
                       check_time=True):
    """Frame-streaming decomposition for PairedRefine (reference
    search/utils.py:384-435): per (ti, tj) window slot, refine around the
    K_each given flows for that slot."""
    dists_all, inds_all = [], []
    T = vid0.shape[1]
    if flows.ndim == 6:
        flows = flows[:, None]
    K_total = flows.shape[-2]
    Wt = 2 * wt + 1
    Wt = Wt - 1 if skip_self else Wt
    assert (K_total % Wt) == 0, "Must be divisible by Wt."
    K_each = K_total // Wt
    for ti in range(T):
        t_grid = get_time_window_inds(ti, wt, T)
        dists_i, inds_i = [], []
        ix = 0
        for _tj in range(2 * wt + 1):
            tj = t_grid[_tj]
            if (ti == tj) and skip_self:
                continue
            frame0 = vid0[:, ti]
            frame1 = vid1[:, tj]
            ks0, ks1 = ix * K_each, (ix + 1) * K_each
            flow = flows[:, :, ti, :, :, ks0:ks1, :].astype(jnp.float32)
            d_ij, i_ij = forward(frame0, frame1, flow[..., 1:])
            i_t = (tj - ti) * jnp.ones_like(i_ij[..., :1])
            inds_i.append(jnp.concatenate([i_t, i_ij], axis=-1))
            dists_i.append(d_ij)
            ix += 1
        dists_all.append(jnp.concatenate(dists_i, axis=-1))
        inds_all.append(jnp.concatenate(inds_i, axis=-2))
    dists = jnp.stack(dists_all, axis=-4)
    inds = jnp.stack(inds_all, axis=-5)
    return dists, inds
