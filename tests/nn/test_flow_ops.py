"""Flow composition ops vs naive python walks (reference
tests/nn/test_accumulate_flow.py:86-106 compares CUDA vs grid_sample
composition; here the oracle is a direct per-pixel walk)."""

import math
import numpy as np
import jax
import jax.numpy as jnp

from stnls_tpu.nn import search_flow, accumulate_flow
from stnls_tpu.nn.non_local_inds import non_local_inds


def bounds(v, L):
    if v < 0:
        return -v
    if v > L - 1:
        return 2 * (L - 1) - v
    return v


def sample_flow_naive(flow, h, w, H, W):
    """Bilinear sample with reflect-indexed corners
    (shared_flows.cu:76-107)."""
    h0, w0 = math.floor(h), math.floor(w)
    dW = dH = 0.0
    for di in (0, 1):
        for dj in (0, 1):
            hc, wc = h0 + di, w0 + dj
            wgt = max(0., 1 - abs(hc - h)) * max(0., 1 - abs(wc - w))
            hr, wr = bounds(hc, H), bounds(wc, W)
            dW += wgt * flow[0, hr, wr]
            dH += wgt * flow[1, hr, wr]
    return dW, dH


def search_flow_naive(fflow, bflow, wt, stride0):
    B, T, _, H, W = fflow.shape
    W_t = min(2 * wt + 1, T)
    nH = (H - 1) // stride0 + 1
    nW = (W - 1) // stride0 + 1
    out = np.zeros((B, T, W_t - 1, 2, nH, nW), np.float32)
    for b in range(B):
        for ti in range(T):
            t_shift = min(0, ti - wt) + max(0, ti + wt - (T - 1))
            t_max = min(T - 1, ti + wt - t_shift)
            for nh in range(nH):
                for nw in range(nW):
                    h_ref, w_ref = float(nh * stride0), float(nw * stride0)
                    h_curr, w_curr = h_ref, w_ref
                    for si in range(1, W_t):
                        tj = ti + si
                        swap = (ti + si - 1) == t_max
                        tj = tj if tj <= t_max else t_max - si
                        if swap:
                            h_curr, w_curr = h_ref, w_ref
                        flow = fflow[b, tj - 1] if tj > ti else bflow[b, tj + 1]
                        dW, dH = sample_flow_naive(flow, h_curr, w_curr, H, W)
                        h_curr += dH
                        w_curr += dW
                        out[b, ti, si - 1, 0, nh, nw] = w_curr - w_ref
                        out[b, ti, si - 1, 1, nh, nw] = h_curr - h_ref
    return out


def test_search_flow_matches_naive():
    rng = np.random.default_rng(0)
    B, T, H, W = 1, 4, 6, 6
    fflow = rng.standard_normal((B, T, 2, H, W)).astype(np.float32)
    bflow = rng.standard_normal((B, T, 2, H, W)).astype(np.float32)
    for wt, stride0 in [(1, 1), (2, 2)]:
        out = search_flow(jnp.asarray(fflow), jnp.asarray(bflow), wt, stride0)
        gt = search_flow_naive(fflow, bflow, wt, stride0)
        np.testing.assert_allclose(np.asarray(out), gt, rtol=1e-4, atol=1e-4)


def test_search_flow_differentiable():
    rng = np.random.default_rng(1)
    fflow = jnp.asarray(rng.standard_normal((1, 3, 2, 6, 6)), jnp.float32)
    bflow = jnp.asarray(rng.standard_normal((1, 3, 2, 6, 6)), jnp.float32)

    def loss(f, b):
        return jnp.sum(search_flow(f, b, 1, 1) ** 2)

    gf, gb = jax.grad(loss, argnums=(0, 1))(fflow, bflow)
    assert np.isfinite(np.asarray(gf)).all()
    assert np.abs(np.asarray(gf)).max() > 0
    assert np.abs(np.asarray(gb)).max() > 0


def test_accumulate_flow_consistent_with_search_flow():
    """The W_t-window slice of the all-pairs accumulation must match
    search_flow for interior frames (same walk)."""
    rng = np.random.default_rng(2)
    B, T, H, W = 1, 5, 6, 6
    fflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
    bflow = jnp.asarray(rng.standard_normal((B, T, 2, H, W)), jnp.float32)
    acc = accumulate_flow(fflow, bflow, stride0=1)
    sf = search_flow(fflow, bflow, wt=1, stride0=1)
    # interior frame ti=2: window slots are [t+1, t-1] -> pfflow[:,2,0],
    # pbflow[:,2,0]
    np.testing.assert_allclose(np.asarray(sf[:, 2, 0]),
                               np.asarray(acc.fflow[:, 2, 0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sf[:, 2, 1]),
                               np.asarray(acc.bflow[:, 2, 0]), atol=1e-4)


def test_non_local_inds_in_bounds():
    rng = np.random.default_rng(3)
    fflow = jnp.asarray(rng.standard_normal((1, 3, 2, 8, 8)), jnp.float32)
    bflow = jnp.asarray(rng.standard_normal((1, 3, 2, 8, 8)), jnp.float32)
    inds = non_local_inds(fflow, bflow, ws=3, wt=1, stride0=1, stride1=1)
    arr = np.asarray(inds)
    assert arr.shape == (1, 3, 8, 8, 27, 3)
    assert (arr[..., 0] >= 0).all() and (arr[..., 0] <= 2).all()
    # full_ws window shifting keeps the lattice inside the frame
    assert (arr[..., 1] >= -1e-4).all() and (arr[..., 1] <= 7 + 1e-4).all()
    assert (arr[..., 2] >= -1e-4).all() and (arr[..., 2] <= 7 + 1e-4).all()
