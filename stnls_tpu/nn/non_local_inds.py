"""Absolute search-grid coordinates (reference lib/stnls/nn/non_local_inds.py
+ lib/csrc/nn/non_local_inds_kernel.cu): the flow-shifted window positions
as float (t,h,w), no distances — feeds N3MatMultSearch."""

import jax.numpy as jnp

from stnls_tpu.ops import flow_ops


def non_local_inds(fflow, bflow, ws, wt, stride0, stride1):
    """Returns inds [B,T,nH,nW,W_t*ws*ws,3] of absolute float coords."""
    grid = flow_ops.non_local_inds(fflow, bflow, ws, wt, stride0, stride1)
    # [3,B,T,W_t,ws,ws,nH,nW] -> [B,T,nH,nW,W_t*ws*ws,3]
    _, B, T, W_t, ws_, _, nH, nW = grid.shape
    grid = jnp.transpose(grid, (1, 2, 6, 7, 3, 4, 5, 0))
    return grid.reshape(B, T, nH, nW, W_t * ws_ * ws_, 3)
