"""Public flow-composition API (reference lib/stnls/nn/search_flow.py,
lib/stnls/nn/accumulate_flow.py)."""

import jax
import jax.numpy as jnp

from stnls_tpu.ops import flow_ops
from stnls_tpu.ops.flow_ops import (  # noqa: F401
    extract_search_from_accumulated, index_grid,
)
from stnls_tpu.utils.config import ConfigDict


def search_flow(fflow, bflow, wt, stride0=1):
    """flows = stnls_tpu.nn.search_flow(fflow, bflow, wt, stride0):
    [B,T,2,H,W] x2 -> [B,T,W_t-1,2,nH,nW]; differentiable."""
    if wt > 0:
        return flow_ops.search_flow(fflow, bflow, wt, stride0)
    return flow_ops.search_flow(fflow, bflow, 0, stride0)


def accumulate_flow(fflow, bflow, stride0=1, fwd_mode="stnls"):
    """All-pairs accumulated flows; returns a dict with .fflow/.bflow
    [B,T,T-1,2,nH,nW] (reference accumulate_flow.run:22-28). Both fwd modes
    of the reference (CUDA walk / pytorch grid_sample) compute the same
    composition; here there is one differentiable scan."""
    del fwd_mode  # single implementation
    pf, pb = flow_ops.accumulate_flow(fflow, bflow, stride0)
    return ConfigDict(fflow=pf, bflow=pb)


def run_accumulate_flow(fflow, bflow, stride0=1):
    """Alias of the reference's pure-pytorch path (same semantics)."""
    return accumulate_flow(fflow, bflow, stride0)
