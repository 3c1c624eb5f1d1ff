"""NonLocalDenoiser: the flagship model wiring the full stack — conv
embedding, flow-guided NonLocalAttention, residual refinement, conv output.

This is the model family the reference targets (video denoising with
shifted non-local search replacing predicted offsets, README "Upgrading
Existing Space-Time Attention" / RVRT upgrade, BASELINE.md config 4).
"""

import jax
import jax.numpy as jnp
import flax.linen as fnn

from stnls_tpu.models.blocks import ResBlockList, ChannelAttention, _conv2d
from stnls_tpu.nn.non_local_attn import NonLocalAttention


class NonLocalDenoiser(fnn.Module):
    """vid [B,T,C,H,W] (+ flows dict) -> denoised vid [B,T,C,H,W].

    search_overrides / agg_overrides pass TPU tuning knobs straight into
    the search/agg config menus (impl, flow_budget, spread_budget,
    qchunk, band_dtype, agg_budget, agg_spread, ...) so config-built
    models can tune the fused-kernel budgets (VERDICT r1 #5)."""
    in_dim: int = 3
    embed_dim: int = 16
    nheads: int = 2
    ws: int = 9
    wt: int = 1
    ps: int = 3
    k: int = 9
    stride0: int = 1
    nres: int = 2
    search_overrides: dict = None
    agg_overrides: dict = None

    @fnn.compact
    def __call__(self, vid, flows=None, state=None):
        io_dim = self.embed_dim * self.nheads
        attn_cfg = {"nheads": self.nheads, "embed_dim": self.embed_dim,
                    "use_attn_projection": True, "use_attn_flow": True}
        search_cfg = {"search_name": "nls", "ws": self.ws, "wt": self.wt,
                      "ps": self.ps, "k": self.k, "nheads": self.nheads,
                      "stride0": self.stride0, "self_action": "anchor",
                      "itype": "float", "dist_type": "l2",
                      **(self.search_overrides or {})}
        normz_cfg = {"normz_name": "softmax", "normz_scale": 10,
                     "dist_type": "l2"}
        agg_cfg = {"agg_name": "gather", "ps": self.ps,
                   "stride0": self.stride0, "itype": "float",
                   **(self.agg_overrides or {})}

        B, T, C, H, W = vid.shape
        x = _conv2d(vid.reshape(B * T, C, H, W), io_dim, 3, "embed")
        x = x.reshape(B, T, io_dim, H, W)
        y, state = NonLocalAttention(attn_cfg, search_cfg, normz_cfg,
                                     agg_cfg, name="attn")(x, flows, state)
        y = x + y
        z = ResBlockList(self.nres, io_dim, name="res")(
            y.reshape(B * T, io_dim, H, W))
        z = ChannelAttention(io_dim, name="chnl")(z)
        out = _conv2d(z, C, 3, "out").reshape(B, T, C, H, W)
        return vid + out, state
