"""NonLocalAttentionStack: attention block whose aggregation is the
NonLocalGather stack (reference lib/stnls/nn/non_local_attn_stack.py).

Mirrors the reference's behavior: menu-dispatched search with the
refine-from-state and rand_inds paths (run_search, reference :163-176),
`ref_itype` mangling for refinement searches (:82-85), recurrent state
update (:185-199, functional here), menu-dispatched aggregation, share_kv,
and optional eager stage timing via attn_timer (ExpTimer; active only
outside jit, where wall timing is meaningful). Unlike NonLocalAttention,
the stack output [B,HD,K,T,F,H,W] is returned through the stack-conv
projection menu (agg/proj_menu.py) rather than a plain Conv2d.
"""

import jax
import jax.numpy as jnp
import flax.linen as fnn

from stnls_tpu.utils import config
from stnls_tpu.utils.config import optional
from stnls_tpu.nn.utils import rescale_flows
from stnls_tpu.nn.non_local_attn import (
    ConvQKV, LayerNorm2D, default_pairs, _inds_rs0, _inds_rs1,
)
from stnls_tpu import search as search_mod
from stnls_tpu import normz as normz_mod
from stnls_tpu import agg as agg_mod


def extract_config(cfg, restrict=True):
    pairs = dict(default_pairs())
    pairs.update({"share_kv": False, "ref_itype": None,
                  "ps_stack": 7, "k_agg": -1})
    return config.extract_pairs(cfg, pairs, restrict=restrict)


class NonLocalAttentionStack(fnn.Module):
    attn_cfg: dict
    search_cfg: dict
    normz_cfg: dict
    agg_cfg: dict

    def setup(self):
        attn_cfg = extract_config(self.attn_cfg, restrict=False)
        nheads = attn_cfg.nheads
        inner_mult = optional(attn_cfg, "inner_mult", 1)
        embed_dim = attn_cfg.embed_dim * inner_mult
        io_dim = attn_cfg.embed_dim * nheads
        self.dim = io_dim
        self.share_kv = attn_cfg.share_kv

        # ref_itype mangling: refinement searches may run a different
        # index type than the first-stage search (reference :82-85)
        search_cfg = dict(self.search_cfg)
        self.search_name = optional(search_cfg, "search_name", "nls")
        ref_itype = optional(attn_cfg, "ref_itype",
                             optional(search_cfg, "ref_itype", None))
        if self.search_name in ("ref", "refine") and ref_itype is not None:
            search_cfg["itype"] = ref_itype

        self.search = search_mod.init(search_cfg)
        self.normz = normz_mod.init(self.normz_cfg)
        self.agg = agg_mod.init(self.agg_cfg)
        self.k_agg = optional(self.search_cfg, "k_agg", -1)

        self.use_norm_layer = attn_cfg.use_norm_layer
        self.use_flow = attn_cfg.use_attn_flow
        self.use_state_update = optional(self.search_cfg,
                                         "use_state_update", False)
        self.use_timer = optional(attn_cfg, "attn_timer", False)
        self.stride0 = optional(self.search_cfg, "stride0", 1)

        self.qkv = ConvQKV(input_dim=io_dim, heads=nheads,
                           dim_head=embed_dim, qk_frac=attn_cfg.qk_frac,
                           bias=attn_cfg.qkv_bias,
                           ngroups=attn_cfg.qkv_ngroups)
        k_eff = self.k_agg if self.k_agg > 0 else \
            optional(self.search_cfg, "k", 1)
        self.proj_k = max(int(k_eff), 1)
        self.proj = fnn.Conv(io_dim, (1, 1))
        self.norm_layer = LayerNorm2D(io_dim) if self.use_norm_layer else None

    @fnn.compact
    def __call__(self, vid, flows=None, state=None, deterministic=True):
        timer = _StageTimer(self.use_timer, vid)
        B, T, C, H, W = vid.shape
        if self.use_flow and flows is not None:
            flows = rescale_flows(flows, H, W)
        if self.norm_layer is not None:
            vid = self.norm_layer(vid)
        with timer("qkv"):
            q_vid, k_vid, v_vid = self.get_qkv(vid)
        with timer("search"):
            dists, inds = self.run_search(q_vid, k_vid, flows, state)
        state = self._next_state(state, inds, q_vid.shape)
        with timer("normz"):
            weights, inds = self.normz(dists, inds)
        with timer("agg"):
            stack = self.agg(v_vid, weights, inds)
        with timer("proj"):
            x = self.run_stack_projection(stack)
        object.__setattr__(self, "_times", timer.times)
        return x, state

    def get_qkv(self, vid):
        B, T, C, H, W = vid.shape
        q, k, v = self.qkv(vid.reshape(B * T, C, H, W))
        if self.share_kv:
            v = k
        return (q.reshape(B, T, -1, H, W), k.reshape(B, T, -1, H, W),
                v.reshape(B, T, -1, H, W))

    def run_search(self, q_vid, k_vid, flows, state):
        if self.search_name in ("ref", "refine"):
            inds_p = _inds_rs1(state[0])
            dists, inds = self.search(q_vid, k_vid, inds_p)
        elif self.search_name == "rand_inds":
            dists, inds = self.search(q_vid, k_vid)
        else:
            dists, inds = self.search(q_vid, k_vid, flows.fflow,
                                      flows.bflow)
        return dists, inds

    def _next_state(self, state, inds, vshape):
        if not self.use_state_update or state is None:
            return state
        T, C, H, W = vshape[-4:]
        nH = (H - 1) // self.stride0 + 1
        nW = (W - 1) // self.stride0 + 1
        return [_inds_rs0(jax.lax.stop_gradient(inds), nH, nW), state[0]]

    def run_stack_projection(self, stack):
        """Stack [B,HD,K,T,F,H,W] -> per-k linear mix (the Conv3d over
        (K,1,1) of the reference proj menu v1) -> io_dim video."""
        if stack.ndim == 6:     # agg produced a video (e.g. gather_add)
            B_, HD, T_, F, H_, W_ = stack.shape
            x = jnp.transpose(stack, (0, 2, 4, 5, 1, 3)) \
                .reshape(B_ * T_, H_, W_, HD * F)
        else:
            B_, HD, K, T_, F, H_, W_ = stack.shape
            x = jnp.transpose(stack, (0, 3, 5, 6, 2, 1, 4)) \
                .reshape(B_ * T_, H_, W_, K * HD * F)
        x = fnn.Conv(self.dim, (1, 1), name="stack_proj")(x)
        Bt = x.shape[0]
        x = jnp.moveaxis(x, -1, 1).reshape(Bt // T_, T_, self.dim,
                                           x.shape[1], x.shape[2])
        B, T, C, H, W = x.shape
        y = jnp.moveaxis(x.reshape(B * T, C, H, W), 1, -1)
        y = self.proj(y)
        return jnp.moveaxis(y, -1, 1).reshape(B, T, C, H, W)


class _StageTimer:
    """Eager per-stage wall timers honoring attn_timer: active only when
    the input is a concrete array (outside jit, where stage walls mean
    something); inside jit it degrades to jax.named_scope so profiler
    traces still carry the stage names."""

    def __init__(self, enabled, probe):
        import jax.core
        self.eager = enabled and not isinstance(probe, jax.core.Tracer)
        self.times = {}

    def __call__(self, name):
        import contextlib
        if not self.eager:
            return jax.named_scope(name)

        @contextlib.contextmanager
        def cm():
            import time
            t0 = time.perf_counter()
            yield
            self.times[name] = time.perf_counter() - t0
        return cm()
