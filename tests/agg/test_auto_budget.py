"""Auto-sized aggregation budgets (VERDICT r2 item 5): budget="auto" /
spread="auto" derive static buckets from concrete flows, so large offsets
(e.g. 20 px) work on the default path without hand-tuning.

Reference contract: the CUDA gather aggregates at ANY offset
(lib/csrc/agg/gather_int_kernel.cu:49-92)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import stnls_tpu
from stnls_tpu.ops.agg_pallas import (
    resolve_agg_budgets, AGG_BUDGET_BUCKETS,
)


def _mk(H=96, W=96, T=2, F=8, K=3, off=20.0, seed=0):
    rng = np.random.default_rng(seed)
    vid = jnp.asarray(rng.standard_normal((1, 1, T, F, H, W)), jnp.float32)
    w = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((1, 1, T, H, W, K)), jnp.float32), axis=-1)
    # smooth flows: per-(frame,k) coherent +/-off px direction with
    # +/-1.5 px per-pixel jitter — the real-TV-L1-like workload the
    # tile-rebasing kernel targets (incoherent per-pixel signs are
    # correctly rejected by the supported-check, not silently dropped)
    sign = jnp.asarray(rng.choice([-1., 1.], (1, 1, T, 1, 1, 1, 2)),
                       jnp.float32)
    f_hw = off * jnp.broadcast_to(sign, (1, 1, T, H, W, K, 2)) \
        + jnp.asarray(rng.uniform(-1.5, 1.5, (1, 1, T, H, W, K, 2)),
                      jnp.float32)
    f_t = jnp.zeros((1, 1, T, H, W, K, 1), jnp.float32)
    flows = jnp.concatenate([f_t, f_hw], axis=-1)
    return vid, w, flows


def test_resolver_buckets():
    vid, w, flows = _mk(off=20.0)
    budget, spread = resolve_agg_budgets(
        flows, T=2, H=96, W=96, ps=3, dilation=1, use_adj=False,
        budget="auto", spread="auto")
    assert budget in AGG_BUDGET_BUCKETS
    assert budget >= 21  # 20 px offsets + jitter must fit
    assert isinstance(spread, tuple) and len(spread) == 2


def test_resolver_traced_fallback():
    vid, w, flows = _mk(off=20.0)

    def inner(f):
        b, s = resolve_agg_budgets(
            f, T=2, H=96, W=96, ps=3, dilation=1, use_adj=False,
            budget="auto", spread="auto")
        assert b == 16 and s == 16  # legacy defaults under tracing
        return f

    jax.jit(inner)(flows)


def test_gather_auto_matches_jnp_20px():
    """20 px offsets on the DEFAULT path (impl/budget/spread all "auto")
    match the exhaustive jnp engine exactly -- no hand-tuning. Where the
    resolved budgets exceed the pallas kernel's domain (reflection at
    boundaries gives ~2*off col spread), auto must FALL BACK, never
    silently drop edges (VERDICT r2 #5 + "no silent caps")."""
    vid, w, flows = _mk(off=20.0)
    out_ref = stnls_tpu.agg.NonLocalGather(
        ps=3, stride0=1, itype="float", impl="jnp")(vid, w, flows)
    out_auto = stnls_tpu.agg.NonLocalGather(
        ps=3, stride0=1, itype="float")(vid, w, flows)
    assert np.allclose(np.asarray(out_ref), np.asarray(out_auto),
                       atol=1e-5), \
        np.abs(np.asarray(out_ref) - np.asarray(out_auto)).max()


def test_gather_add_auto_matches_jnp_20px():
    vid, w, flows = _mk(off=20.0, K=2)
    out_ref = stnls_tpu.agg.NonLocalGatherAdd(
        ps=3, strideIn=1, strideOut=1, itype="float",
        impl="jnp")(vid, w, flows)
    out_auto = stnls_tpu.agg.NonLocalGatherAdd(
        ps=3, strideIn=1, strideOut=1, itype="float")(vid, w, flows)
    assert np.allclose(np.asarray(out_ref), np.asarray(out_auto),
                       atol=1e-5), \
        np.abs(np.asarray(out_ref) - np.asarray(out_auto)).max()


def test_gather_pallas_auto_budgets_10px():
    """Auto-resolved budgets on the pallas kernel itself (interpret on
    CPU): +/-10 px smooth offsets resolve to supported buckets and match
    the jnp engine exactly."""
    vid, w, flows = _mk(off=10.0)
    out_ref = stnls_tpu.agg.NonLocalGather(
        ps=3, stride0=1, itype="float", impl="jnp")(vid, w, flows)
    out_pal = stnls_tpu.agg.NonLocalGather(
        ps=3, stride0=1, itype="float", impl="pallas",
        budget="auto", spread="auto")(vid, w, flows)
    assert np.allclose(np.asarray(out_ref), np.asarray(out_pal),
                       atol=1e-5), \
        np.abs(np.asarray(out_ref) - np.asarray(out_pal)).max()


def test_gather_pallas_out_of_domain_is_visible():
    """Forcing impl="pallas" on flows whose resolved spread exceeds the
    kernel's domain must raise, not silently drop edges."""
    vid, w, flows = _mk(off=20.0)
    with pytest.raises(AssertionError):
        stnls_tpu.agg.NonLocalGather(
            ps=3, stride0=1, itype="float", impl="pallas",
            budget="auto", spread="auto")(vid, w, flows)
