"""Flag-gated runtime debug checks (stnls_tpu.utils.debug) — the TPU
analog of the reference's defensive asserts (lib/stnls/agg/gather.py:
124,141,149 NaN/counts asserts, search/shared.py:29-34
reflect_bounds_warning). VERDICT r1 item #9."""

import warnings

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stnls_tpu.utils import debug


@pytest.fixture
def checks_on():
    debug.set_debug_checks(True)
    yield
    debug.set_debug_checks(False)


def test_checks_off_by_default_no_warning():
    assert not debug.debug_checks_enabled()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        debug.emit_count_warning(jnp.int32(5), "should not fire")
        debug.check_finite(jnp.array([np.nan]), "should not fire")


def test_emit_count_warning_fires(checks_on):
    with pytest.warns(RuntimeWarning, match="out of budget"):
        jax.jit(lambda c: debug.emit_count_warning(c, "out of budget"))(
            jnp.int32(3))
    # zero count stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        jax.jit(lambda c: debug.emit_count_warning(c, "quiet"))(
            jnp.int32(0))


def test_check_finite_and_positive(checks_on):
    with pytest.warns(RuntimeWarning, match="nan in stack"):
        debug.check_finite(jnp.array([1.0, np.nan]), "nan in stack")
    with pytest.warns(RuntimeWarning, match="counts"):
        debug.check_positive(jnp.array([1.0, 0.0]), "counts must be > 0")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        debug.check_finite(jnp.array([1.0, 2.0]), "clean")
        debug.check_positive(jnp.array([1.0, 2.0]), "clean")


def test_gather_pallas_outlier_warning(checks_on):
    """An out-of-budget gather edge must surface as a RuntimeWarning on
    the pallas path (ADVICE r1 medium #2: the mask used to be silently
    dropped)."""
    from stnls_tpu.agg import NonLocalGather

    B, HD, T, F, H, W, K = 1, 1, 2, 4, 16, 16, 2
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((B, HD * F, T, H, W))
                      .transpose(0, 2, 1, 3, 4).reshape(B, T, HD * F, H, W),
                      jnp.float32)
    weights = jnp.asarray(rng.random((B, HD, T, H, W, K)), jnp.float32)
    flows = jnp.zeros((B, HD, T, H, W, K, 3), jnp.float32)
    # one edge far beyond budget=2
    flows = flows.at[0, 0, 0, 8, 8, 0, 1].set(11.0)
    gather = NonLocalGather(ps=1, stride0=1, impl="pallas", budget=2,
                            spread=2)
    with pytest.warns(RuntimeWarning, match="exceeded budget"):
        out = gather(vid, weights, flows)
        jax.block_until_ready(out)
