"""Test harness config: run the whole suite on a virtual 8-device CPU mesh
so sharding tests work without multi-chip hardware (the driver separately
dry-runs the multi-chip path; bench.py runs on the real TPU chip).

The axon environment's sitecustomize imports jax at interpreter startup and
calls jax.config.update("jax_platforms", "axon,cpu"), overriding the
JAX_PLATFORMS env var — so the env var alone is NOT enough; the config must
be forced back to cpu here, before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent CPU compile cache: the suite is dominated by hundreds of
# tiny distinct jits (single-core CPU); repeat `pytest -q` runs skip the
# compiles entirely (first run pays them once)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect the virtual 8-device CPU mesh"


import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Tier the fast-engine knob-grid sweep: interpret-mode kernel combos
    are slow on CPU, so only one representative combo per engine runs by
    default; the full sweep runs with -m slow (or on-chip via the verify
    recipe)."""
    for it in items:
        fn = getattr(it, "function", None)
        if fn is None or fn.__name__ != "test_fast_engine_grid_matches_gt":
            continue
        pr = it.callspec.params
        combo = (pr["ps"], pr["stride0"], pr["stride1"], pr["k"],
                 pr["nheads"], pr["dist_type"], pr["itype"])
        if combo != it.module.FAST_IMPL_COMBO:
            it.add_marker(pytest.mark.slow)
