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


# Default-tier ("pytest -q") budget on the single-core CPU runner: the
# heavy engine-comparison files keep only their first N collected tests
# as a smoke; the remainder run with -m slow (or on-chip via the verify
# recipe). The pure-jnp correctness files are untouched.
_DEFAULT_KEEP = {
    "test_agg_pallas.py": 2,
    "test_gather_add_pallas.py": 1,
    "test_cvr_path.py": 2,
    "test_cv_path.py": 6,
    "test_sparse_k.py": 2,
    "test_agg_gradcheck.py": 3,
    "test_paired_refine.py": 5,
    "test_sharding.py": 2,
}


def pytest_collection_modifyitems(config, items):
    """Tier the interpret-mode/engine-comparison tests: the fast-engine
    knob-grid sweep and all but a smoke subset of the heavy comparison
    files run with -m slow (or on-chip via the verify recipe)."""
    kept = {}
    for it in items:
        fn = getattr(it, "function", None)
        if fn is None:
            continue
        if fn.__name__ == "test_fast_engine_grid_matches_gt":
            # the whole fast-engine sweep is slow-tier; engine smoke
            # coverage rides test_pallas_smoke / test_agg_pallas
            it.add_marker(pytest.mark.slow)
            continue
        fname = it.path.name if hasattr(it, "path") else ""
        if fname in _DEFAULT_KEEP:
            n = kept.get(fname, 0)
            already_slow = any(m.name == "slow" for m in
                               it.iter_markers())
            if already_slow:
                continue
            if n >= _DEFAULT_KEEP[fname]:
                it.add_marker(pytest.mark.slow)
            else:
                kept[fname] = n + 1
