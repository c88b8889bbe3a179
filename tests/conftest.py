"""Test environment: force an 8-device virtual CPU platform so population
sharding (parallel/) is exercised without TPU hardware, per the multi-chip
test strategy in SURVEY.md §4/§5.8.

On-TPU lane: `CGT_TEST_PLATFORM=tpu python -m pytest tests/ -m tpu` skips
the CPU pin and runs the tpu-marked subset (tests/test_tpu_lane.py) on the
real chip, so TPU-only regressions (layout, bf16 conv rounding, Pallas
lowering) can't hide behind a green CPU suite."""

import os

ON_TPU = os.environ.get("CGT_TEST_PLATFORM", "cpu").lower() == "tpu"

if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: outer env may pin the TPU platform
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not ON_TPU:
    # The axon TPU plugin rewrites JAX_PLATFORMS to "axon,cpu" at import, so
    # the env var alone does NOT pin the backend; the config update does.
    jax.config.update("jax_platforms", "cpu")

# Eager op-by-op dispatch costs ~1s/op compile in this environment; the
# persistent cache makes repeated test runs (and repeated ops) cheap.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
if not ON_TPU:
    # This environment's CPU XLA runs 'default'-precision convs/matmuls at
    # reduced (~bf16) accuracy; parity tests need true fp32. The TPU lane
    # keeps DEFAULT precision — it exists to test production numerics.
    jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Drop jit caches between test MODULES: the full suite compiles
    hundreds of programs into one process, and with enough accumulated
    live executables the XLA:CPU runtime intermittently aborts inside a
    later sharded execution (observed at tests/test_parallel.py's
    full-step tests; the same tests pass with a lighter process history).
    Per-module clearing bounds the population; the persistent compile
    cache keeps re-lowering cheap."""
    yield
    jax.clear_caches()
