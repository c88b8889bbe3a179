"""Test environment: force an 8-device virtual CPU platform so population
sharding (parallel/) is exercised without TPU hardware, per the multi-chip
test strategy in SURVEY.md §4/§5.8."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: outer env may pin the TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
