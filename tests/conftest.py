"""Test configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding tests) and
float64 enabled (numerical-parity tests vs the float64 oracle).  TPU runs
are exercised by bench.py / the driver, not by the unit-test suite.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
