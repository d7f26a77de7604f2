"""Test configuration.

Tests run on CPU with 8 virtual devices (for multi-chip sharding tests)
and float64 enabled (numerical-parity tests vs the float64 oracle).  TPU
runs are exercised by bench.py / the driver, not by the unit-test suite.

NOTE: in this image ``jax`` is preloaded before user code runs, so
environment variables (JAX_PLATFORMS / XLA_FLAGS / JAX_ENABLE_X64) are
already consumed — configuration must go through ``jax.config.update``.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
