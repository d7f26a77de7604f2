"""Test configuration.

Tests run on CPU with 8 virtual devices (for multi-chip sharding tests)
and float64 enabled (numerical-parity tests vs the float64 oracle).  TPU
runs are exercised by bench.py / the driver, not by the unit-test suite.

NOTE: in this image ``jax`` is preloaded before user code runs, so
environment variables (JAX_PLATFORMS / XLA_FLAGS / JAX_ENABLE_X64) are
already consumed — configuration must go through ``jax.config.update``.
"""

import resource

# XLA:CPU segfaults inside backend_compile_and_load after ~35 heavy jit
# compilations accumulate in one process (observed at test ~37 of a
# serial tests/test_tracker.py run; reads as FAILED-with-no-traceback
# under xdist).  Two mitigations, belt and braces:
#   * raise RLIMIT_STACK (LLVM's pipeline recurses deeply on the big
#     fused/tracked programs; the main-thread stack grows on demand up
#     to the soft limit) — necessary but NOT sufficient on its own (a
#     512 MB run still crashed at the same spot);
#   * periodically drop compiled executables via jax.clear_caches()
#     (pytest_runtest_teardown below) so no process ever accumulates
#     enough JIT code to hit the crash.
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
        resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
except (ValueError, OSError):  # pragma: no cover - best effort
    pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import os  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Clear JAX's compilation caches every N finished tests (see the crash
# note above).  Costs some recompiles inside big param sweeps; 10 keeps
# every process well under the observed crash threshold even for the
# heavy tracker/fused files (25 survived 41 serial tracker tests but
# crashed at 43 once the round-5 CG/slab tests were added).
_CLEAR_EVERY = int(os.environ.get("LEXLS_TEST_CLEAR_EVERY", "10"))
_finished = 0


def pytest_runtest_teardown(item, nextitem):
    global _finished
    _finished += 1
    if _CLEAR_EVERY > 0 and _finished % _CLEAR_EVERY == 0:
        jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
