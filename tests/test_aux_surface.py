"""Debug-surface parity items: X_mu_rhs accessor, working-set-log
overflow flag, MATLAB-readable trace export (``outputStuff`` analogue)."""

import numpy as np
import jax.numpy as jnp

import lexls_tpu.lexlsi as jli
from lexls_tpu import lexlse as jl
from lexls_tpu import types as T
from lexls_tpu.oracle import generate as gen
from lexls_tpu.oracle import lexlse as oe


def test_x_mu_rhs_matches_oracle():
    """Device X_mu_rhs (reference ``get_X_mu_rhs``, lexlse.h:1641) must
    match the oracle's debug mirror after a TIKHONOV_1 factorization."""
    rng = np.random.default_rng(21)
    A, b, dims, _, _ = gen.random_equality_hierarchy(rng, 8, (3, 3), (2, 2))
    mu = np.array([0.1, 0.2])
    params = T.ParametersLexLSE(
        regularization_type=T.RegularizationType.TIKHONOV_1)
    fo = oe.factorize(A, b, dims, params, regularization=mu)
    oe.objective_sensitivity_regularized(fo, 1)  # fills oracle X_mu_rhs
    f = jl.factorize(jnp.asarray(A), jnp.asarray(b), dims, params,
                     reg_factors=jnp.asarray(mu))
    dev = np.asarray(jl.x_mu_rhs(f))
    np.testing.assert_allclose(dev[:, 1], fo.X_mu_rhs[:, 1], atol=1e-9)


def test_log_no_overflow_within_budget():
    """The log capacity covers every possible iteration of the budget, so
    a normal solve must not raise the overflow flag, and every entry is
    recorded."""
    rng = np.random.default_rng(5)
    prob = gen.random_inequality_hierarchy(
        rng, 10, [4, 4], equality_fraction=0.0, tight_fraction=0.8)
    params = T.ParametersLexLSI(max_number_of_factorizations=60,
                                log_working_set_enabled=True)
    res = jli.solve(prob, params)
    assert res.log_overflow is False
    assert len(res.working_set_log) == res.n_activations + res.n_deactivations


def test_export_trace(tmp_path):
    rng = np.random.default_rng(7)
    prob = gen.random_inequality_hierarchy(
        rng, 8, [3, 3], equality_fraction=0.1, tight_fraction=0.5)
    params = T.ParametersLexLSI(trace_enabled=True)
    res = jli.solve(prob, params)
    out = tmp_path / "trace.m"
    res.export_trace(str(out))
    text = out.read_text()
    assert f"% nIterations     = {res.n_iterations}" in text
    assert text.count("stepLength_(") == res.n_iterations
    # the recorded final x matches the result
    last = [ln for ln in text.splitlines()
            if ln.startswith(f"x_(:,{res.n_iterations})")][0]
    vals = [float(v) for v in
            last.split("[ ")[1].split(" ];")[0].split("; ")]
    np.testing.assert_allclose(vals, res.x, atol=1e-12)
