"""Regularized-multiplier machinery (X_mu / residual_mu, TIKHONOV_1).

Reference: ``regularize_tikhonov_1_test`` (lexlse.h:1774-1886),
``initialize_rhs`` (:1920-1959), ``get_intermediate_x`` (:2010-2071),
``ObjectiveSensitivity`` with the residual_mu branch (:648-690)."""

import numpy as np
import pytest

import jax.numpy as jnp

import lexls_tpu.lexlse as jle
from lexls_tpu.oracle import generate as gen
from lexls_tpu.oracle import lexlse as oe
from lexls_tpu.types import ParametersLexLSE, RegularizationType

PARAMS = ParametersLexLSE(regularization_type=RegularizationType.TIKHONOV_1)


def test_single_level_closed_form():
    """One level: X_mu solves (A'A + mu^2 I) x = A'b; residual_mu and the
    regularized lambda equal A x_mu - b."""
    rng = np.random.default_rng(0)
    n, m1 = 6, 4
    A = rng.standard_normal((m1, n))
    b = rng.standard_normal(m1)
    mu = 0.3
    x_direct = np.linalg.solve(A.T @ A + mu * mu * np.eye(n), A.T @ b)

    fo = oe.factorize(A, b, (m1,), PARAMS, regularization=np.array([mu]))
    np.testing.assert_allclose(fo.X_mu[:, 0], x_direct, atol=1e-12)
    np.testing.assert_allclose(fo.residual_mu, A @ x_direct - b, atol=1e-12)
    _, lam_o = oe.objective_sensitivity_regularized(fo, 0)
    np.testing.assert_allclose(lam_o, A @ x_direct - b, atol=1e-12)

    fj = jle.factorize(jnp.asarray(A), jnp.asarray(b), (m1,), PARAMS,
                       reg_factors=jnp.array([mu]))
    np.testing.assert_allclose(np.asarray(fj.X_mu[:, 0]), x_direct, atol=1e-12)
    _, lam_j = jle.objective_sensitivity_regularized(
        fj, 0, A_fixed_cols=jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(lam_j), A @ x_direct - b, atol=1e-12)


@pytest.mark.parametrize("seed", range(4))
def test_jax_oracle_parity(seed):
    rng = np.random.default_rng(10 + seed)
    A, b, dims, _, _ = gen.random_equality_hierarchy(rng, 8, (3, 3, 2), (2, 2, 1))
    mus = np.array([0.2, 0.15, 0.1])
    fo = oe.factorize(A, b, dims, PARAMS, regularization=mus)
    fj = jle.factorize(jnp.asarray(A), jnp.asarray(b), dims, PARAMS,
                       reg_factors=jnp.asarray(mus))
    np.testing.assert_allclose(np.asarray(fj.X_mu), fo.X_mu, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fj.residual_mu), fo.residual_mu,
                               atol=1e-10)
    for j in range(len(dims)):
        _, lo = oe.objective_sensitivity_regularized(fo, j)
        _, lj = jle.objective_sensitivity_regularized(fj, j)
        np.testing.assert_allclose(np.asarray(lj)[: len(lo)], lo, atol=1e-10)


def test_small_mu_approaches_unregularized():
    """mu -> 0: the regularized multipliers converge to the standard ones."""
    rng = np.random.default_rng(3)
    A, b, dims, _, _ = gen.random_equality_hierarchy(rng, 8, (3, 3), (2, 2))
    mus = np.array([1e-5, 1e-5])
    fo = oe.factorize(A, b, dims, PARAMS, regularization=mus)
    f0 = oe.factorize(A, b, dims, ParametersLexLSE())
    for j in range(2):
        _, lr = oe.objective_sensitivity_regularized(fo, j)
        _, l0 = oe.objective_sensitivity(f0, j)
        np.testing.assert_allclose(lr, l0, atol=1e-8)


@pytest.mark.parametrize("trial", range(4))
def test_tikhonov_1_fast_tier_matches_physical(trial):
    """TIKHONOV_1 on factorize_fast (position-space gathers through
    col_at) is bit-compatible with the physical tier: lod, X_mu,
    residual_mu, solve, and the regularized multipliers all agree."""
    rng = np.random.default_rng(700 + trial)
    n = int(rng.integers(5, 12))
    p = int(rng.integers(2, 4))
    dims = tuple(int(rng.integers(2, 6)) for _ in range(p))
    ranks = [min(d, int(rng.integers(1, d + 1))) for d in dims]
    A, b, _, _, _ = gen.random_equality_hierarchy(rng, n, dims, ranks=ranks)
    reg = jnp.asarray(0.1 * rng.random(p) + 0.01)
    params = ParametersLexLSE(
        regularization_type=RegularizationType.TIKHONOV_1)
    A, b = jnp.asarray(A), jnp.asarray(b)
    f1 = jle.factorize(A, b, dims, params, reg_factors=reg)
    f2 = jle.factorize_fast(A, b, dims, params, reg_factors=reg)
    np.testing.assert_array_equal(np.asarray(f1.ranks), np.asarray(f2.ranks))
    np.testing.assert_allclose(np.asarray(f2.lod), np.asarray(f1.lod),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(f2.X_mu), np.asarray(f1.X_mu),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(f2.residual_mu),
                               np.asarray(f1.residual_mu), atol=1e-10)
    np.testing.assert_allclose(np.asarray(jle.solve(f2)),
                               np.asarray(jle.solve(f1)), atol=1e-10)
    for j in range(p):
        l1 = jle.objective_sensitivity_regularized(f1, j)
        l2 = jle.objective_sensitivity_regularized(f2, j)
        for a, bb in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                       atol=1e-10)
