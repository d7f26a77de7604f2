"""Least-norm solve variants and the general-norm solve.

Metamorphic properties from the reference validation suite (SURVEY §4):
  * all three least-norm variants agree with each other;
  * appending a terminal objective x = 0 to the hierarchy and basic-
    solving equals the least-norm solution (``append_terminal_objective.m``);
  * solveGeneralNorm with M = I, m = 0 equals least-norm without the +I
    damping... (it equals the min of ||x|| over the set — same solution);
  * pseudoinverse check: for a single full-rank underdetermined level the
    least-norm solution is pinv(A) b (``example_lexlse.m`` scenario 2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import lexls_tpu.lexlse as jle
from lexls_tpu.api import LexLSE
from lexls_tpu.oracle import generate as gen
from lexls_tpu.types import EqualityHierarchy, ParametersLexLSE, RegularizationType


def _problem(seed, n=10, dims=(3, 3), ranks=None, fixed=0):
    rng = np.random.default_rng(seed)
    A, b, dims, fi, fv = gen.random_equality_hierarchy(
        rng, n, list(dims), ranks, fixed_variables=fixed)
    return EqualityHierarchy(A=A, b=b, dims=dims, fixed_idx=fi, fixed_val=fv)


@pytest.mark.parametrize("seed", range(5))
def test_least_norm_variants_agree(seed):
    prob = _problem(seed, n=12, dims=(4, 3), ranks=(3, 2))
    s2 = LexLSE(prob).solve(solve_option=2)
    s1 = LexLSE(prob).solve(solve_option=1)
    np.testing.assert_allclose(s1.x, s2.x, atol=1e-9)
    s3 = LexLSE(prob, params=ParametersLexLSE(
        regularization_type=RegularizationType.TIKHONOV)).solve(solve_option=3)
    np.testing.assert_allclose(s3.x, s2.x, atol=1e-9)


@pytest.mark.parametrize("seed", range(3))
def test_least_norm_with_fixed_variables(seed):
    prob = _problem(seed + 50, n=12, dims=(4, 3), ranks=(3, 2), fixed=2)
    s1 = LexLSE(prob).solve(solve_option=1)
    s2 = LexLSE(prob).solve(solve_option=2)
    np.testing.assert_allclose(s1.x, s2.x, atol=1e-9)
    np.testing.assert_allclose(s1.x[prob.fixed_idx], prob.fixed_val, atol=1e-12)


@pytest.mark.parametrize("seed", range(3))
def test_terminal_objective_equals_least_norm(seed):
    """Appending x = 0 as a last level == least-norm (metamorphic check
    of the reference MATLAB suite, ``append_terminal_objective.m``)."""
    prob = _problem(seed + 100, n=10, dims=(3, 3), ranks=(2, 2))
    n = prob.n_var
    A2 = np.concatenate([prob.A, np.eye(n)], axis=0)
    b2 = np.concatenate([prob.b, np.zeros(n)])
    aug = EqualityHierarchy(A=A2, b=b2, dims=prob.dims + (n,))
    x_term = LexLSE(aug).solve(solve_option=0).x
    x_ln = LexLSE(prob).solve(solve_option=2).x
    np.testing.assert_allclose(x_term, x_ln, atol=1e-8)


def test_pseudoinverse_check():
    rng = np.random.default_rng(7)
    A = rng.standard_normal((4, 9))
    b = rng.standard_normal(4)
    prob = EqualityHierarchy(A=A, b=b, dims=(4,))
    x = LexLSE(prob).solve(solve_option=1).x
    np.testing.assert_allclose(x, np.linalg.pinv(A) @ b, atol=1e-10)


@pytest.mark.parametrize("seed", range(3))
def test_general_norm(seed):
    """solveGeneralNorm with M = I, m = 0 minimizes ||x|| over the
    solution set -> equals the least-norm solution; with a random
    well-conditioned M it satisfies the projected normal equations."""
    prob = _problem(seed + 200, n=10, dims=(3, 3), ranks=(2, 2))
    n = prob.n_var
    s = LexLSE(prob).solve_general_norm(np.eye(n), np.zeros(n))
    x_ln = LexLSE(prob).solve(solve_option=2).x
    # min ||x|| over the set == least-norm solution
    np.testing.assert_allclose(s.x, x_ln, atol=1e-8)

    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n + 2, n))
    m = rng.standard_normal(n + 2)
    sg = LexLSE(prob).solve_general_norm(M, m)
    # optimality within the solution set: for any z in the nullspace of
    # all levels' row spaces (the free subspace), gradient M'(Mx-m) ⟂ z
    from lexls_tpu.oracle.generate import lex_solve_nullspace

    _, v0 = lex_solve_nullspace(prob.A, prob.b, prob.dims)
    # residuals must be unchanged (still lexicographically optimal)
    v = prob.A @ sg.x - prob.b
    ofs = 0
    for d in prob.dims:
        np.testing.assert_allclose(np.linalg.norm(v[ofs:ofs + d]),
                                   np.linalg.norm(v0[ofs:ofs + d]), atol=1e-8)
        ofs += d
    # stationarity of ||Mx-m|| along the free subspace
    C = np.concatenate([prob.A], axis=0)
    _, _, Vt = np.linalg.svd(C)
    rank = int((np.linalg.svd(C, compute_uv=False) > 1e-9).sum())
    Z = Vt[rank:].T
    g = Z.T @ (M.T @ (M @ sg.x - m))
    np.testing.assert_allclose(g, 0, atol=1e-7)


def test_solve_equality_batched():
    from lexls_tpu.api import solve_equality_batched

    rng = np.random.default_rng(5)
    B, n, dims = 4, 10, (3, 3)
    As, bs = [], []
    for _ in range(B):
        A, b, _, _, _ = gen.random_equality_hierarchy(rng, n, list(dims), (2, 2))
        As.append(A); bs.append(b)
    xs = np.asarray(solve_equality_batched(np.stack(As), np.stack(bs), dims))
    for i in range(B):
        prob = EqualityHierarchy(A=As[i], b=bs[i], dims=dims)
        ref = LexLSE(prob).solve(solve_option=0)
        np.testing.assert_allclose(xs[i], ref.x, atol=1e-10)
