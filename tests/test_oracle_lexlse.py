"""Validate the NumPy l-QR oracle against SVD-based brute force and
mathematical invariants (the oracle then serves as ground truth for the
JAX solver)."""

import numpy as np
import pytest

from lexls_tpu.oracle import generate as gen
from lexls_tpu.oracle import lexlse as oe
from lexls_tpu.types import ParametersLexLSE, RegularizationType


def level_residual_norms(v, dims):
    out = []
    ofs = 0
    for d in dims:
        out.append(np.linalg.norm(v[ofs : ofs + d]))
        ofs += d
    return np.array(out)


@pytest.mark.parametrize("seed", range(8))
def test_factorize_solve_vs_svd_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n = rng.integers(5, 20)
    n_obj = rng.integers(1, 5)
    dims = [int(rng.integers(1, 8)) for _ in range(n_obj)]
    ranks = [int(rng.integers(0, d + 1)) for d in dims]

    A, b, dims, _, _ = gen.random_equality_hierarchy(rng, n, dims, ranks)
    f = oe.factorize(A, b, dims)
    x = oe.solve_basic(f)
    v = A @ x - b

    x2, v2 = gen.lex_solve_nullspace(A, b, dims)

    # x may be non-unique under rank deficiency; residual norms are unique
    np.testing.assert_allclose(
        level_residual_norms(v, dims), level_residual_norms(v2, dims), atol=1e-8
    )

    # per-level ranks match the construction (generic position)
    used = 0
    for r_true, r_found in zip(ranks, f.ranks):
        expected = min(r_true, n - used)
        assert r_found == expected, (f.ranks, ranks)
        used += expected


@pytest.mark.parametrize("seed", range(4))
def test_residual_reconstruction(seed):
    rng = np.random.default_rng(seed + 100)
    n = 12
    dims = (4, 5, 6)
    ranks = (3, 2, 4)
    A, b, dims, _, _ = gen.random_equality_hierarchy(rng, n, dims, ranks)
    f = oe.factorize(A, b, dims)
    x = oe.solve_basic(f)
    v_direct = A @ x - b
    v_replay = oe.residual(f)
    np.testing.assert_allclose(v_replay, v_direct, atol=1e-10)


@pytest.mark.parametrize("seed", range(6))
def test_lambda_stationarity(seed):
    """KKT stationarity: for objective k, sum_j A_j^T lambda_j^k = 0."""
    rng = np.random.default_rng(seed + 200)
    n = 10
    dims = (3, 4, 5)
    ranks = (2, 3, 2)
    A, b, dims, _, _ = gen.random_equality_hierarchy(rng, n, dims, ranks)
    f = oe.factorize(A, b, dims)
    L = oe.lambda_matrix(f)
    for k in range(len(dims)):
        resid = A.T @ L[:, k]
        assert np.linalg.norm(resid) < 1e-8, (k, np.linalg.norm(resid))
        # level-k block of lambda^k equals the optimal residual of level k
        sl = slice(sum(dims[:k]), sum(dims[: k + 1]))
        v = oe.residual(f)
        np.testing.assert_allclose(L[sl, k], v[sl], atol=1e-9)


def test_lambda_escande_chain():
    """Analytic multipliers of the Escande chain example
    (reference ``tests/lexlsi/lambda_test.m:7-15``):
    (x_1 = 1) > (2 x_2 = 1) > ... > (n x_n = 1) > (sum x_i = 1)
    lambda[:, n] = [-w, -w/2, ..., -w/n, w], w = sum(1/k for k=2..n)."""
    n = 5
    w = sum(1.0 / k for k in range(2, n + 1))
    A = np.zeros((n + 1, n))
    b = np.ones(n + 1)
    for k in range(n):
        A[k, k] = k + 1
    A[n, :] = 1.0
    dims = tuple([1] * (n + 1))
    f = oe.factorize(A, b, dims)
    L = oe.lambda_matrix(f)
    expected_last = np.array([-w / (k + 1) for k in range(n)] + [w])
    np.testing.assert_allclose(L[:, n], expected_last, atol=1e-10)


@pytest.mark.parametrize("seed", range(4))
def test_fixed_variables_vs_general_formulation(seed):
    """Metamorphic: fixing variables == an extra leading level with unit
    rows (reference MATLAB test ``fixed2general.m``)."""
    rng = np.random.default_rng(seed + 300)
    n = 9
    dims = (4, 3)
    A, b, dims, fixed_idx, fixed_val = gen.random_equality_hierarchy(
        rng, n, dims, fixed_variables=3
    )
    # formulation 1: fixed variables
    f1 = oe.factorize(A, b, dims, fixed_idx=fixed_idx, fixed_val=fixed_val)
    x1 = oe.solve_basic(f1)
    # formulation 2: leading level of unit-row equalities
    E = np.zeros((3, n))
    E[np.arange(3), fixed_idx] = 1.0
    A2 = np.concatenate([E, A], axis=0)
    b2 = np.concatenate([fixed_val, b])
    f2 = oe.factorize(A2, b2, (3,) + dims)
    x2 = oe.solve_basic(f2)

    np.testing.assert_allclose(x1[fixed_idx], fixed_val, atol=1e-12)
    v1 = level_residual_norms(A @ x1 - b, dims)
    v2 = level_residual_norms(A @ x2 - b, dims)
    np.testing.assert_allclose(v1, v2, atol=1e-8)


@pytest.mark.parametrize("seed", range(4))
def test_least_norm(seed):
    """Least-norm completion: same residuals as the basic solve, and
    minimal norm (== appending a terminal x=0 objective, cf. the reference
    MATLAB test ``append_terminal_objective.m``)."""
    rng = np.random.default_rng(seed + 400)
    n = 12
    dims = (3, 4)
    ranks = (2, 3)
    A, b, dims, _, _ = gen.random_equality_hierarchy(rng, n, dims, ranks)
    f = oe.factorize(A, b, dims)
    x_basic = oe.solve_basic(f)
    x_ln = oe.solve_least_norm(f)

    np.testing.assert_allclose(
        level_residual_norms(A @ x_ln - b, dims),
        level_residual_norms(A @ x_basic - b, dims),
        atol=1e-8,
    )

    # metamorphic: terminal objective x = 0 gives the least-norm solution
    A3 = np.concatenate([A, np.eye(n)], axis=0)
    b3 = np.concatenate([b, np.zeros(n)])
    f3 = oe.factorize(A3, b3, dims + (n,))
    x_term = oe.solve_basic(f3)
    np.testing.assert_allclose(x_ln, x_term, atol=1e-7)
    assert np.linalg.norm(x_ln) <= np.linalg.norm(x_basic) + 1e-10


def seq_lexls(A_list, b_list, mu, n):
    """Damped-sequence oracle, port of reference ``seq_lexls.m`` (with
    flag_basic=1): each stage pins previous levels via equalities and solves
    one damped LS level through the unregularized lexlse."""
    I = np.eye(n)
    z = np.zeros(n)
    # stage 1
    f = oe.factorize(np.concatenate([A_list[0], mu * I]),
                     np.concatenate([b_list[0], z]),
                     (A_list[0].shape[0] + n,))
    x = oe.solve_basic(f)
    for k in range(1, len(A_list)):
        C = np.concatenate(A_list[:k], axis=0)
        c = C @ x
        Ak, bk = A_list[k], b_list[k]
        A2 = np.concatenate([C, Ak, mu * I], axis=0)
        b2 = np.concatenate([c, bk, z])
        f = oe.factorize(A2, b2, (C.shape[0], Ak.shape[0] + n))
        x = oe.solve_basic(f)
        if k == len(A_list) - 1:  # basic re-solve
            A3 = np.concatenate([C, Ak], axis=0)
            b3 = np.concatenate([c, Ak @ x])
            f = oe.factorize(A3, b3, (C.shape[0], Ak.shape[0]))
            x = oe.solve_basic(f)
    return x


@pytest.mark.parametrize(
    "regtype",
    [
        RegularizationType.TIKHONOV,
        RegularizationType.TIKHONOV_1,
        RegularizationType.TIKHONOV_2,
        RegularizationType.TIKHONOV_CG,
        RegularizationType.R_NO_Z,
        RegularizationType.RT_NO_Z,
        RegularizationType.RT_NO_Z_CG,
        RegularizationType.R,
    ],
)
def test_regularization_smoke_and_damped_equivalence(regtype):
    """Tikhonov-regularized lexlse == sequence of damped LS problems
    (reference MATLAB test ``seq_lexls.m``), checked for the full-Z
    Tikhonov variants; other variants smoke-checked for finiteness and
    shrinkage of x."""
    rng = np.random.default_rng(7)
    n = 8
    dims = (3, 3)
    A, b, dims, _, _ = gen.random_equality_hierarchy(rng, n, dims, (2, 2))
    mu = 0.1
    params = ParametersLexLSE(regularization_type=regtype)
    f = oe.factorize(A, b, dims, params, regularization=np.array([mu, mu]))
    x = oe.solve_basic(f)
    assert np.all(np.isfinite(x))

    f0 = oe.factorize(A, b, dims)
    x0 = oe.solve_basic(f0)
    # damping shrinks the solution (generically)
    assert np.linalg.norm(x) < np.linalg.norm(x0) + 1e-9

    if regtype in (RegularizationType.TIKHONOV, RegularizationType.TIKHONOV_1,
                   RegularizationType.TIKHONOV_2, RegularizationType.TIKHONOV_CG):
        # damped-sequence oracle (reference MATLAB ``seq_lexls.m``):
        # stage 1: x = lexlse{[A1; mu I] x = [b1; 0]}
        # stage k: x = lexlse{ C x = C x_prev  >  [Ak; mu I] x = [bk; 0] }
        # with a final basic re-solve to compare basic solutions.
        x_seq = seq_lexls([A[:3], A[3:]], [b[:3], b[3:]], mu, n)
        atol = 1e-5 if regtype == RegularizationType.TIKHONOV_CG else 1e-8
        np.testing.assert_allclose(
            level_residual_norms(A @ x - b, dims),
            level_residual_norms(A @ x_seq - b, dims),
            atol=atol,
        )
        np.testing.assert_allclose(x, x_seq, atol=1e-4 if regtype == RegularizationType.TIKHONOV_CG else 1e-7)


def test_early_termination_columns_exhausted():
    """More total rank than variables: the factorization terminates early
    (reference ``lexlse.h:475-490``) and later levels get rank 0."""
    rng = np.random.default_rng(11)
    n = 4
    dims = (3, 3, 3)
    A = rng.standard_normal((9, n))
    b = rng.standard_normal(9)
    f = oe.factorize(A, b, dims)
    assert f.total_rank == n
    assert f.ranks[0] == 3 and f.ranks[1] == 1 and f.ranks[2] == 0
    x = oe.solve_basic(f)
    x2, v2 = gen.lex_solve_nullspace(A, b, dims)
    np.testing.assert_allclose(
        level_residual_norms(A @ x - b, dims),
        level_residual_norms(v2, dims),
        atol=1e-8,
    )


def test_all_variables_fixed():
    rng = np.random.default_rng(13)
    n = 5
    A = rng.standard_normal((3, n))
    b = rng.standard_normal(3)
    idx = np.arange(n)
    val = rng.standard_normal(n)
    f = oe.factorize(A, b, (3,), fixed_idx=idx, fixed_val=val)
    x = oe.solve_basic(f)
    np.testing.assert_allclose(x, val, atol=1e-12)
