"""Validate the NumPy active-set oracle against optimality conditions and
metamorphic equivalences."""

import numpy as np
import pytest

from lexls_tpu.oracle import generate as gen
from lexls_tpu.oracle import lexlse as oe
from lexls_tpu.oracle import lexlsi as oi
from lexls_tpu.types import (
    CtrType,
    InequalityHierarchy,
    ParametersLexLSI,
    TerminationStatus,
    build_general_hierarchy,
)


def level_residual_norms(v, dims):
    out = []
    ofs = 0
    for d in dims:
        out.append(np.linalg.norm(v[ofs : ofs + d]))
        ofs += d
    return np.array(out)


def check_kkt(prob: InequalityHierarchy, res: oi.LexLSIResult, lam: np.ndarray,
              tol=1e-7):
    """Lexicographic KKT conditions at the reported solution.

    (a) consistency of v: active rows have v = Ax - bound; inactive rows
        satisfy their bounds with v ~ 0 (use possibly-relaxed bounds).
    (b) stationarity: for each level k, sum_i A_i^T lambda_i^k = 0.
    (c) sign: for each active non-EQ row, the first significant multiplier
        (scanning objectives in priority order) has the correct sign.
    """
    A, lb, ub = prob.A, res.lb, res.ub
    x, v, ct = res.x, res.v, res.ctr_type
    Ax = A @ x
    m = prob.n_ctr

    for i in range(m):
        t = ct[i]
        if t == int(CtrType.ACTIVE_LB):
            assert abs(v[i] - (Ax[i] - lb[i])) < tol, i
        elif t in (int(CtrType.ACTIVE_UB), int(CtrType.ACTIVE_EQ)):
            assert abs(v[i] - (Ax[i] - ub[i])) < tol, i
        else:
            assert v[i] == pytest.approx(0.0, abs=tol), (i, v[i])
            assert lb[i] - 1e-6 <= Ax[i] <= ub[i] + 1e-6, (i, lb[i], Ax[i], ub[i])

    for k in range(prob.n_obj):
        stat = A.T @ lam[:, k]
        assert np.linalg.norm(stat) < 1e-6, (k, np.linalg.norm(stat))

    for i in range(m):
        t = ct[i]
        if t not in (int(CtrType.ACTIVE_LB), int(CtrType.ACTIVE_UB)):
            continue
        sign = -1.0 if t == int(CtrType.ACTIVE_LB) else 1.0
        for k in range(prob.n_obj):
            a = sign * lam[i, k]
            if abs(a) > 1e-7:
                assert a > 0, (i, k, lam[i, k], t)
                break


@pytest.mark.parametrize("seed", range(10))
def test_random_inequality_kkt(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 12))
    n_obj = int(rng.integers(1, 4))
    dims = [int(rng.integers(1, 6)) for _ in range(n_obj)]
    prob = gen.random_inequality_hierarchy(rng, n, dims)
    s = oi._OracleLexLSI(prob)
    res = s.solve()
    assert res.status == TerminationStatus.PROBLEM_SOLVED
    lam = s.get_lambda()
    check_kkt(prob, res, lam)


@pytest.mark.parametrize("seed", range(6))
def test_random_simple_bounds_kkt(seed):
    rng = np.random.default_rng(seed + 50)
    n = int(rng.integers(5, 12))
    dims = [int(rng.integers(1, n))] + [int(rng.integers(1, 6)) for _ in range(2)]
    prob = gen.random_inequality_hierarchy(rng, n, dims, simple_bounds=True)
    s = oi._OracleLexLSI(prob)
    res = s.solve()
    assert res.status == TerminationStatus.PROBLEM_SOLVED
    lam = s.get_lambda()
    check_kkt(prob, res, lam)


@pytest.mark.parametrize("seed", range(6))
def test_equality_only_equals_lexlse(seed):
    """lb == ub everywhere: lexlsi must reproduce the plain lexlse solve
    in one factorization."""
    rng = np.random.default_rng(seed + 100)
    n = 10
    dims = (3, 4, 5)
    ranks = (2, 3, 2)
    A, b, dims, _, _ = gen.random_equality_hierarchy(rng, n, dims, ranks)
    prob = build_general_hierarchy(
        [(A[:3], b[:3], b[:3]), (A[3:7], b[3:7], b[3:7]), (A[7:], b[7:], b[7:])]
    )
    res = oi.solve(prob)
    assert res.status == TerminationStatus.PROBLEM_SOLVED
    f = oe.factorize(A, b, dims)
    x_e = oe.solve_basic(f)
    np.testing.assert_allclose(
        level_residual_norms(A @ res.x - b, dims),
        level_residual_norms(A @ x_e - b, dims),
        atol=1e-9,
    )
    assert res.n_factorizations == 1


def test_one_level_box_ls():
    """Single level, full-rank: lexlsi == box-constrained least distance.

    min_x sum dist(a_i x, [lb_i, ub_i])^2 — cross-checked with a projected
    gradient method."""
    rng = np.random.default_rng(7)
    n, m = 4, 8
    A = rng.standard_normal((m, n))
    c = A @ rng.standard_normal(n)
    lb = c - np.abs(rng.standard_normal(m)) * 0.1
    ub = lb + np.abs(rng.standard_normal(m)) * 0.05
    prob = build_general_hierarchy([(A, lb, ub)])
    res = oi.solve(prob)
    assert res.status == TerminationStatus.PROBLEM_SOLVED

    def g(x):
        Ax = A @ x
        return 0.5 * np.sum(np.maximum(Ax - ub, 0) ** 2 + np.minimum(Ax - lb, 0) ** 2)

    def grad(x):
        Ax = A @ x
        r = np.maximum(Ax - ub, 0) + np.minimum(Ax - lb, 0)
        return A.T @ r

    x = np.zeros(n)
    for _ in range(20000):
        x -= 0.01 * grad(x)
    assert g(res.x) <= g(x) + 1e-8
    assert abs(g(res.x) - g(x)) < 1e-6


@pytest.mark.parametrize("seed", range(4))
def test_warm_start_reduces_iterations(seed):
    """Warm starting with the final active set of a nearby problem must
    converge (and typically in ~1 factorization)."""
    rng = np.random.default_rng(seed + 200)
    n = 8
    dims = [4, 4]
    prob = gen.random_inequality_hierarchy(rng, n, dims)
    res1 = oi.solve(prob)
    assert res1.status == TerminationStatus.PROBLEM_SOLVED

    # perturb the bounds slightly: same active set expected
    prob2 = InequalityHierarchy(
        A=prob.A, lb=prob.lb - 1e-6, ub=prob.ub + 1e-6, dims=prob.dims,
        n_var=prob.n_var,
    )
    guess = res1.ctr_type.copy()
    guess[guess == int(CtrType.ACTIVE_EQ)] = int(CtrType.INACTIVE)
    res2 = oi.solve(prob2, x0=res1.x, active_guess=guess)
    assert res2.status == TerminationStatus.PROBLEM_SOLVED
    assert res2.n_factorizations <= res1.n_factorizations


@pytest.mark.parametrize("first", [False, True])
def test_deactivation_strategies_agree_on_optimum(first):
    rng = np.random.default_rng(42)
    n = 8
    prob = gen.random_inequality_hierarchy(rng, n, [5, 4])
    params = ParametersLexLSI(deactivate_first_wrong_sign=first)
    res = oi.solve(prob, params)
    assert res.status == TerminationStatus.PROBLEM_SOLVED
    base = oi.solve(prob)
    np.testing.assert_allclose(
        level_residual_norms(res.v, prob.dims),
        level_residual_norms(base.v, prob.dims),
        atol=1e-8,
    )


def test_infeasible_level_gets_nonzero_violation():
    """Conflicting constraints at one level: violation is minimized, not
    eliminated; lower levels still optimized in the leftover freedom."""
    A = np.array([[1.0, 0.0], [1.0, 0.0]])
    lb = np.array([1.0, -2.0])
    ub = np.array([2.0, -1.0])  # x0 >= 1 and x0 <= -1: conflict
    A2 = np.array([[0.0, 1.0]])
    prob = build_general_hierarchy([(A, lb, ub), (A2, np.array([3.0]), np.array([3.0]))])
    res = oi.solve(prob)
    assert res.status == TerminationStatus.PROBLEM_SOLVED
    # optimal compromise: x0 = 0 (equidistant), each violation = 1
    assert abs(res.x[0]) < 1e-9
    assert abs(res.x[1] - 3.0) < 1e-9
    np.testing.assert_allclose(np.abs(res.v[:2]), [1.0, 1.0], atol=1e-9)


def test_max_factorizations_budget():
    rng = np.random.default_rng(3)
    prob = gen.random_inequality_hierarchy(rng, 10, [6, 6])
    params = ParametersLexLSI(max_number_of_factorizations=1)
    res = oi.solve(prob, params)
    assert res.status in (
        TerminationStatus.MAX_NUMBER_OF_FACTORIZATIONS_EXCEEDED,
        TerminationStatus.PROBLEM_SOLVED,
    )


def test_working_set_log():
    rng = np.random.default_rng(5)
    prob = gen.random_inequality_hierarchy(rng, 8, [5, 4])
    params = ParametersLexLSI(log_working_set_enabled=True)
    res = oi.solve(prob, params)
    assert res.status == TerminationStatus.PROBLEM_SOLVED
    assert len(res.working_set_log) == res.n_activations + res.n_deactivations
