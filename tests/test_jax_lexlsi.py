"""Parity tests: JAX LexLSI (active-set while_loop) vs the NumPy oracle.

The oracle itself is validated against brute-force SVD lexicographic LS
and analytic multipliers in test_oracle_lexlsi.py; here we require the
jitted solver to reproduce the oracle's active-set *trajectory* (final
working set, counters, log) and its solution to tight tolerances.
"""

import numpy as np
import pytest

import lexls_tpu.lexlsi as jli
from lexls_tpu import types as T
from lexls_tpu.oracle import generate as gen
from lexls_tpu.oracle import lexlsi as oli


def _compare(prob, params=None, x0=None, v0=None, active_guess=None,
             check_counters=True, tol=1e-8):
    params = params or T.ParametersLexLSI()
    ores = oli.solve(prob, params, x0=x0, v0=v0, active_guess=active_guess)
    jres = jli.solve(prob, params, x0=x0, v0=v0, active_guess=active_guess)

    assert jres.status == ores.status, (jres.status, ores.status)
    np.testing.assert_array_equal(jres.ctr_type, ores.ctr_type)
    if check_counters:
        assert jres.n_iterations == ores.n_iterations
        assert jres.n_activations == ores.n_activations
        assert jres.n_deactivations == ores.n_deactivations
        assert jres.n_factorizations == ores.n_factorizations
    np.testing.assert_allclose(jres.x, ores.x, atol=tol, rtol=tol)
    np.testing.assert_allclose(jres.v, ores.v, atol=tol, rtol=tol)
    return jres, ores


@pytest.mark.parametrize("seed", range(8))
def test_general_parity(seed):
    rng = np.random.default_rng(seed)
    prob = gen.random_inequality_hierarchy(rng, 8, [4, 3, 3])
    _compare(prob)


@pytest.mark.parametrize("seed", range(8))
def test_rank_deficient_parity(seed):
    rng = np.random.default_rng(100 + seed)
    prob = gen.random_inequality_hierarchy(rng, 10, [5, 4, 4], ranks=[3, 2, 2])
    _compare(prob)


@pytest.mark.parametrize("seed", range(6))
def test_simple_bounds_parity(seed):
    rng = np.random.default_rng(200 + seed)
    prob = gen.random_inequality_hierarchy(rng, 8, [4, 4, 3], simple_bounds=True)
    _compare(prob)


@pytest.mark.parametrize("seed", range(4))
def test_deactivate_first_wrong_sign(seed):
    rng = np.random.default_rng(300 + seed)
    prob = gen.random_inequality_hierarchy(rng, 8, [4, 3, 3])
    _compare(prob, params=T.ParametersLexLSI(deactivate_first_wrong_sign=True))


@pytest.mark.parametrize("seed", range(4))
def test_warm_start_parity(seed):
    """Cold solve -> reuse the final active set + x as the next guess."""
    rng = np.random.default_rng(400 + seed)
    prob = gen.random_inequality_hierarchy(rng, 8, [4, 3, 3])
    params = T.ParametersLexLSI()
    cold = oli.solve(prob, params)

    # perturb the problem slightly (IK-sequence style)
    prob2 = T.InequalityHierarchy(
        A=prob.A + 1e-3 * rng.standard_normal(prob.A.shape),
        lb=prob.lb, ub=prob.ub, dims=prob.dims, n_var=prob.n_var,
        simple_bounds=prob.simple_bounds, var_idx=prob.var_idx,
    )
    guess = np.where(cold.ctr_type == int(T.CtrType.ACTIVE_EQ),
                     int(T.CtrType.INACTIVE), cold.ctr_type)
    jres, ores = _compare(prob2, params, x0=cold.x.copy(), active_guess=guess)
    # warm start should converge in very few iterations
    assert jres.n_iterations <= 6


@pytest.mark.parametrize("seed", range(3))
def test_hot_start_repair_flags(seed):
    rng = np.random.default_rng(500 + seed)
    prob = gen.random_inequality_hierarchy(rng, 8, [4, 3, 3])
    params = T.ParametersLexLSI(
        modify_type_active_enabled=True, modify_type_inactive_enabled=True)
    x0 = rng.standard_normal(prob.n_var)
    # a deliberately wrong active-set guess to repair
    guess = np.zeros(prob.n_ctr, dtype=np.int64)
    guess[:: 3] = int(T.CtrType.ACTIVE_UB)
    _compare(prob, params, x0=x0, active_guess=guess)


@pytest.mark.parametrize("seed", range(3))
def test_phase1_v0(seed):
    rng = np.random.default_rng(600 + seed)
    prob = gen.random_inequality_hierarchy(rng, 8, [4, 3, 3])
    params = T.ParametersLexLSI(use_phase1_v0=True)
    x0 = rng.standard_normal(prob.n_var)
    _compare(prob, params, x0=x0)


def test_equalities_auto_activated():
    rng = np.random.default_rng(7)
    prob = gen.random_inequality_hierarchy(rng, 6, [3, 3], equality_fraction=0.9)
    jres, ores = _compare(prob)
    eq = np.abs(prob.lb - prob.ub) < 1e-15
    assert np.all(jres.ctr_type[eq] == int(T.CtrType.ACTIVE_EQ))


def test_working_set_log_parity():
    rng = np.random.default_rng(11)
    prob = gen.random_inequality_hierarchy(rng, 8, [4, 3, 3])
    params = T.ParametersLexLSI(log_working_set_enabled=True)
    jres, ores = _compare(prob, params)
    assert len(jres.working_set_log) == len(ores.working_set_log)
    for a, b in zip(jres.working_set_log, ores.working_set_log):
        assert (a.obj_index, a.ctr_index, a.ctr_type) == (
            b.obj_index, b.ctr_index, b.ctr_type)
        assert a.rank == b.rank
        np.testing.assert_allclose(a.alpha_or_lambda, b.alpha_or_lambda,
                                   atol=1e-9, rtol=1e-9)


def test_lambda_parity():
    rng = np.random.default_rng(13)
    prob = gen.random_inequality_hierarchy(rng, 8, [4, 3, 3])
    params = T.ParametersLexLSI()
    ores = oli.solve(prob, params)
    jres = jli.solve(prob, params)
    s = oli._OracleLexLSI(prob, params)
    s.ctr_type = ores.ctr_type.copy()
    s.lb, s.ub = ores.lb, ores.ub
    olam = s.get_lambda()
    jlam = jli.solve_lambda(prob, jres, params)
    np.testing.assert_allclose(jlam, olam, atol=1e-9, rtol=1e-9)


def test_max_factorizations_budget():
    rng = np.random.default_rng(17)
    prob = gen.random_inequality_hierarchy(rng, 8, [4, 3, 3])
    params = T.ParametersLexLSI(max_number_of_factorizations=2)
    jres, ores = _compare(prob, params, check_counters=True, tol=1e-8)
    if ores.status == T.TerminationStatus.MAX_NUMBER_OF_FACTORIZATIONS_EXCEEDED:
        assert jres.status == ores.status


def test_kkt_optimality():
    """Independent check: residual norms are lexicographically optimal
    (cross-validated against brute-force on the final equality problem)."""
    rng = np.random.default_rng(19)
    prob = gen.random_inequality_hierarchy(rng, 8, [4, 3, 3])
    jres = jli.solve(prob)
    # feasibility of inactive constraints
    Ax = prob.A @ jres.x
    inact = jres.ctr_type == int(T.CtrType.INACTIVE)
    assert np.all(Ax[inact] >= prob.lb[inact] - 1e-8)
    assert np.all(Ax[inact] <= prob.ub[inact] + 1e-8)
    # the solver's v matches direct violation recomputation on active rows
    rhs = np.where(jres.ctr_type == int(T.CtrType.ACTIVE_LB), prob.lb, prob.ub)
    act = jres.ctr_type != int(T.CtrType.INACTIVE)
    np.testing.assert_allclose((Ax - rhs)[act], jres.v[act], atol=1e-8)


def test_iteration_trace():
    """Per-iteration trace: alpha/op/row recorded; x trajectory ends at
    the solution; v snapshots match x snapshots' violations on active rows."""
    rng = np.random.default_rng(23)
    prob = gen.random_inequality_hierarchy(rng, 8, [4, 3, 3])
    params = T.ParametersLexLSI(trace_enabled=True)
    jres = jli.solve(prob, params)
    tr = jres.trace()
    k = jres.n_iterations
    assert tr["x"].shape == (k, prob.n_var)
    np.testing.assert_allclose(tr["x"][-1], jres.x, atol=1e-12)
    np.testing.assert_allclose(tr["v"][-1], jres.v, atol=1e-12)
    assert np.all((tr["alpha"] >= 0) & (tr["alpha"] <= 1))
    # ADD operations carry the activated row
    adds = tr["op"] == int(T.OperationType.ADD)
    assert np.all(tr["row"][adds] >= 0)
    assert jres.n_activations == int(adds.sum())

    # disabled trace raises
    jres2 = jli.solve(prob, T.ParametersLexLSI())
    import pytest as _pytest
    with _pytest.raises(T.LexLSError):
        jres2.trace()


def test_analytic_lambda_escande_chain():
    """The Escande chain (reference ``lambda_test.m:7-15``): hierarchy
    (x_1=1) > (2 x_2=1) > ... > (n x_n=1) > (sum x_i = 1) has closed-form
    multipliers: lambda[:, n] = [-w, -w/2, ..., -w/n, w], w = sum 1/k for
    k=2..n; all other columns zero."""
    n = 5
    w = float(np.sum(1.0 / np.arange(2, n + 1)))
    objectives = []
    for k in range(n):
        a = np.zeros((1, n))
        a[0, k] = k + 1
        objectives.append((a, np.ones(1), np.ones(1)))
    objectives.append((np.ones((1, n)), np.ones(1), np.ones(1)))
    prob = T.build_general_hierarchy(objectives)

    jres = jli.solve(prob)
    assert jres.status == T.TerminationStatus.PROBLEM_SOLVED
    lam = jli.solve_lambda(prob, jres)

    expected = np.zeros((n + 1, n + 1))
    expected[n, n] = w
    for k in range(n):
        expected[k, n] = -w / (k + 1)
    np.testing.assert_allclose(lam, expected, atol=1e-9)

    # the oracle agrees
    ores, olam = oli.solve_with_lambda(prob)
    np.testing.assert_allclose(olam, expected, atol=1e-9)


def test_working_set_log_replay():
    """Replaying the full working-set log reconstructs the final working
    set, and solving with it pinned reproduces the solver's x/v
    (reference wset_get.m / wset_solve.m workflow)."""
    from lexls_tpu import wset

    rng = np.random.default_rng(29)
    prob = gen.random_inequality_hierarchy(rng, 8, [4, 3, 3])
    params = T.ParametersLexLSI(log_working_set_enabled=True)
    res = jli.solve(prob, params)

    ct = wset.replay_working_set(prob, res.working_set_log)
    np.testing.assert_array_equal(ct, res.ctr_type)

    x, v = wset.solve_with_working_set(prob, ct, params)
    np.testing.assert_allclose(x, res.x, atol=1e-9)
    act = res.ctr_type != 0
    np.testing.assert_allclose(v[act], res.v[act], atol=1e-8)

    # intermediate replay: working set after half the log entries is a
    # valid prefix state (types only from logged rows)
    half = len(res.working_set_log) // 2
    ct_half = wset.replay_working_set(prob, res.working_set_log, upto=half)
    assert ct_half.shape == res.ctr_type.shape


@pytest.mark.parametrize("seed", range(2))
def test_deep_hierarchy_with_regularization(seed):
    """BASELINE config 3: deep (6-level) rank-deficient hierarchy with
    Tikhonov regularization enabled — parity vs the oracle."""
    rng = np.random.default_rng(900 + seed)
    prob = gen.random_inequality_hierarchy(
        rng, 12, [4, 3, 3, 3, 2, 2], ranks=[3, 2, 2, 1, 1, 1])
    prob.regularization = np.full(6, 0.05)
    params = T.ParametersLexLSI(
        regularization_type=T.RegularizationType.TIKHONOV)
    _compare(prob, params, tol=1e-7)


@pytest.mark.parametrize("shape", [
    (1, [2]),           # single variable
    (6, [4]),           # single level
    (4, [8, 6]),        # more constraints than variables
    (12, [2, 2]),       # far fewer constraints than variables
])
def test_shape_edge_cases(shape):
    n, dims = shape
    rng = np.random.default_rng(hash(tuple(dims)) % 2**31)
    prob = gen.random_inequality_hierarchy(rng, n, dims)
    _compare(prob)


def test_all_equality_level():
    rng = np.random.default_rng(41)
    prob = gen.random_inequality_hierarchy(rng, 6, [3, 3], equality_fraction=1.0)
    jres, ores = _compare(prob)
    assert np.all(jres.ctr_type[np.abs(prob.lb - prob.ub) < 1e-15]
                  == int(T.CtrType.ACTIVE_EQ))


def test_float32_solver_robustness():
    """The f32 throughput tier (TPU dtype) with f32-scaled tolerances:
    solves converge and satisfy feasibility/optimality at f32 precision,
    including under rank deficiency."""
    import jax.numpy as jnp

    f32_params = T.ParametersLexLSI(
        max_number_of_factorizations=64,
        tol_linear_dependence=1e-7, tol_wrong_sign_lambda=1e-4,
        tol_correct_sign_lambda=1e-6, tol_feasibility=1e-5)
    for seed, ranks in [(1, None), (2, [3, 2, 2])]:
        rng = np.random.default_rng(1000 + seed)
        prob = gen.random_inequality_hierarchy(rng, 10, [5, 4, 4], ranks=ranks)
        struct = jli.Structure.of(prob)
        ct0, st0, ns0 = jli.initial_activation(prob)
        st = jli.solve_core(
            jnp.asarray(prob.A, jnp.float32), jnp.asarray(prob.lb, jnp.float32),
            jnp.asarray(prob.ub, jnp.float32),
            jnp.asarray(ct0), jnp.asarray(st0), jnp.asarray(ns0),
            jnp.zeros(10, jnp.float32), jnp.zeros(prob.n_ctr, jnp.float32),
            jnp.asarray(prob.regularization, jnp.float32),
            struct=struct, params=f32_params,
            x_guess_specified=False, v0_specified=False)
        assert int(st.status) == int(T.TerminationStatus.PROBLEM_SOLVED), seed
        x = np.asarray(st.x, np.float64)
        Ax = prob.A @ x
        inact = np.asarray(st.ctr_type) == 0
        assert np.all(Ax[inact] >= prob.lb[inact] - 1e-4)
        assert np.all(Ax[inact] <= prob.ub[inact] + 1e-4)
        # f32 solution close to the f64 oracle solution
        ores = oli.solve(prob)
        np.testing.assert_allclose(x, ores.x, atol=5e-3)
