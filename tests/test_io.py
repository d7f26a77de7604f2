"""Corpus I/O tests: native C++ loader vs Python parser, roundtrip, and
the test_01.dat regression (reference ``tests/test_01.dat`` — an 88-var,
5-level robotics hierarchy with a simple-bounds level and an active-set
guess; BASELINE parity criterion: residual norms to 1e-8)."""

import os
import tempfile

import numpy as np
import pytest

import lexls_tpu.lexlsi as jli
from lexls_tpu import types as T
from lexls_tpu.io import load_dat, load_dat_python, native_available, save_dat
from lexls_tpu.io.dat import (
    HIER_INEQUALITIES_WITH_AS,
    from_inequality,
    to_inequality,
)
from lexls_tpu.oracle import generate as gen
from lexls_tpu.oracle import lexlsi as oli

TEST_01 = "/root/reference/tests/test_01.dat"
HAVE_CORPUS = os.path.exists(TEST_01)


@pytest.mark.skipif(not HAVE_CORPUS, reason="reference corpus not mounted")
def test_parse_test01_header():
    d = load_dat_python(TEST_01)
    assert d.hier_type == HIER_INEQUALITIES_WITH_AS
    assert d.n_var == 88
    assert d.dims == (74, 33, 3, 2, 97)
    assert list(d.obj_type) == [100, 200, 200, 200, 200]
    assert d.active_set_guess is not None


@pytest.mark.skipif(not HAVE_CORPUS, reason="reference corpus not mounted")
def test_native_matches_python():
    if not native_available():
        pytest.skip("native loader unavailable")
    a = load_dat(TEST_01)
    b = load_dat_python(TEST_01)
    assert a.hier_type == b.hier_type and a.n_var == b.n_var
    for x, y in zip(a.objectives, b.objectives):
        np.testing.assert_array_equal(x, y)
    for x, y in zip(a.active_set_guess, b.active_set_guess):
        np.testing.assert_array_equal(x, y)


def test_roundtrip_random():
    rng = np.random.default_rng(0)
    prob = gen.random_inequality_hierarchy(rng, 6, [3, 4], simple_bounds=True)
    guess = np.zeros(prob.n_ctr, dtype=np.int64)
    guess[1] = int(T.CtrType.ACTIVE_UB)
    d = from_inequality(prob, active_set_guess=guess,
                        solution_guess=rng.standard_normal(6))
    path = tempfile.mktemp(suffix=".dat")
    try:
        save_dat(path, d)
        d2 = load_dat_python(path)
        prob2 = to_inequality(d2)
        np.testing.assert_allclose(prob2.A, prob.A)
        np.testing.assert_allclose(prob2.lb, prob.lb)
        np.testing.assert_allclose(prob2.ub, prob.ub)
        np.testing.assert_array_equal(prob2.var_idx, prob.var_idx)
        np.testing.assert_array_equal(d2.active_guess_stacked(), guess)
        np.testing.assert_allclose(d2.solution_guess, d.solution_guess)
        if native_available():
            d3 = load_dat(path)
            np.testing.assert_array_equal(d3.objectives[0], d2.objectives[0])
    finally:
        os.remove(path)


def _level_norms(v, dims):
    out, ofs = [], 0
    for d in dims:
        out.append(np.linalg.norm(v[ofs : ofs + d]))
        ofs += d
    return np.array(out)


@pytest.mark.skipif(not HAVE_CORPUS, reason="reference corpus not mounted")
def test_solve_test01_parity():
    """Residual-norm parity JAX vs oracle on the regression instance, and
    the warm-start design point: the corpus guess converges in 1 iter."""
    d = load_dat(TEST_01)
    prob = to_inequality(d)
    params = T.ParametersLexLSI()

    ores = oli.solve(prob, params)
    jres = jli.solve(prob, params)
    assert ores.status == T.TerminationStatus.PROBLEM_SOLVED
    assert jres.status == T.TerminationStatus.PROBLEM_SOLVED
    on = _level_norms(ores.v, prob.dims)
    jn = _level_norms(jres.v, prob.dims)
    np.testing.assert_allclose(jn, on, atol=1e-8)
    np.testing.assert_allclose(jres.x, ores.x, atol=1e-8)

    jwarm = jli.solve(prob, params, active_guess=d.active_guess_stacked(),
                      x0=d.solution_guess)
    assert jwarm.status == T.TerminationStatus.PROBLEM_SOLVED
    assert jwarm.n_iterations == 1
    np.testing.assert_allclose(_level_norms(jwarm.v, prob.dims), on, atol=1e-8)


def test_equality_corpus_roundtrip():
    """Equality (#HierType 100) corpus: write, parse (both parsers),
    convert with a simple-bounds first level -> fixed variables, solve."""
    from lexls_tpu.io.dat import (
        HIER_EQUALITIES, OBJ_GENERAL, OBJ_SIMPLE, DatHierarchy, to_equality,
    )
    from lexls_tpu.api import LexLSE

    rng = np.random.default_rng(3)
    n = 6
    A1 = rng.standard_normal((3, n)); b1 = rng.standard_normal(3)
    A2 = rng.standard_normal((2, n)); b2 = rng.standard_normal(2)
    # level 0: fix variables 2 and 5 (stored 1-based in the file)
    d = DatHierarchy(
        hier_type=HIER_EQUALITIES, n_var=n,
        objectives=[
            np.array([[3.0, 0.7], [6.0, -0.2]]),
            np.column_stack([A1, b1]),
            np.column_stack([A2, b2]),
        ],
        obj_type=np.array([OBJ_SIMPLE, OBJ_GENERAL, OBJ_GENERAL]),
    )
    path = tempfile.mktemp(suffix=".dat")
    try:
        save_dat(path, d)
        d2 = load_dat_python(path)
        assert d2.hier_type == HIER_EQUALITIES
        prob = to_equality(d2)
        assert prob.n_fixed == 2
        np.testing.assert_array_equal(prob.fixed_idx, [2, 5])
        res = LexLSE(prob).solve(solve_option=0)
        np.testing.assert_allclose(res.x[[2, 5]], [0.7, -0.2], atol=1e-12)
        # level-1 residual must be lexicographically optimal given the fixes
        free = [i for i in range(n) if i not in (2, 5)]
        x_ls = np.linalg.lstsq(A1[:, free], b1 - A1[:, [2, 5]] @ [0.7, -0.2],
                               rcond=None)[0]
        np.testing.assert_allclose(
            np.linalg.norm(A1[:, free] @ x_ls - (b1 - A1[:, [2, 5]] @ [0.7, -0.2])),
            np.linalg.norm(res.v[0:3]), atol=1e-9)
        if native_available():
            d3 = load_dat(path)
            np.testing.assert_array_equal(d3.objectives[1], d2.objectives[1])
    finally:
        os.remove(path)
