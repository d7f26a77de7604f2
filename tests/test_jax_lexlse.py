"""JAX LexLSE vs the NumPy oracle: parity of ranks, solutions, residuals
and multipliers on rank-controlled random hierarchies."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lexls_tpu import lexlse as jl
from lexls_tpu.oracle import generate as gen
from lexls_tpu.oracle import lexlse as oe
from lexls_tpu.types import ParametersLexLSE, RegularizationType


def level_norms(v, dims):
    out, ofs = [], 0
    for d in dims:
        out.append(np.linalg.norm(v[ofs : ofs + d]))
        ofs += d
    return np.array(out)


# A small set of FIXED shapes (so XLA compiles each program once) with
# per-seed random data and random per-level ranks (rank deficiency comes
# from the data, not the shape).
SHAPES = [
    (10, (5, 6, 1)),
    (12, (4, 3, 5, 4)),
    (7, (9,)),
]


def make_problem(seed, with_fixed=False):
    n, dims = SHAPES[seed % len(SHAPES)]
    rng = np.random.default_rng(seed)
    ranks = [int(rng.integers(0, d + 1)) for d in dims]
    nf = 3 if with_fixed else 0
    A, b, dims, fixed_idx, fixed_val = gen.random_equality_hierarchy(
        rng, n, dims, ranks, fixed_variables=nf
    )
    return A, b, dims, fixed_idx, fixed_val


@functools.lru_cache(maxsize=None)
def _pipeline(dims, params):
    """One jitted program per (dims, params): factorize + all outputs."""

    @jax.jit
    def fn(A, b, fm, fv, regf):
        f = jl.factorize(A, b, dims, params, fixed_mask=fm, fixed_val=fv,
                         reg_factors=regf)
        lam_fixed, lam = jl.lambda_matrix(f, A_fixed_cols=A)
        return dict(
            x=jl.solve(f), x_ln=jl.solve_least_norm(f), v=jl.residual(f),
            ranks=f.ranks, first_col=f.first_col, total_rank=f.total_rank,
            perm=f.perm, lam=lam, lam_fixed=lam_fixed,
        )

    return fn


def run_jax(A, b, dims, fixed_idx=None, fixed_val=None,
            params=ParametersLexLSE(), reg=None):
    n = A.shape[1]
    fm = np.zeros(n, bool)
    fv = np.zeros(n)
    if fixed_idx is not None:
        fm[fixed_idx] = True
        fv[fixed_idx] = fixed_val
    regf = np.zeros(len(dims)) if reg is None else np.asarray(reg)
    out = _pipeline(tuple(dims), params)(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(fm), jnp.asarray(fv),
        jnp.asarray(regf),
    )
    return {k: np.array(v) for k, v in out.items()}


@pytest.mark.parametrize("seed", range(12))
def test_factorize_parity(seed):
    A, b, dims, _, _ = make_problem(seed)
    fo = oe.factorize(A, b, dims)
    r = run_jax(A, b, dims)

    np.testing.assert_array_equal(r["ranks"], fo.ranks)
    assert int(r["total_rank"]) == fo.total_rank
    np.testing.assert_array_equal(r["first_col"], fo.first_col)
    np.testing.assert_array_equal(r["perm"], fo.perm_cols)

    xo = oe.solve_basic(fo)
    # same pivoting order => identical basic solution (up to roundoff)
    np.testing.assert_allclose(r["x"], xo, atol=1e-9)

    vo = oe.residual(fo)
    np.testing.assert_allclose(r["v"], vo, atol=1e-9)
    np.testing.assert_allclose(r["v"], A @ r["x"] - b, atol=1e-8)


@pytest.mark.parametrize("seed", range(6))
def test_factorize_parity_fixed_variables(seed):
    A, b, dims, fixed_idx, fixed_val = make_problem(seed, with_fixed=True)
    fo = oe.factorize(A, b, dims, fixed_idx=fixed_idx, fixed_val=fixed_val)
    r = run_jax(A, b, dims, fixed_idx, fixed_val)

    np.testing.assert_array_equal(r["ranks"], fo.ranks)
    xo = oe.solve_basic(fo)
    np.testing.assert_allclose(r["x"][fixed_idx], fixed_val, atol=1e-12)
    np.testing.assert_allclose(
        level_norms(A @ r["x"] - b, dims), level_norms(A @ xo - b, dims), atol=1e-8
    )
    # multipliers: oracle fixed rows are in fixed order; jax is per-variable
    Lo = oe.lambda_matrix(fo)
    np.testing.assert_allclose(r["lam"], Lo[fo.n_fixed :, :], atol=1e-9)
    for j, vi in enumerate(fixed_idx):
        np.testing.assert_allclose(r["lam_fixed"][vi, :], Lo[j, :], atol=1e-9)


@pytest.mark.parametrize("seed", range(6))
def test_lambda_parity(seed):
    A, b, dims, _, _ = make_problem(seed)
    fo = oe.factorize(A, b, dims)
    r = run_jax(A, b, dims)
    Lo = oe.lambda_matrix(fo)
    np.testing.assert_allclose(r["lam"], Lo, atol=1e-9)


@pytest.mark.parametrize("seed", range(6))
def test_least_norm_parity(seed):
    A, b, dims, _, _ = make_problem(seed)
    fo = oe.factorize(A, b, dims)
    r = run_jax(A, b, dims)
    xo = oe.solve_least_norm(fo)
    np.testing.assert_allclose(r["x_ln"], xo, atol=1e-8)


def test_jit_and_vmap_consistency():
    """vmap of the factorize+solve pipeline must equal per-instance solves
    (same program, batched)."""
    dims = (3, 4, 5)
    n = 10
    batch = 8
    As, bs = [], []
    for i in range(batch):
        A, b, _, _, _ = gen.random_equality_hierarchy(
            np.random.default_rng(i), n, dims, (2, 3, 2)
        )
        As.append(A)
        bs.append(b)
    As = jnp.asarray(np.stack(As))
    bs = jnp.asarray(np.stack(bs))

    def pipeline(A, b):
        f = jl.factorize(A, b, dims)
        return jl.solve(f), jl.residual(f)

    jp = jax.jit(pipeline)
    single = [jp(As[i], bs[i]) for i in range(batch)]
    batched = jax.jit(jax.vmap(pipeline))(As, bs)
    for i in range(batch):
        np.testing.assert_allclose(np.array(batched[0][i]), np.array(single[i][0]),
                                   atol=1e-12)
        np.testing.assert_allclose(np.array(batched[1][i]), np.array(single[i][1]),
                                   atol=1e-12)


def test_zero_rows_do_not_perturb():
    """The masking theorem behind the active-set design: inserting zero rows
    (with zero rhs) must not change x or the surviving rows' residuals;
    masked rows get exactly zero residual and multipliers."""
    rng = np.random.default_rng(9)
    n = 8
    A, b, dims, _, _ = gen.random_equality_hierarchy(rng, n, (3, 4), (2, 3))
    r1 = run_jax(A, b, (3, 4))

    # interleave zero rows inside level 1
    A2 = np.concatenate([A[:3], np.zeros((2, n)), A[3:]], axis=0)
    b2 = np.concatenate([b[:3], np.zeros(2), b[3:]])
    r2 = run_jax(A2, b2, (5, 4))
    np.testing.assert_allclose(r2["x"], r1["x"], atol=1e-10)
    assert np.allclose(r2["v"][3:5], 0.0, atol=1e-12)
    assert np.allclose(r2["lam"][3:5, :], 0.0, atol=1e-12)


@pytest.mark.parametrize(
    "regtype",
    [
        RegularizationType.TIKHONOV,
        RegularizationType.TIKHONOV_1,
        RegularizationType.TIKHONOV_2,
        RegularizationType.TIKHONOV_CG,
        RegularizationType.R,
        RegularizationType.R_NO_Z,
        RegularizationType.RT_NO_Z,
        RegularizationType.RT_NO_Z_CG,
    ],
)
def test_regularization_parity(regtype):
    rng = np.random.default_rng(21)
    n = 8
    dims = (3, 3)
    A, b, dims, _, _ = gen.random_equality_hierarchy(rng, n, dims, (2, 2))
    mu = np.array([0.1, 0.2])
    params = ParametersLexLSE(regularization_type=regtype)
    fo = oe.factorize(A, b, dims, params, regularization=mu)
    r = run_jax(A, b, dims, params=params, reg=mu)
    xo = oe.solve_basic(fo)
    atol = 1e-6 if regtype in (RegularizationType.TIKHONOV_CG,
                               RegularizationType.RT_NO_Z_CG) else 1e-8
    np.testing.assert_allclose(r["x"], xo, atol=atol)


@pytest.mark.parametrize("eps", [0.5, 5.0])
def test_variable_regularization_parity(eps):
    """Conditioning-driven damping (``lexlse.h:277-312``): the effective
    factor depends on the level's conditioning estimate; JAX == oracle."""
    rng = np.random.default_rng(33)
    n = 8
    A, b, dims, _, _ = gen.random_equality_hierarchy(rng, n, (3, 3), (2, 2))
    mu = np.array([0.3, 0.4])
    params = ParametersLexLSE(
        regularization_type=RegularizationType.TIKHONOV,
        variable_regularization_factor=eps)
    fo = oe.factorize(A, b, dims, params, regularization=mu)
    r = run_jax(A, b, dims, params=params, reg=mu)
    xo = oe.solve_basic(fo)
    np.testing.assert_allclose(r["x"], xo, atol=1e-8)
    # with a huge epsilon the damping engages fully; result must differ
    # from the unregularized solve (sanity that the path is active)
    r0 = run_jax(A, b, dims, params=ParametersLexLSE(), reg=None)
    if eps > 1.0:
        assert np.abs(r["x"] - r0["x"]).max() > 1e-10


@pytest.mark.parametrize("seed", range(6))
def test_factorize_fast_equivalence(seed):
    """factorize_fast (virtual permutation) must reproduce factorize
    (physical swaps) exactly: same permutation, ranks, staircase, and
    downstream solutions/multipliers."""
    with_fixed = seed % 2 == 1
    A, b, dims, fi, fv = make_problem(seed, with_fixed=with_fixed)
    n = A.shape[1]
    fm = np.zeros(n, bool); fvv = np.zeros(n)
    if fi is not None:
        fm[fi] = True; fvv[fi] = fv

    @jax.jit
    def both(A, b, fm, fv):
        f1 = jl.factorize(A, b, tuple(dims), ParametersLexLSE(),
                          fixed_mask=fm, fixed_val=fv)
        f2 = jl.factorize_fast(A, b, tuple(dims), ParametersLexLSE(),
                               fixed_mask=fm, fixed_val=fv)
        return f1, f2

    f1, f2 = both(jnp.asarray(A), jnp.asarray(b), jnp.asarray(fm), jnp.asarray(fvv))
    np.testing.assert_array_equal(np.asarray(f1.perm), np.asarray(f2.perm))
    np.testing.assert_array_equal(np.asarray(f1.ranks), np.asarray(f2.ranks))
    np.testing.assert_array_equal(np.asarray(f1.rank_row), np.asarray(f2.rank_row))
    assert int(f1.total_rank) == int(f2.total_rank)
    np.testing.assert_allclose(np.asarray(f1.lod), np.asarray(f2.lod),
                               atol=1e-13, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(f1.hh), np.asarray(f2.hh), atol=1e-14)
    np.testing.assert_allclose(np.asarray(jl.solve(f1)), np.asarray(jl.solve(f2)),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(jl.residual(f1)),
                               np.asarray(jl.residual(f2)), atol=1e-12)


@pytest.mark.parametrize(
    "regtype",
    [
        RegularizationType.TIKHONOV,
        RegularizationType.TIKHONOV_2,
        RegularizationType.TIKHONOV_CG,
        RegularizationType.R,
        RegularizationType.R_NO_Z,
        RegularizationType.RT_NO_Z,
        RegularizationType.RT_NO_Z_CG,
    ],
)
@pytest.mark.parametrize("var_eps", [0.0, 5.0])
def test_factorize_fast_regularized_equivalence(regtype, var_eps):
    """The fast tier must reproduce the physical tier bit-for-bit with
    regularization enabled (the regularizers see the same position-space
    level view either way), including the accumulated nullspace and the
    downstream solves."""
    rng = np.random.default_rng(57)
    A, b, dims, _, _ = gen.random_equality_hierarchy(rng, 9, (4, 3, 3),
                                                     (3, 2, 2))
    mu = jnp.asarray(np.array([0.1, 0.25, 0.15]))
    params = ParametersLexLSE(regularization_type=regtype,
                              variable_regularization_factor=var_eps)

    @jax.jit
    def both(A, b, mu):
        f1 = jl.factorize(A, b, tuple(dims), params, reg_factors=mu)
        f2 = jl.factorize_fast(A, b, tuple(dims), params, reg_factors=mu)
        return f1, f2

    f1, f2 = both(jnp.asarray(A), jnp.asarray(b), mu)
    np.testing.assert_array_equal(np.asarray(f1.perm), np.asarray(f2.perm))
    np.testing.assert_array_equal(np.asarray(f1.ranks), np.asarray(f2.ranks))
    np.testing.assert_allclose(np.asarray(f1.lod), np.asarray(f2.lod),
                               atol=1e-12, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f1.null_space),
                               np.asarray(f2.null_space), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jl.solve(f1)),
                               np.asarray(jl.solve(f2)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jl.residual(f1)),
                               np.asarray(jl.residual(f2)), atol=1e-12)
