"""Per-level regularization of the l-QR (JAX, masked static-shape).

TPU-native counterpart of the reference regularization suite
(``lexlse.h:1700-2694``): each variant replaces the RHS segment of the
current level by [R_k, T_k] y* where y* solves a damped subproblem over
the remaining variables (optionally coupled through the accumulated
nullspace basis S_{k-1}).

Static-shape strategy: subproblems are padded to n x n with identity
extension and solved with one Cholesky (or CGLS with a fixed trip count);
masks realize the data-dependent rank/remaining-column split.

Interface note: every function operates on ``level_rows`` — the (K, n+1)
POSITION-SPACE view of the level's first K rows ([R | T | rhs] plus
Householder essentials below the staircase).  The physical-swap
factorization passes its LOD slice directly (its columns are already in
position order); the virtual-permutation tier gathers the view once per
level through ``col_at`` — regularization only ever *writes* the RHS
column, which both layouts share, so the permutation never needs
inverting on the way back.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .types import ParametersLexLSE, RegularizationType

#: variants supported by the virtual-permutation fast tier — ALL of
#: them: TIKHONOV_1's regularized-multiplier machinery (X_mu, damped
#: residuals; reference ``regularize_tikhonov_1_test``) runs there too,
#: with its position-space reads gathered through ``col_at``.
FAST_TIER_TYPES = frozenset({
    RegularizationType.NONE,
    RegularizationType.TIKHONOV,
    RegularizationType.TIKHONOV_1,
    RegularizationType.TIKHONOV_CG,
    RegularizationType.R,
    RegularizationType.R_NO_Z,
    RegularizationType.RT_NO_Z,
    RegularizationType.RT_NO_Z_CG,
    RegularizationType.TIKHONOV_2,
    RegularizationType.TEST,
})


def variable_factor(level_rows, eps, first_col, rank, n, factor):
    """Conditioning-driven damping (reference ``lexlse.h:277-312``,
    Chiaverini formula): ce = |rhs| / |R^{-1} rhs|; damp when ce < eps."""
    dtype = level_rows.dtype
    K = level_rows.shape[0]
    cols_k = jnp.minimum(first_col + jnp.arange(K, dtype=jnp.int32), n)
    Rpad = level_rows.take(cols_k, axis=1)
    i_idx = jnp.arange(K)[:, None]
    j_idx = jnp.arange(K)[None, :]
    in_rank = (i_idx < rank) & (j_idx < rank) & (j_idx >= i_idx)
    Rm = jnp.where(in_rank, Rpad,
                   jnp.where(i_idx == j_idx, 1.0, 0.0).astype(dtype))
    rows_k = jnp.arange(K)
    rhs_seg = jnp.where(rows_k < rank, level_rows[:, n], 0)
    y = jax.scipy.linalg.solve_triangular(Rm, rhs_seg, lower=False)
    num = jnp.sum(rhs_seg * rhs_seg)
    den = jnp.sum(y * y)
    ce = num / jnp.where(den > 0, den, 1.0)
    eps = jnp.asarray(eps, dtype)
    damp = jnp.sqrt(jnp.maximum(1.0 - (ce * ce) / (eps * eps), 0.0))
    return jnp.where((rank > 0) & (ce < eps), damp * factor,
                     jnp.zeros((), dtype))


def apply_level_regularization(
    params: ParametersLexLSE,
    level_rows: jax.Array,
    null_space: jax.Array,
    first_col: jax.Array,
    rank: jax.Array,
    col_index: jax.Array,
    factor: jax.Array,
    n: int,
) -> Tuple[jax.Array, jax.Array]:
    """Regularize the RHS segment of the current level, then accumulate
    the nullspace basis (for the variants that need it).  Returns
    (new_rhs_segment (K,), new_null_space): the caller writes the rhs
    segment back into its own storage layout.

    The level's data: R_k = staircase of the first ``rank`` rows, T_k =
    trailing columns [col_index, n), rhs = level_rows[:, n].  S_{k-1} =
    null_space[:first_col, first_col:n] with the identity block implicit;
    s_{k-1} = null_space[:first_col, n].
    """
    rt = params.regularization_type
    K = level_rows.shape[0]
    do_reg = jnp.logical_and(factor != 0.0, rank > 0)

    if rt in (
        RegularizationType.TIKHONOV,
        RegularizationType.TIKHONOV_1,
        RegularizationType.TIKHONOV_2,
    ):
        new_rhs = _tikhonov_full(level_rows, null_space, first_col, rank,
                                 col_index, factor, n)
    elif rt == RegularizationType.TIKHONOV_CG:
        new_rhs = _tikhonov_cg(params, level_rows, null_space, first_col,
                               rank, col_index, factor, n)
    elif rt == RegularizationType.R:
        new_rhs = _reg_R(level_rows, null_space, first_col, rank, factor, n)
    elif rt == RegularizationType.R_NO_Z:
        new_rhs = _reg_R_no_z(level_rows, first_col, rank, factor, n)
    elif rt == RegularizationType.RT_NO_Z:
        new_rhs = _reg_RT_no_z(level_rows, first_col, rank, col_index,
                               factor, n)
    elif rt == RegularizationType.RT_NO_Z_CG:
        new_rhs = _rt_no_z_cg(params, level_rows, first_col, rank, col_index,
                              factor, n)
    elif rt == RegularizationType.TEST:
        new_rhs = level_rows[:, n] * factor
    else:
        new_rhs = level_rows[:, n]

    rows = jnp.arange(K)
    rhs_out = jnp.where(do_reg & (rows < rank), new_rhs, level_rows[:, n])

    # nullspace accumulation (``lexlse.h:2592-2625``) — needed by the
    # Tikhonov/R variants; harmless otherwise.  Uses the REGULARIZED rhs.
    if rt in (
        RegularizationType.TIKHONOV,
        RegularizationType.TIKHONOV_1,
        RegularizationType.TIKHONOV_2,
        RegularizationType.TIKHONOV_CG,
        RegularizationType.R,
    ):
        lv = jnp.concatenate([level_rows[:, :n], rhs_out[:, None]], axis=1)
        null_space = _accumulate_nullspace(lv, null_space, first_col, rank,
                                           col_index, n)

    return rhs_out, null_space


def _level_blocks(level_rows, null_space, first_col, rank, col_index, n):
    """Common masked blocks for the level, padded to static shapes.

    Returns (RT (K, n+1): columns in position space with only the level's
    R/T entries of the first ``rank`` rows; rhs_k (K,); S (n, n+1) masked
    accumulated nullspace rows; s (n,) its rhs)."""
    K = level_rows.shape[0]
    rows = jnp.arange(K)
    pos = jnp.arange(n + 1)
    RT = jnp.where(rows[:, None] < rank, level_rows, 0)
    # staircase mask: row i of the level starts at column first_col + i
    # (strictly-lower entries of the R block hold Householder essentials)
    RT = jnp.where(pos[None, :] >= first_col + rows[:, None], RT, 0)
    RT = RT.at[:, n].set(0)  # exclude the rhs column
    rhs_k = jnp.where(rows < rank, level_rows[:, n], 0)
    row_pos = jnp.arange(null_space.shape[0])
    S = jnp.where(row_pos[:, None] < first_col, null_space, 0)
    S = jnp.where(pos[None, :] >= first_col, S, 0)
    S = S.at[:, n].set(0)
    s = jnp.where(row_pos < first_col, null_space[:, n], 0)
    return RT, rhs_k, S, s


def _masked_chol_solve(D, d, active_mask):
    """Solve D y = d on the active coordinates (identity-extend the rest)."""
    dtype = D.dtype
    nn = D.shape[0]
    eye = jnp.eye(nn, dtype=dtype)
    Dm = jnp.where(active_mask[:, None] & active_mask[None, :], D, eye)
    dm = jnp.where(active_mask, d, 0)
    c = jax.scipy.linalg.cho_factor(Dm)
    return jax.scipy.linalg.cho_solve(c, dm) * active_mask


def _tikhonov_full(level_rows, null_space, first_col, rank, col_index,
                   factor, n, return_y: bool = False):
    """min ||[R,T] y - rhs||^2 + mu^2 ||S y - s||^2 + mu^2 ||y||^2 over the
    remaining variables y (positions >= first_col), primal normal equations
    (``regularize_tikhonov_1``, ``lexlse.h:1700-1763``; mathematically
    equivalent to the dual ``regularize_tikhonov_2``)."""
    dtype = level_rows.dtype
    mu = factor * factor
    RT, rhs_k, S, s = _level_blocks(level_rows, null_space, first_col, rank,
                                    col_index, n)
    pos = jnp.arange(n)
    active = pos >= first_col  # remaining variables (positions)
    A1 = RT[:, :n]  # (K, n)
    D = A1.T @ A1 + mu * (S[:, :n].T @ S[:, :n]) + mu * jnp.eye(n, dtype=dtype)
    d = A1.T @ rhs_k + mu * (S[:, :n].T @ s)
    y = _masked_chol_solve(D, d, active)
    new_rhs = A1 @ y  # (K,)
    if return_y:
        return new_rhs, y
    return new_rhs


def _reg_R(level_rows, null_space, first_col, rank, factor, n):
    """Tikhonov on the basic variables only (``lexlse.h:2138-2170``)."""
    dtype = level_rows.dtype
    mu = factor * factor
    K = level_rows.shape[0]
    rows = jnp.arange(K)
    pos = jnp.arange(n)
    R = level_rows[:, :n]
    R = jnp.where(rows[:, None] < rank, R, 0)
    stair = (pos[None, :] >= first_col + rows[:, None]) & (
        pos[None, :] < first_col + rank
    )
    R = jnp.where(stair, R, 0)
    basic_cols = (pos >= first_col) & (pos < first_col + rank)
    row_pos = jnp.arange(null_space.shape[0])
    up = jnp.where(row_pos[:, None] < first_col, null_space[:, :n], 0)
    up = jnp.where(basic_cols[None, :], up, 0)
    s = jnp.where(row_pos < first_col, null_space[:, n], 0)
    rhs_k = jnp.where(rows < rank, level_rows[:, n], 0)
    active = (pos >= first_col) & (pos < first_col + rank)
    D = R.T @ R + mu * (up.T @ up) + mu * jnp.eye(n, dtype=dtype)
    d = mu * (up.T @ s) + R.T @ rhs_k
    y = _masked_chol_solve(D, d, active)
    return R @ y


def _reg_R_no_z(level_rows, first_col, rank, factor, n):
    """``lexlse.h:2175-2202``."""
    dtype = level_rows.dtype
    mu = factor * factor
    K = level_rows.shape[0]
    rows = jnp.arange(K)
    pos = jnp.arange(n)
    R = level_rows[:, :n]
    R = jnp.where(rows[:, None] < rank, R, 0)
    basic = (pos[None, :] >= first_col + rows[:, None]) & (
        pos[None, :] < first_col + rank
    )
    R = jnp.where(basic, R, 0)
    rhs_k = jnp.where(rows < rank, level_rows[:, n], 0)
    active = (pos >= first_col) & (pos < first_col + rank)
    D = R.T @ R + mu * jnp.eye(n, dtype=dtype)
    d = R.T @ rhs_k
    y = _masked_chol_solve(D, d, active)
    return R @ y


def _reg_RT_no_z(level_rows, first_col, rank, col_index, factor, n):
    """Dual form on [R,T] only (``lexlse.h:2207-2242``): rhs <- (D - mu I) d
    with D = [R,T][R,T]' + mu I, D d = rhs."""
    dtype = level_rows.dtype
    mu = factor * factor
    K = level_rows.shape[0]
    rows = jnp.arange(K)
    pos = jnp.arange(n + 1)
    RT = jnp.where(rows[:, None] < rank, level_rows, 0)
    RT = jnp.where(pos[None, :] >= first_col + rows[:, None], RT, 0)
    RT = RT.at[:, n].set(0)
    A1 = RT[:, :n]
    rhs_k = jnp.where(rows < rank, level_rows[:, n], 0)
    active = rows < rank
    D = A1 @ A1.T + mu * jnp.eye(K, dtype=dtype)
    d = _masked_chol_solve(D, rhs_k, active)
    return (A1 @ (A1.T @ d)) * active


def _cgls(matvec, rmatvec, b, x0, iters, tol, dtype):
    """Fixed-trip-count CGLS with convergence masking
    (reference ``cg_tikhonov`` / ``cg_RT``, ``lexlse.h:2367-2554``)."""
    x = x0
    r = b - matvec(x0)
    s = rmatvec(r)
    p = s
    gamma = jnp.vdot(s, s)

    def body(i, carry):
        x, r, p, gamma = carry
        live = jnp.sqrt(gamma) > tol
        q = matvec(p)
        qq = jnp.vdot(q, q)
        alpha = jnp.where((qq > 0) & live, gamma / qq, 0)
        x = x + alpha * p
        r = r - alpha * q
        s = rmatvec(r)
        gamma_new = jnp.vdot(s, s)
        beta = jnp.where(gamma > 0, gamma_new / gamma, 0)
        p = jnp.where(live, s + beta * p, p)
        gamma = jnp.where(live, gamma_new, gamma)
        return (x, r, p, gamma)

    x, *_ = lax.fori_loop(0, iters, body, (x, r, p, gamma))
    return x


def _tikhonov_cg(params, level_rows, null_space, first_col, rank, col_index,
                 factor, n):
    """CGLS on the stacked damped system (``lexlse.h:2256-2279``)."""
    dtype = level_rows.dtype
    K = level_rows.shape[0]
    RT, rhs_k, S, s = _level_blocks(level_rows, null_space, first_col, rank,
                                    col_index, n)
    A1 = RT[:, :n]
    S1 = S[:, :n]
    pos = jnp.arange(n)
    active = pos >= first_col

    def matvec(y):
        return jnp.concatenate([A1 @ y, factor * (S1 @ y), factor * y])

    def rmatvec(r):
        r1, r2, r3 = r[:K], r[K : K + S1.shape[0]], r[K + S1.shape[0] :]
        return (A1.T @ r1 + factor * (S1.T @ r2) + factor * r3) * active

    b = jnp.concatenate([rhs_k, factor * s, jnp.zeros((n,), dtype)])
    y = _cgls(matvec, rmatvec, b, jnp.zeros((n,), dtype),
              params.max_number_of_CG_iterations, jnp.asarray(1e-12, dtype),
              dtype)
    return A1 @ (y * active)


def _rt_no_z_cg(params, level_rows, first_col, rank, col_index, factor, n):
    """CGLS without the nullspace coupling (``lexlse.h:2333-2356``)."""
    dtype = level_rows.dtype
    K = level_rows.shape[0]
    rows = jnp.arange(K)
    pos = jnp.arange(n + 1)
    RT = jnp.where(rows[:, None] < rank, level_rows, 0)
    RT = jnp.where(pos[None, :] >= first_col + rows[:, None], RT, 0)
    RT = RT.at[:, n].set(0)
    A1 = RT[:, :n]
    rhs_k = jnp.where(rows < rank, level_rows[:, n], 0)
    posn = jnp.arange(n)
    active = posn >= first_col

    def matvec(y):
        return jnp.concatenate([A1 @ y, factor * y])

    def rmatvec(r):
        return (A1.T @ r[:K] + factor * r[K:]) * active

    b = jnp.concatenate([rhs_k, jnp.zeros((n,), dtype)])
    y = _cgls(matvec, rmatvec, b, jnp.zeros((n,), dtype),
              params.max_number_of_CG_iterations, jnp.asarray(1e-12, dtype),
              dtype)
    return A1 @ (y * active)


def _accumulate_nullspace(level_rows, null_space, first_col, rank, col_index, n):
    """Accumulate Z_1 ... Z_k, Z_j = [-inv(R_j) T_j; I] (identity implicit),
    reference ``lexlse.h:2592-2625``.

    null_space rows < first_col hold S_{k-1}; the update appends the rows
    of the new block: left = [S_prev_cols_R; I] R^{-1} written into columns
    [first_col, first_col+rank), trailing -= left @ [T_k | rhs_k].
    """
    dtype = level_rows.dtype
    K = level_rows.shape[0]
    rows_n = jnp.arange(null_space.shape[0])
    pos = jnp.arange(n + 1)

    no_rank = rank == 0

    # R (identity-extended), gathered at dynamic offset
    cols_k = jnp.minimum(first_col + jnp.arange(K, dtype=jnp.int32), n)
    Rpad = level_rows.take(cols_k, axis=1)
    i_idx = jnp.arange(K)[:, None]
    j_idx = jnp.arange(K)[None, :]
    in_rank = (i_idx < rank) & (j_idx < rank) & (j_idx >= i_idx)
    Rm = jnp.where(in_rank, Rpad, jnp.where(i_idx == j_idx, 1.0, 0.0).astype(dtype))

    # left block rows: previous S rows (rows < first_col) + identity rows at
    # positions [first_col, first_col+rank)
    Sleft = null_space.take(cols_k, axis=1)  # (n, K)
    Sleft = jnp.where(rows_n[:, None] < first_col, Sleft, 0)
    eye_rows = jnp.where(
        (rows_n[:, None] >= first_col)
        & (rows_n[:, None] < first_col + rank)
        & ((rows_n[:, None] - first_col) == j_idx[0][None, :]),
        1.0,
        0.0,
    ).astype(dtype)
    left = Sleft + eye_rows
    left = jax.scipy.linalg.solve_triangular(Rm.T, left.T, lower=True).T
    left = jnp.where(j_idx[0][None, :] < rank, left, 0)

    # Up = [T_k | rhs_k] rows of the level
    Up = jnp.where(jnp.arange(K)[:, None] < rank, level_rows, 0)
    Up = jnp.where(pos[None, :] >= col_index, Up, 0)

    trailing_mask = pos[None, :] >= col_index
    new_ns = null_space - jnp.where(trailing_mask, left @ Up, 0)
    # write `left` into columns [first_col, first_col+rank)
    rel = jnp.clip(pos - first_col, 0, K - 1)
    left_full = left.take(rel, axis=1)
    write_mask = (pos[None, :] >= first_col) & (pos[None, :] < first_col + rank)
    new_ns = jnp.where(write_mask, left_full, new_ns)
    return jnp.where(no_rank, null_space, new_ns)
