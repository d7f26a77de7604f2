"""TPU-native equality-constrained lexicographic least-squares (LexLSE).

A from-scratch JAX implementation of the lexicographic QR ("l-QR") with
column pivoting and the associated solves/sensitivities.  Capabilities
mirror the reference engine ``include/lexls/lexlse.h`` (factorize
:117-506, solve :1015-1045, get_v :1560-1582, ObjectiveSensitivity
:511-762, least-norm :1138-1213, variable fixing :132-156), but the
design is masked/static-shape, built for ``jit``/``vmap``/``shard_map``:

  * **No dynamic shapes.**  Per-level ranks are *discovered* data, not
    shapes: every pivot step is predicated (a rejected pivot is a no-op),
    and discovered structure is carried as index arrays (``rank_row``,
    ``perm``) plus per-level rank counters.
  * **No compaction.**  Fixed variables are handled by zeroing their
    columns and eliminating them from the RHS (instead of the reference's
    column-to-front permutation); inactive constraint rows (when driven by
    the active-set solver) are zero rows, which provably do not perturb
    the factorization, residuals, or multipliers.
  * **One gathered triangular solve.**  The blockwise back-substitution of
    the reference collapses into a single n x n triangular solve on the
    gathered pivot rows — one fused XLA op instead of a per-level loop.

All functions are pure; ``dims`` and parameters are static (hashable)
arguments, array arguments may be batched with ``vmap``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .ops.tri import solve_triu, solve_triu_right
from .types import ParametersLexLSE, RegularizationType

# set up dataclass-as-pytree registration


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "lod", "hh", "perm", "rank_row", "ranks", "first_col", "total_rank",
        "fixed_mask", "fixed_val", "null_space", "X_mu", "residual_mu",
        "reg_factors",
    ],
    meta_fields=["dims", "n_var"],
)
@dataclasses.dataclass(frozen=True)
class LexQR:
    """Result of :func:`factorize` (all shapes static).

    lod        (m, n+1)  in-place l-QR storage, RHS in the last column
    hh         (m,)      Householder scalars (one per processed row)
    perm       (n,)      column permutation: position q holds variable perm[q]
    rank_row   (n,)      row index of the pivot occupying position q
    ranks      (p,)      discovered rank per level
    first_col  (p,)      first position of each level's pivot block
    total_rank ()        sum of ranks (excludes fixed variables)
    fixed_mask (n,) bool which variables are fixed
    fixed_val  (n,)      their values (0 where not fixed)
    null_space (n, n+1)  accumulated nullspace basis (regularization only)
    """

    lod: jax.Array
    hh: jax.Array
    perm: jax.Array
    rank_row: jax.Array
    ranks: jax.Array
    first_col: jax.Array
    total_rank: jax.Array
    fixed_mask: jax.Array
    fixed_val: jax.Array
    null_space: jax.Array
    # regularized-multiplier machinery (TIKHONOV_1 only, else 0-sized;
    # reference ``regularize_tikhonov_1_test`` lexlse.h:1774-1886)
    X_mu: jax.Array          # (n, p) damped per-level solutions (user order)
    residual_mu: jax.Array   # (m,) damped residuals
    reg_factors: jax.Array   # (p,) per-level factors used
    dims: Tuple[int, ...]
    n_var: int


def _level_offsets(dims):
    out = []
    ofs = 0
    for d in dims:
        out.append(ofs)
        ofs += d
    return out, ofs


# ---------------------------------------------------------------------------
# Factorization
# ---------------------------------------------------------------------------


def factorize(
    A: jax.Array,
    b: jax.Array,
    dims: Tuple[int, ...],
    params: ParametersLexLSE = ParametersLexLSE(),
    fixed_mask: Optional[jax.Array] = None,
    fixed_val: Optional[jax.Array] = None,
    reg_factors: Optional[jax.Array] = None,
) -> LexQR:
    """Masked column-pivoted Householder l-QR.

    Mirrors reference ``lexlse.h:117-506``: per level, a column-pivoted
    Householder QR over the remaining variables with rank cutoff
    ``tol_linear_dependence``, then Gauss elimination of the sub-diagonal
    block against all lower-priority rows.  Every pivot step is predicated
    so shapes stay static; a level "stops" when the recomputed max column
    norm falls below the tolerance (matching the reference's ``break``).
    """
    m, n = A.shape
    dtype = A.dtype
    n_obj = len(dims)
    offsets, total_rows = _level_offsets(dims)
    assert total_rows == m, (dims, m)
    tol = jnp.asarray(params.tol_linear_dependence, dtype)

    if fixed_mask is None:
        fixed_mask = jnp.zeros((n,), bool)
        fixed_val = jnp.zeros((n,), dtype)
    fixed_val = jnp.where(fixed_mask, fixed_val, jnp.zeros((), dtype))

    # zero fixed columns; eliminate fixed variables from the RHS
    A_work = jnp.where(fixed_mask[None, :], jnp.zeros((), dtype), A)
    rhs = b - A @ fixed_val
    lod = jnp.concatenate([A_work, rhs[:, None]], axis=1)

    hh = jnp.zeros((m,), dtype)
    perm = jnp.arange(n, dtype=jnp.int32)
    rank_row = jnp.zeros((n,), jnp.int32)
    col_pos = jnp.arange(n, dtype=jnp.int32)
    col_pos_p1 = jnp.arange(n + 1, dtype=jnp.int32)

    ranks = []
    first_cols = []
    col_index = jnp.zeros((), jnp.int32)

    regularize = params.regularization_type != RegularizationType.NONE
    null_space = jnp.zeros((n, n + 1), dtype)
    if reg_factors is None:
        reg_factors = jnp.zeros((n_obj,), dtype)

    # regularized-multiplier tracking (TIKHONOV_1; reference
    # ``regularize_tikhonov_1_test``, ``lexlse.h:1774-1886``)
    track_mu = params.regularization_type == RegularizationType.TIKHONOV_1
    X_mu = jnp.zeros((n, n_obj) if track_mu else (0, 0), dtype)
    residual_mu = jnp.zeros((m,) if track_mu else (0,), dtype)

    for obj in range(n_obj):
        fr, dim = offsets[obj], dims[obj]
        first_col = col_index
        first_cols.append(first_col)
        if dim == 0:
            ranks.append(jnp.zeros((), jnp.int32))
            continue
        K = min(dim, n)  # static bound on this level's rank

        block = lax.dynamic_slice_in_dim(lod, fr, dim, axis=0)
        col_norms = jnp.sum(block[:, :n] * block[:, :n], axis=0)
        rows = jnp.arange(dim, dtype=jnp.int32)

        if track_mu:
            # deflated rhs of this level, before the Householder
            # transformations (``lexlse.h:188-191``)
            residual_mu = lax.dynamic_update_slice_in_dim(
                residual_mu, block[:, n], fr, axis=0)

        def pivot_step(counter, carry, fr=fr, dim=dim, rows=rows):
            lod, col_norms, perm, rank_row, hh, null_space, col_index, stopped = carry
            row_index = fr + counter

            # --- pivot selection among the remaining columns
            masked = jnp.where(col_pos >= col_index, col_norms, -jnp.ones((), dtype))
            piv = jnp.argmax(masked).astype(jnp.int32)
            # stability recomputation over the remaining rows of this level
            # (reference ``lexlse.h:208-211``)
            seg0 = lax.dynamic_slice_in_dim(lod, fr, dim, axis=0)[:, :n]
            colv = jnp.take(seg0, piv, axis=1)
            row_live = rows >= counter
            max_val = jnp.sum(jnp.where(row_live, colv * colv, 0))
            col_norms = col_norms.at[piv].set(max_val)

            ok = max_val >= tol
            accept = ok & jnp.logical_not(stopped) & (col_index < n)
            stopped = stopped | jnp.logical_not(ok)

            # --- predicated column swap (full column: T-blocks of earlier
            # levels must follow the permutation, ``lexlse.h:225``).
            # Only the two affected columns are written — a whole-array
            # select here would copy the full LOD every pivot step, which
            # dominates HBM traffic on TPU.
            # clamp: when col_index == n (columns exhausted, accept False)
            # an unclamped write would land on the RHS column of lod
            ci_safe = jnp.minimum(col_index, n - 1)
            ca = lod[:, :n].take(ci_safe, axis=1)
            cb = lod[:, :n].take(piv, axis=1)
            lod = lod.at[:, ci_safe].set(jnp.where(accept, cb, ca))
            lod = lod.at[:, piv].set(jnp.where(accept, ca, cb))
            na, nb = col_norms[col_index], col_norms[piv]
            col_norms = col_norms.at[col_index].set(jnp.where(accept, nb, na))
            col_norms = col_norms.at[piv].set(jnp.where(accept, na, nb))
            pa, pb = perm[col_index], perm[piv]
            perm = perm.at[col_index].set(jnp.where(accept, pb, pa))
            perm = perm.at[piv].set(jnp.where(accept, pa, pb))
            if regularize:
                za = null_space[:, :n].take(ci_safe, axis=1)
                zb = null_space[:, :n].take(piv, axis=1)
                null_space = null_space.at[:, ci_safe].set(jnp.where(accept, zb, za))
                null_space = null_space.at[:, piv].set(jnp.where(accept, za, zb))

            # --- Householder reflection of the remaining rows, applied to
            # the remaining columns and the RHS (``lexlse.h:239-248``)
            block = lax.dynamic_slice_in_dim(lod, fr, dim, axis=0)
            seg = jnp.where(row_live, jnp.take(block, col_index, axis=1)[:dim], 0)
            c0 = seg[counter]
            s_tail = jnp.sum(jnp.where(rows > counter, seg * seg, 0))
            nonzero_tail = s_tail > 0
            beta = jnp.sqrt(c0 * c0 + s_tail)
            beta = jnp.where(c0 >= 0, -beta, beta)
            beta = jnp.where(nonzero_tail, beta, c0)
            denom = jnp.where(nonzero_tail, c0 - beta, jnp.ones((), dtype))
            tau = jnp.where(nonzero_tail, (beta - c0) / beta, 0)
            essential = seg / denom
            u = jnp.where(rows == counter, jnp.ones((), dtype),
                          jnp.where(rows > counter, essential, 0))

            w = u @ block  # (n+1,)
            colmask = col_pos_p1 > col_index
            upd = tau * jnp.where(accept, 1.0, 0.0)
            new_block = block - upd * jnp.outer(u, jnp.where(colmask, w, 0))
            # write the pivot column: beta at the diagonal, essentials below
            newcol = jnp.where(rows == counter, beta,
                               jnp.where(rows > counter, essential,
                                         jnp.take(block, col_index, axis=1)))
            newcol = jnp.where(accept, newcol, jnp.take(block, col_index, axis=1))
            new_block = new_block.at[:, col_index].set(newcol)
            lod = lax.dynamic_update_slice_in_dim(lod, new_block, fr, axis=0)

            hh = hh.at[row_index].set(jnp.where(accept, tau, hh[row_index]))
            rank_row = rank_row.at[col_index].set(
                jnp.where(accept, row_index, rank_row[col_index])
            )

            # --- downdate of column norms (``lexlse.h:260-266``)
            pivot_row = new_block[counter, :n]
            dd = jnp.where(col_pos > col_index, pivot_row * pivot_row, 0)
            col_norms = jnp.where(accept, col_norms - dd, col_norms)

            col_index = col_index + accept.astype(jnp.int32)
            return (lod, col_norms, perm, rank_row, hh, null_space, col_index, stopped)

        carry = (lod, col_norms, perm, rank_row, hh, null_space, col_index,
                 jnp.zeros((), bool))
        lod, _, perm, rank_row, hh, null_space, col_index, _ = lax.fori_loop(
            0, dim, pivot_step, carry
        )

        rank = col_index - first_col
        ranks.append(rank)

        # --- regularization of this level's RHS segment (before Gauss)
        if regularize:
            from . import regularization as _reg

            factor = reg_factors[obj]
            level_rows = lod[fr : fr + K, :]
            if params.variable_regularization_factor != 0.0:
                factor = _reg.variable_factor(
                    level_rows, params.variable_regularization_factor,
                    first_col, rank, n, factor)

            if track_mu:
                do_reg = jnp.logical_and(factor != 0.0, rank > 0)
                new_rhs, y_mu = _reg._tikhonov_full(
                    level_rows, null_space, first_col, rank, col_index,
                    factor, n, return_y=True)
                rows_K = jnp.arange(K)
                new_lod = lod.at[fr : fr + K, n].set(
                    jnp.where(do_reg & (rows_K < rank), new_rhs,
                              level_rows[:, n]))
                # damped residual: rw = Q [new_rhs_head; 0], residual_mu
                # segment := rw - (deflated rhs)  (``lexlse.h:1846-1855``)
                Vw, Ww = _wy_raw(new_lod, hh, fr, dim, K, first_col, n)
                rows_d = jnp.arange(dim)
                rhs_new = lax.dynamic_slice_in_dim(new_lod[:, n], fr, dim)
                seg_in = jnp.where(rows_d < rank, rhs_new, 0)
                rw = seg_in - Ww @ (Vw.T @ seg_in)
                old_seg = lax.dynamic_slice_in_dim(residual_mu, fr, dim)
                residual_mu = lax.dynamic_update_slice_in_dim(
                    residual_mu, jnp.where(do_reg, rw - old_seg, old_seg),
                    fr, axis=0)
                # damped solution of the obj-th problem, completed through
                # earlier levels (``get_intermediate_x``, lexlse.h:2010)
                X_pos = jnp.where(jnp.arange(n) >= first_col, y_mu, 0)
                X_pos = _intermediate_x(
                    new_lod, offsets, dims, first_cols, ranks, obj,
                    first_col, X_pos, n)
                X_var = jnp.zeros((n,), dtype).at[perm].set(X_pos)
                X_mu = X_mu.at[:, obj].set(
                    jnp.where(do_reg, X_var, X_mu[:, obj]))
                lod = new_lod
                null_space = _reg._accumulate_nullspace(
                    lod[fr : fr + K, :], null_space, first_col, rank,
                    col_index, n)
            else:
                new_rhs, null_space = _reg.apply_level_regularization(
                    params, level_rows, null_space, first_col, rank,
                    col_index, factor, n,
                )
                lod = lod.at[fr : fr + K, n].set(new_rhs)

        # --- Gauss elimination of all lower-priority rows
        # (reference ``lexlse.h:431-471``), padded to static width K.
        # NOTE: gathers use clipped column indices + rank masks, never
        # lax.dynamic_slice (whose out-of-range clamping would silently
        # misalign the padded block when first_col + K > n).
        if obj < n_obj - 1:
            below_fr = fr + dim
            # R block, identity-extended beyond the discovered rank
            cols_k = jnp.minimum(first_col + jnp.arange(K, dtype=jnp.int32), n)
            Rpad = lod[fr : fr + K, :].take(cols_k, axis=1)
            i_idx = jnp.arange(K)[:, None]
            j_idx = jnp.arange(K)[None, :]
            in_rank = (i_idx < rank) & (j_idx < rank) & (j_idx >= i_idx)
            Rm = jnp.where(in_rank, Rpad,
                           jnp.where(i_idx == j_idx, 1.0, 0.0).astype(dtype))
            Bpad = lod[below_fr:, :].take(cols_k, axis=1)
            # L = B R^{-1}  (solve on the right; matmul-based inversion)
            L = solve_triu_right(Bpad, Rm)
            Lm = jnp.where(jnp.arange(K)[None, :] < rank, L, 0)
            # Up rows: this level's pivot rows, masked to the trailing columns
            Up = lod[fr : fr + K, :]
            Up = jnp.where(jnp.arange(K)[:, None] < rank, Up, 0)
            Up = jnp.where(col_pos_p1[None, :] >= col_index, Up, 0)
            below = lod[below_fr:, :]
            new_below = below - Lm @ Up
            # write L into the eliminated block's columns [first_col, col_index)
            rel = jnp.clip(col_pos_p1 - first_col, 0, K - 1)
            L_full = Lm.take(rel, axis=1)
            store_mask = (col_pos_p1[None, :] >= first_col) & (
                col_pos_p1[None, :] < col_index
            )
            new_below = jnp.where(store_mask, L_full, new_below)
            lod = lod.at[below_fr:, :].set(new_below)

    return LexQR(
        lod=lod, hh=hh, perm=perm, rank_row=rank_row,
        ranks=jnp.stack(ranks) if ranks else jnp.zeros((0,), jnp.int32),
        first_col=jnp.stack(first_cols) if first_cols else jnp.zeros((0,), jnp.int32),
        total_rank=col_index, fixed_mask=fixed_mask, fixed_val=fixed_val,
        null_space=null_space, X_mu=X_mu, residual_mu=residual_mu,
        reg_factors=reg_factors if track_mu else jnp.zeros((0,), dtype),
        dims=tuple(dims), n_var=n,
    )


def _intermediate_x(lod, offsets, dims, first_cols, ranks, obj, fcol_obj,
                    X_pos, n):
    """Masked port of ``get_intermediate_x`` (``lexlse.h:2010-2071``):
    given X_pos holding the current level's damped solution on positions
    >= fcol_obj, fill the rank positions of earlier levels by
    back-substitution through the current staircase."""
    if obj == 0:
        return X_pos
    dtype = lod.dtype
    q = jnp.arange(n)
    tail_mask = (q >= fcol_obj).astype(dtype)
    for i in range(obj):
        fr_i, dim_i = offsets[i], dims[i]
        K_i = min(dim_i, n)
        fc_i, r_i = first_cols[i], ranks[i]
        rows_i = jnp.arange(K_i)
        rhs_i = lod[fr_i : fr_i + K_i, n]
        contrib = lod[fr_i : fr_i + K_i, :n] @ (X_pos * tail_mask)
        vec = jnp.where(rows_i < r_i, rhs_i - contrib, 0)
        in_lvl = (q >= fc_i) & (q < fc_i + r_i)
        X_pos = jnp.where(in_lvl, vec.take(jnp.clip(q - fc_i, 0, K_i - 1)),
                          X_pos)
    for k in range(obj - 1, -1, -1):
        fr_k, dim_k = offsets[k], dims[k]
        K_k = min(dim_k, n)
        fc_k, r_k = first_cols[k], ranks[k]
        lo = first_cols[k + 1]  # positions of levels k+1 .. obj-1
        rows_k = jnp.arange(K_k)
        mid_mask = ((q >= lo) & (q < fcol_obj)).astype(dtype)
        coupling = lod[fr_k : fr_k + K_k, :n] @ (X_pos * mid_mask)
        cols_k = jnp.minimum(fc_k + jnp.arange(K_k, dtype=jnp.int32), n - 1)
        seg = jnp.where(rows_k < r_k, X_pos.take(cols_k) - coupling, 0)
        Rpad = lod[fr_k : fr_k + K_k, :n].take(cols_k, axis=1)
        i_idx = rows_k[:, None]
        j_idx = rows_k[None, :]
        in_rank = (i_idx < r_k) & (j_idx < r_k) & (j_idx >= i_idx)
        Rm = jnp.where(in_rank, Rpad,
                       jnp.where(i_idx == j_idx, 1.0, 0.0).astype(dtype))
        z = jax.scipy.linalg.solve_triangular(Rm, seg, lower=False)
        z = jnp.where(rows_k < r_k, z, 0)
        in_lvl = (q >= fc_k) & (q < fc_k + r_k)
        X_pos = jnp.where(in_lvl, z.take(jnp.clip(q - fc_k, 0, K_k - 1)),
                          X_pos)
    return X_pos


def initialize_rhs_regularized(f: LexQR, obj_index: int) -> jax.Array:
    """Seed of the regularized λ back-propagation (reference
    ``initialize_rhs``, ``lexlse.h:1920-1959``): forward substitution of
    -mu^2 X_mu through the transposed staircase.  Returns the full (n,)
    position-space vector (the caller uses positions < first_col[obj])."""
    n = f.n_var
    dtype = f.lod.dtype
    offsets, _ = _level_offsets(f.dims)
    q = jnp.arange(n)
    mu2 = f.reg_factors[obj_index] ** 2
    X = -mu2 * f.X_mu[f.perm, obj_index]
    last_col = f.first_col[obj_index] + f.ranks[obj_index]  # exclusive
    for k in range(obj_index + 1):
        fr_k, dim_k = offsets[k], f.dims[k]
        K_k = min(dim_k, n)
        fc_k, r_k = f.first_col[k], f.ranks[k]
        rows_k = jnp.arange(K_k)
        cols_k = jnp.minimum(fc_k + jnp.arange(K_k, dtype=jnp.int32), n - 1)
        if k > 0:
            fr_p, dim_p = offsets[k - 1], f.dims[k - 1]
            K_p = min(dim_p, n)
            fc_p, r_p = f.first_col[k - 1], f.ranks[k - 1]
            rows_p = jnp.arange(K_p)
            cols_p = jnp.minimum(fc_p + jnp.arange(K_p, dtype=jnp.int32), n - 1)
            xp = jnp.where(rows_p < r_p, X.take(cols_p), 0)
            contrib = f.lod[fr_p : fr_p + K_p, :n].T @ xp  # (n,)
            # only positions in [fc_k, last_col) receive the update
            X = jnp.where((q >= fc_k) & (q < last_col), X - contrib, X)
        # triangular solve R_k^T on this level's rank positions
        seg = jnp.where(rows_k < r_k, X.take(cols_k), 0)
        Rpad = f.lod[fr_k : fr_k + K_k, :n].take(cols_k, axis=1)
        i_idx = rows_k[:, None]
        j_idx = rows_k[None, :]
        in_rank = (i_idx < r_k) & (j_idx < r_k) & (j_idx >= i_idx)
        Rm = jnp.where(in_rank, Rpad,
                       jnp.where(i_idx == j_idx, 1.0, 0.0).astype(dtype))
        z = jax.scipy.linalg.solve_triangular(Rm.T, seg, lower=True)
        z = jnp.where(rows_k < r_k, z, 0)
        in_lvl = (q >= fc_k) & (q < fc_k + r_k)
        X = jnp.where(in_lvl, z.take(jnp.clip(q - fc_k, 0, K_k - 1)), X)
    return X


def x_mu_rhs(f: LexQR) -> jax.Array:
    """Debug mirror of the reference's ``get_X_mu_rhs``
    (``lexlse.h:1641``, filled by ``initialize_rhs`` at :1923-1925):
    column j holds the seed of objective j's regularized-multiplier
    back-propagation.  Only meaningful after a TIKHONOV_1 factorization
    (``factorize`` with that regularization type)."""
    if f.X_mu.size == 0:
        raise ValueError("x_mu_rhs requires a TIKHONOV_1 factorization")
    cols = [initialize_rhs_regularized(f, j) for j in range(len(f.dims))]
    return jnp.stack(cols, axis=1)


def objective_sensitivity_regularized(
    f: LexQR, obj_index: int, A_fixed_cols: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """Regularized multipliers (TIKHONOV_1): the top segment is the
    damped residual ``residual_mu`` and the back-propagation is seeded by
    :func:`initialize_rhs_regularized` (reference ``ObjectiveSensitivity``
    with ``compute_residual_from_factorization = false``)."""
    offsets, m = _level_offsets(f.dims)
    n = f.n_var
    dtype = f.lod.dtype
    lam = jnp.zeros((m,), dtype)
    col_pos = jnp.arange(n)
    rhs = initialize_rhs_regularized(f, obj_index)
    rhs = jnp.where(col_pos < f.first_col[obj_index], rhs, 0)

    fr, dim = offsets[obj_index], f.dims[obj_index]
    seg = lax.dynamic_slice_in_dim(f.residual_mu, fr, dim)
    lam = lax.dynamic_update_slice_in_dim(lam, seg, fr, axis=0)

    if obj_index > 0:
        block = lax.dynamic_slice_in_dim(f.lod, fr, dim, axis=0)[:, :n]
        contrib = block.T @ seg
        rhs = rhs - jnp.where(col_pos < f.first_col[obj_index], contrib, 0)
        for k in range(obj_index - 1, -1, -1):
            frk, dimk = offsets[k], f.dims[k]
            K = min(dimk, n)
            rowsk = jnp.arange(dimk)
            cols = jnp.minimum(f.first_col[k] + jnp.arange(K, dtype=jnp.int32), n - 1)
            rhs_slice = rhs.take(cols)
            segk = jnp.zeros((dimk,), dtype).at[:K].set(rhs_slice)
            segk = jnp.where(rowsk < f.ranks[k], segk, 0)
            segk = _apply_hh_seq(f, k, segk)
            lam = lax.dynamic_update_slice_in_dim(lam, segk, frk, axis=0)
            blockk = lax.dynamic_slice_in_dim(f.lod, frk, dimk, axis=0)[:, :n]
            contrib = blockk.T @ segk
            rhs = rhs - jnp.where(col_pos < f.first_col[k], contrib, 0)

    lam_fixed = jnp.zeros((n,), dtype)
    if A_fixed_cols is not None:
        lam_fixed = jnp.where(f.fixed_mask, -(A_fixed_cols.T @ lam), 0)
    return lam_fixed, lam


# ---------------------------------------------------------------------------
# Fast factorization (virtual column permutation)
# ---------------------------------------------------------------------------


def factorize_fast(
    A: jax.Array,
    b: jax.Array,
    dims: Tuple[int, ...],
    params: ParametersLexLSE = ParametersLexLSE(),
    fixed_mask: Optional[jax.Array] = None,
    fixed_val: Optional[jax.Array] = None,
    reg_factors: Optional[jax.Array] = None,
) -> LexQR:
    """l-QR with a *virtual* column permutation — the TPU hot path.

    Mathematically identical to :func:`factorize` (same pivot order, same
    reflections — parity-tested), but columns are never physically moved:
    the permutation lives in two index vectors (``pos``: physical column →
    position, ``col_at``: position → physical column) and every
    position-range mask is evaluated through ``pos``.  This removes the
    per-pivot-step dynamic-index column scatters that dominate HBM
    traffic / lowering cost under ``vmap`` on TPU; the physical layout
    expected by the solves is materialized by one gather at the end.

    Pivot tie-breaking matches the position-ordered scan of the reference
    (``lexlse.h:205-211``): among equal column norms the smallest
    *position* wins (realized as argmin of position over the argmax set).

    Regularization: every variant is supported — the regularizers only
    read the level rows in *position* space (one gather through
    ``col_at`` per level) and write the RHS column, which both layouts
    share; TIKHONOV_1's regularized-multiplier machinery (X_mu / damped
    residuals, ``lexlse.h:1774-1886``) gathers its position-space views
    the same way.
    """
    m, n = A.shape
    dtype = A.dtype
    n_obj = len(dims)
    offsets, total_rows = _level_offsets(dims)
    assert total_rows == m, (dims, m)
    tol = jnp.asarray(params.tol_linear_dependence, dtype)

    if fixed_mask is None:
        fixed_mask = jnp.zeros((n,), bool)
        fixed_val = jnp.zeros((n,), dtype)
    fixed_val = jnp.where(fixed_mask, fixed_val, jnp.zeros((), dtype))

    A_work = jnp.where(fixed_mask[None, :], jnp.zeros((), dtype), A)
    rhs = b - A @ fixed_val
    lod = jnp.concatenate([A_work, rhs[:, None]], axis=1)

    hh = jnp.zeros((m,), dtype)
    pos = jnp.arange(n, dtype=jnp.int32)      # physical col -> position
    col_at = jnp.arange(n, dtype=jnp.int32)   # position -> physical col
    rank_row = jnp.zeros((n,), jnp.int32)
    phys = jnp.arange(n, dtype=jnp.int32)
    big = jnp.asarray(jnp.iinfo(jnp.int32).max, jnp.int32)

    regularize = params.regularization_type != RegularizationType.NONE
    null_space = jnp.zeros((n, n + 1), dtype)
    if reg_factors is None:
        reg_factors = jnp.zeros((n_obj,), dtype)

    # regularized-multiplier tracking (TIKHONOV_1; reference
    # ``regularize_tikhonov_1_test``, ``lexlse.h:1774-1886``) — the same
    # machinery as the physical tier, with every position-space read
    # realized as a gather through ``col_at``
    track_mu = params.regularization_type == RegularizationType.TIKHONOV_1
    X_mu = jnp.zeros((n, n_obj) if track_mu else (0, 0), dtype)
    residual_mu = jnp.zeros((m,) if track_mu else (0,), dtype)

    ranks = []
    first_cols = []
    col_index = jnp.zeros((), jnp.int32)

    for obj in range(n_obj):
        fr, dim = offsets[obj], dims[obj]
        first_col = col_index
        first_cols.append(first_col)
        if dim == 0:
            ranks.append(jnp.zeros((), jnp.int32))
            continue
        K = min(dim, n)

        block0 = lax.dynamic_slice_in_dim(lod, fr, dim, axis=0)
        col_norms = jnp.sum(block0[:, :n] * block0[:, :n], axis=0)
        rows = jnp.arange(dim)

        if track_mu:
            # deflated rhs of this level, before the Householder
            # transformations (``lexlse.h:188-191``)
            residual_mu = lax.dynamic_update_slice_in_dim(
                residual_mu, block0[:, n], fr, axis=0)

        def pivot_step(counter, carry, fr=fr, dim=dim, rows=rows):
            (lod, col_norms, pos, col_at, rank_row, hh, col_index, stopped) = carry
            row_index = fr + counter
            block = lax.dynamic_slice_in_dim(lod, fr, dim, axis=0)

            # --- pivot: max column norm among remaining positions; ties
            # resolve to the smallest position (reference scan order)
            remaining = pos >= col_index
            masked = jnp.where(remaining, col_norms, -jnp.ones((), dtype))
            mx = jnp.max(masked)
            cand = remaining & (masked == mx)
            piv = jnp.argmin(jnp.where(cand, pos, big)).astype(jnp.int32)

            # stability recomputation (``lexlse.h:208-211``)
            one_piv = (phys == piv).astype(dtype)
            colv = block[:, :n] @ one_piv  # (dim,)
            row_live = rows >= counter
            max_val = jnp.sum(jnp.where(row_live, colv * colv, 0))
            col_norms = jnp.where(phys == piv, max_val, col_norms)

            ok = max_val >= tol
            accept = ok & jnp.logical_not(stopped) & (col_index < n)
            stopped = stopped | jnp.logical_not(ok)

            # --- virtual swap: positions of (col at col_index) and piv
            c1 = col_at[jnp.minimum(col_index, n - 1)]
            q2 = pos[piv]
            do = accept
            pos = jnp.where(do & (phys == c1), q2,
                            jnp.where(do & (phys == piv), col_index, pos))
            qpos = jnp.arange(n, dtype=jnp.int32)
            col_at = jnp.where(do & (qpos == col_index), piv,
                               jnp.where(do & (qpos == q2), c1, col_at))

            # --- Householder reflection of the remaining rows
            seg = jnp.where(row_live, colv, 0)
            c0 = seg[counter]
            s_tail = jnp.sum(jnp.where(rows > counter, seg * seg, 0))
            nonzero_tail = s_tail > 0
            beta = jnp.sqrt(c0 * c0 + s_tail)
            beta = jnp.where(c0 >= 0, -beta, beta)
            beta = jnp.where(nonzero_tail, beta, c0)
            denom = jnp.where(nonzero_tail, c0 - beta, jnp.ones((), dtype))
            tau = jnp.where(nonzero_tail, (beta - c0) / beta, 0)
            essential = seg / denom
            u = jnp.where(rows == counter, jnp.ones((), dtype),
                          jnp.where(rows > counter, essential, 0))

            w = u @ block  # (n+1,)
            # trailing columns: position > col_index, plus the RHS column
            colmask = jnp.concatenate(
                [pos > col_index, jnp.ones((1,), bool)])
            upd = tau * jnp.where(accept, 1.0, 0.0)
            new_block = block - upd * jnp.outer(u, jnp.where(colmask, w, 0))
            # pivot column: beta at the diagonal, essentials below
            newcol = jnp.where(rows == counter, beta,
                               jnp.where(rows > counter, essential, colv))
            newcol = jnp.where(accept, newcol, colv)
            one_piv_p1 = jnp.concatenate([one_piv, jnp.zeros((1,), dtype)])
            new_block = (new_block * (1.0 - one_piv_p1)[None, :]
                         + jnp.outer(newcol, one_piv_p1))
            lod = lax.dynamic_update_slice_in_dim(lod, new_block, fr, axis=0)

            hh = hh.at[row_index].set(jnp.where(accept, tau, hh[row_index]))
            rank_row = jnp.where(
                accept & (qpos == col_index), row_index, rank_row)

            # --- downdate of column norms
            pivot_row = new_block[counter, :n]
            dd = jnp.where(pos > col_index, pivot_row * pivot_row, 0)
            col_norms = jnp.where(accept, col_norms - dd, col_norms)

            col_index = col_index + accept.astype(jnp.int32)
            return (lod, col_norms, pos, col_at, rank_row, hh, col_index, stopped)

        carry = (lod, col_norms, pos, col_at, rank_row, hh, col_index,
                 jnp.zeros((), bool))
        (lod, _, pos, col_at, rank_row, hh, col_index, _) = lax.fori_loop(
            0, dim, pivot_step, carry)

        rank = col_index - first_col
        ranks.append(rank)

        # --- regularization of this level's RHS segment (before Gauss):
        # one position-space gather of the level rows through ``col_at``;
        # only the (shared) RHS column is written back.
        if regularize:
            from . import regularization as _reg

            factor = reg_factors[obj]
            level_rows = jnp.concatenate(
                [lod[fr : fr + K, :n].take(col_at, axis=1),
                 lod[fr : fr + K, n:]], axis=1)
            if params.variable_regularization_factor != 0.0:
                factor = _reg.variable_factor(
                    level_rows, params.variable_regularization_factor,
                    first_col, rank, n, factor)
            # the accumulated nullspace is stored with PHYSICAL columns
            # (later pivoting reorders remaining positions, which the
            # physical tier realizes by swapping its columns); round-trip
            # it through the current position layout for the regularizer
            ns_pos = jnp.concatenate(
                [null_space[:, :n].take(col_at, axis=1), null_space[:, n:]],
                axis=1)
            if track_mu:
                do_reg = jnp.logical_and(factor != 0.0, rank > 0)
                new_rhs, y_mu = _reg._tikhonov_full(
                    level_rows, ns_pos, first_col, rank, col_index,
                    factor, n, return_y=True)
                rows_K = jnp.arange(K)
                rhs_reg = jnp.where(do_reg & (rows_K < rank), new_rhs,
                                    level_rows[:, n])
                lod = lod.at[fr : fr + K, n].set(rhs_reg)
                # damped residual: rw = Q [new_rhs_head; 0], residual_mu
                # segment := rw - (deflated rhs)  (``lexlse.h:1846-1855``);
                # pivot columns gathered through col_at
                wy_cols = col_at.take(jnp.clip(
                    first_col + jnp.arange(K, dtype=jnp.int32), 0, n - 1))
                Vw, Ww = _wy_raw(lod, hh, fr, dim, K, first_col, n,
                                 cols=wy_cols)
                rows_d = jnp.arange(dim)
                rhs_new = lax.dynamic_slice_in_dim(lod[:, n], fr, dim)
                seg_in = jnp.where(rows_d < rank, rhs_new, 0)
                rw = seg_in - Ww @ (Vw.T @ seg_in)
                old_seg = lax.dynamic_slice_in_dim(residual_mu, fr, dim)
                residual_mu = lax.dynamic_update_slice_in_dim(
                    residual_mu, jnp.where(do_reg, rw - old_seg, old_seg),
                    fr, axis=0)
                # damped solution of the obj-th problem, completed through
                # earlier levels (``get_intermediate_x``, lexlse.h:2010):
                # earlier-level rows gathered into position space once
                X_pos = jnp.where(jnp.arange(n) >= first_col, y_mu, 0)
                if obj > 0:
                    lod_pos = jnp.concatenate(
                        [lod[:fr, :n].take(col_at, axis=1), lod[:fr, n:]],
                        axis=1)
                    X_pos = _intermediate_x(
                        lod_pos, offsets, dims, first_cols, ranks, obj,
                        first_col, X_pos, n)
                # positions -> physical variables: X_var[c] = X_pos[pos[c]]
                X_var = jnp.where(do_reg, X_pos.take(pos), X_mu[:, obj])
                X_mu = X_mu.at[:, obj].set(X_var)
                lv_reg = jnp.concatenate(
                    [level_rows[:, :n], rhs_reg[:, None]], axis=1)
                ns_pos = _reg._accumulate_nullspace(
                    lv_reg, ns_pos, first_col, rank, col_index, n)
            else:
                new_rhs, ns_pos = _reg.apply_level_regularization(
                    params, level_rows, ns_pos, first_col, rank,
                    col_index, factor, n)
                lod = lod.at[fr : fr + K, n].set(new_rhs)
            null_space = jnp.concatenate(
                [ns_pos[:, :n].take(pos, axis=1), ns_pos[:, n:]], axis=1)

        # --- Gauss elimination of all lower-priority rows, in virtual
        # layout (``lexlse.h:431-471``): gather R by position, solve on
        # the right, subtract L @ [T | rhs], write L back by position.
        if obj < n_obj - 1:
            below_fr = fr + dim
            cols_k = col_at.take(
                jnp.minimum(first_col + jnp.arange(K, dtype=jnp.int32), n - 1))
            Rpad = lod[fr : fr + K, :n].take(cols_k, axis=1)
            i_idx = jnp.arange(K)[:, None]
            j_idx = jnp.arange(K)[None, :]
            in_rank = (i_idx < rank) & (j_idx < rank) & (j_idx >= i_idx)
            Rm = jnp.where(in_rank, Rpad,
                           jnp.where(i_idx == j_idx, 1.0, 0.0).astype(dtype))
            Bpad = lod[below_fr:, :n].take(cols_k, axis=1)
            L = solve_triu_right(Bpad, Rm)
            Lm = jnp.where(jnp.arange(K)[None, :] < rank, L, 0)
            Up = lod[fr : fr + K, :]
            Up = jnp.where(jnp.arange(K)[:, None] < rank, Up, 0)
            posmask_p1 = jnp.concatenate([pos >= col_index, jnp.ones((1,), bool)])
            Up = jnp.where(posmask_p1[None, :], Up, 0)
            below = lod[below_fr:, :]
            new_below = below - Lm @ Up
            # write L into the physical columns at positions [first_col,
            # col_index)
            rel = jnp.clip(pos - first_col, 0, K - 1)
            L_full = Lm.take(rel, axis=1)
            store = jnp.concatenate(
                [(pos >= first_col) & (pos < col_index), jnp.zeros((1,), bool)])
            L_full = jnp.concatenate(
                [L_full, jnp.zeros((L_full.shape[0], 1), dtype)], axis=1)
            new_below = jnp.where(store[None, :], L_full, new_below)
            lod = lod.at[below_fr:, :].set(new_below)

    # --- physicalize: position q holds column col_at[q]
    lod_phys = jnp.concatenate(
        [lod[:, :n].take(col_at, axis=1), lod[:, n:]], axis=1)
    if regularize:
        null_space = jnp.concatenate(
            [null_space[:, :n].take(col_at, axis=1), null_space[:, n:]],
            axis=1)

    return LexQR(
        lod=lod_phys, hh=hh, perm=col_at, rank_row=rank_row,
        ranks=jnp.stack(ranks) if ranks else jnp.zeros((0,), jnp.int32),
        first_col=jnp.stack(first_cols) if first_cols else jnp.zeros((0,), jnp.int32),
        total_rank=col_index, fixed_mask=fixed_mask, fixed_val=fixed_val,
        null_space=null_space,
        X_mu=X_mu, residual_mu=residual_mu,
        reg_factors=reg_factors if track_mu else jnp.zeros((0,), dtype),
        dims=tuple(dims), n_var=n,
    )


# ---------------------------------------------------------------------------
# Solves
# ---------------------------------------------------------------------------


def solve(f: LexQR) -> jax.Array:
    """Basic solution (free variables = 0), reference ``lexlse.h:1015-1045``.

    The reference's per-level back-substitution collapses into one gathered
    n x n triangular solve: row q of the gathered system is the pivot row
    occupying position q (identity rows beyond ``total_rank``).
    """
    n = f.n_var
    dtype = f.lod.dtype
    if f.lod.shape[0] == 0:
        # bounds-only hierarchy: no general levels, x is the fixed values
        return jnp.where(f.fixed_mask, f.fixed_val, jnp.zeros((n,), dtype))
    q = jnp.arange(n)
    U = f.lod[f.rank_row, :]  # (n, n+1) gathered pivot rows
    live = q < f.total_rank
    Utri = jnp.where(live[:, None], jnp.triu(U[:, :n]), jnp.eye(n, dtype=dtype))
    rhs = jnp.where(live, U[:, n], 0)
    x_pos = solve_triu(Utri, rhs)
    x = jnp.zeros(n, dtype).at[f.perm].set(x_pos)
    return jnp.where(f.fixed_mask, f.fixed_val, x)


def solve_least_norm(f: LexQR) -> jax.Array:
    """Least-norm completion via the normal equations on the free block,
    reference ``solveLeastNorm_2`` (``lexlse.h:1138-1213``).

    In position space the gathered staircase is [R | T | rhs] with R the
    total_rank x total_rank triangular block; the free part solves
    (T'T + I) x_free = T' t_rhs with T = R^{-1} (trailing columns).  Fixed
    variables never enter (their columns are zero, so their free component
    solves to 0 and is overwritten by the fixed value).
    """
    n = f.n_var
    dtype = f.lod.dtype
    q = jnp.arange(n)
    live = q < f.total_rank
    U = f.lod[f.rank_row, :]
    Utri = jnp.where(live[:, None], jnp.triu(U[:, :n]), jnp.eye(n, dtype=dtype))
    rhs = jnp.where(live, U[:, n], 0)

    # W = R^{-1} [T | rhs] in position space: solve against *all* columns,
    # then keep only the free ones.  Columns of Utri beyond total_rank are
    # the T block (plus identity rows below) — mask to isolate.
    TR = jnp.where(live[:, None], jnp.where(~live[None, :], U[:, :n], 0), 0)
    aug = jnp.concatenate([TR, rhs[:, None]], axis=1)
    W = jax.scipy.linalg.solve_triangular(Utri, aug, lower=False)
    T, t = W[:, :n], W[:, n]

    free = (~live) & (~f.fixed_mask[f.perm])
    Tf = jnp.where(free[None, :], T, 0)
    D = Tf.T @ Tf + jnp.eye(n, dtype=dtype)
    d = Tf.T @ t
    x_free = jnp.linalg.solve(D, d) * free

    # x_rank = R^{-1}(rhs - T_cols x_free) on the rank positions
    x_rank = jax.scipy.linalg.solve_triangular(
        Utri, rhs - jnp.where(live[:, None], jnp.where(~live[None, :], U[:, :n], 0), 0) @ x_free,
        lower=False,
    ) * live
    x_pos = x_rank + x_free
    x = jnp.zeros(n, dtype).at[f.perm].set(x_pos)
    return jnp.where(f.fixed_mask, f.fixed_val, x)


def _gathered_staircase(f: LexQR):
    """(Utri, rhs, live): the n x n gathered position-space staircase.

    Row q holds the pivot row occupying position q (identity rows beyond
    ``total_rank``); ``live`` marks rank positions.  This is the R|T
    storage the reference copies into ``array`` (``lexlse.h:1080-1094``),
    realized as masks instead of compaction."""
    n = f.n_var
    dtype = f.lod.dtype
    q = jnp.arange(n)
    live = q < f.total_rank
    if f.lod.shape[0] == 0:
        eye = jnp.eye(n, dtype=dtype)
        return eye, jnp.zeros((n,), dtype), live, jnp.zeros((n, n + 1), dtype)
    U = f.lod[f.rank_row, :]
    Utri = jnp.where(live[:, None], jnp.triu(U[:, :n]), jnp.eye(n, dtype=dtype))
    rhs = jnp.where(live, U[:, n], 0)
    return Utri, rhs, live, U


def solve_least_norm_1(f: LexQR) -> jax.Array:
    """Least-norm completion via an orthogonal factorization.

    The reference's ``solveLeastNorm_1`` (``lexlse.h:1052-1131``) applies
    a Givens sequence on the right to annihilate the free columns of
    [R | T] — an orthogonal method.  The TPU-native equivalent solves the
    same problem min ||y||^2 + ||t_hat - T_hat y||^2 (T_hat = R^{-1}T,
    t_hat = R^{-1}rhs) by one QR of the stacked [T_hat; I] — a fused MXU
    factorization instead of a scalar rotation sequence; identical result,
    comparable numerics (orthogonal, no normal-equations squaring)."""
    n = f.n_var
    dtype = f.lod.dtype
    Utri, rhs, live, U = _gathered_staircase(f)
    T = jnp.where(live[:, None], jnp.where(~live[None, :], U[:, :n], 0), 0)
    aug = jnp.concatenate([T, rhs[:, None]], axis=1)
    W = jax.scipy.linalg.solve_triangular(Utri, aug, lower=False)
    T_hat, t_hat = W[:, :n], W[:, n]

    free = (~live) & (~f.fixed_mask[f.perm])
    T_hat = jnp.where(free[None, :], T_hat, 0)
    # stacked LS: rows 0..n-1 = T_hat, rows n..2n-1 = I; non-free columns
    # are unit columns against a zero target, so their solution is 0
    S = jnp.concatenate([T_hat, jnp.eye(n, dtype=dtype)], axis=0)
    b = jnp.concatenate([t_hat, jnp.zeros((n,), dtype)])
    Q, Rq = jnp.linalg.qr(S)
    y = jax.scipy.linalg.solve_triangular(Rq, Q.T @ b, lower=False)
    x_free = y * free

    x_rank = jax.scipy.linalg.solve_triangular(
        Utri, rhs - T @ x_free, lower=False) * live
    x = jnp.zeros(n, dtype).at[f.perm].set(x_rank + x_free)
    return jnp.where(f.fixed_mask, f.fixed_val, x)


def solve_least_norm_3(f: LexQR) -> jax.Array:
    """Least-norm completion reusing the accumulated Tikhonov nullspace
    basis (reference ``solveLeastNorm_3``, ``lexlse.h:1222-1277``):
    requires ``factorize`` with regularization_type = TIKHONOV and zero
    factors, which accumulates Z = cumprod [-R_k^{-1}T_k; I] so that
    -null_space[:, free] = R^{-1}T and -null_space[:, n] = R^{-1}rhs."""
    n = f.n_var
    dtype = f.lod.dtype
    q = jnp.arange(n)
    live = q < f.total_rank
    free = (~live) & (~f.fixed_mask[f.perm])
    T_hat = jnp.where(live[:, None] & free[None, :], -f.null_space[:, :n], 0)
    t_hat = jnp.where(live, -f.null_space[:, n], 0)
    D = T_hat.T @ T_hat + jnp.eye(n, dtype=dtype)
    x_free = jnp.linalg.solve(D, T_hat.T @ t_hat) * free
    x_rank = (t_hat - T_hat @ x_free) * live
    x = jnp.zeros(n, dtype).at[f.perm].set(x_rank + x_free)
    return jnp.where(f.fixed_mask, f.fixed_val, x)


def solve_general_norm(f: LexQR, M: jax.Array, m_rhs: jax.Array) -> jax.Array:
    """Solution minimizing ||M x - m_rhs||^2 over the solution set
    (reference ``solveGeneralNorm``, ``lexlse.h:1286-1363``).

    ``M`` is (r, n) in user variable order; columns are permuted into
    position space, the rank block is eliminated through R, and the free
    part solves the projected normal equations (identity-extended where
    the free block is empty)."""
    n = f.n_var
    dtype = f.lod.dtype
    Utri, rhs, live, U = _gathered_staircase(f)
    T = jnp.where(live[:, None], jnp.where(~live[None, :], U[:, :n], 0), 0)

    Mp = M[:, f.perm]
    M_rank = jnp.where(live[None, :], Mp, 0)
    # LB = M_rank R^{-1}  (solve on the right; identity-extended R)
    LB = jax.scipy.linalg.solve_triangular(Utri.T, M_rank.T, lower=True).T
    LB = jnp.where(live[None, :], LB, 0)
    aug = jnp.concatenate([T, rhs[:, None]], axis=1)
    TBaug = jnp.concatenate(
        [jnp.where(~live[None, :], Mp, 0), m_rhs[:, None]], axis=1) - LB @ aug
    free = (~live) & (~f.fixed_mask[f.perm])
    TB = jnp.where(free[None, :], TBaug[:, :n], 0)
    D = TB.T @ TB
    D = jnp.where(free[:, None] & free[None, :], D, jnp.eye(n, dtype=dtype))
    x_free = jnp.linalg.solve(D, TB.T @ TBaug[:, n] * free) * free
    x_rank = jax.scipy.linalg.solve_triangular(
        Utri, rhs - T @ x_free, lower=False) * live
    x = jnp.zeros(n, dtype).at[f.perm].set(x_rank + x_free)
    return jnp.where(f.fixed_mask, f.fixed_val, x)


# ---------------------------------------------------------------------------
# Residual and Lagrange multipliers
# ---------------------------------------------------------------------------


def _level_wy(f: LexQR, obj: int) -> Tuple[jax.Array, jax.Array]:
    """Compact WY factors of level ``obj``'s Householder sequence.

    Q_obj = H_0 ... H_{K-1} = I - W V^T with V the unit-lower-trapezoid of
    reflection vectors and W = V T, where T^{-1} = diag(1/tau) +
    striu(V^T V) (Puglisi's compact-WY identity).  Dead reflections
    (tau = 0, beyond the discovered rank) get a zero V column and a unit
    T^{-1} diagonal, i.e. contribute the identity.

    This replaces the reference's sequential reflection replay
    (``applyOnTheLeft(householderSequence(...))``, ``lexlse.h:550``) with
    two matvecs per application — MXU work instead of a K-step loop.
    """
    offsets, _ = _level_offsets(f.dims)
    fr, dim = offsets[obj], f.dims[obj]
    K = min(dim, f.n_var)
    return _wy_raw(f.lod, f.hh, fr, dim, K, f.first_col[obj], f.n_var)


def _wy_raw(lod, hh, fr, dim, K, fcol, n, cols=None):
    """WY factors from raw factorization storage (usable mid-factorize).

    ``cols`` overrides the pivot-column indices (the virtual-permutation
    tier passes ``col_at``-gathered physical columns; the physical tier's
    columns are already in position order)."""
    dtype = lod.dtype
    if cols is None:
        cols = jnp.minimum(fcol + jnp.arange(K, dtype=jnp.int32), n)
    M = lod[fr : fr + dim, :].take(cols, axis=1)
    rloc = jnp.arange(dim)[:, None]
    jj = jnp.arange(K)[None, :]
    tau = lax.dynamic_slice_in_dim(hh, fr, dim)[:K]
    live = tau != 0
    V = jnp.where(rloc > jj, M, jnp.where(rloc == jj, 1.0, 0.0).astype(dtype))
    V = V * live[None, :].astype(dtype)
    S = V.T @ V
    Tinv = jnp.triu(S, 1) + jnp.diag(
        jnp.where(live, 1.0 / jnp.where(live, tau, 1.0), 1.0))
    # W = V T  (multiply by the inverted upper-triangular T^{-1};
    # matmul-based inversion, see lexls_tpu.ops.tri)
    W = solve_triu_right(V, Tinv)
    return V, W


def _apply_hh_seq(f: LexQR, obj: int, seg: jax.Array,
                  wy: Optional[Tuple[jax.Array, jax.Array]] = None) -> jax.Array:
    """Apply Q_obj = H_0 ... H_{K-1} to ``seg`` via the compact WY form
    (reflections with tau = 0 are identity, masking steps beyond the
    discovered rank).  ``wy`` passes precomputed factors when one level's
    Q is applied repeatedly (the λ sweep)."""
    V, W = wy if wy is not None else _level_wy(f, obj)
    return seg - W @ (V.T @ seg)


def residual(f: LexQR) -> jax.Array:
    """v = A x* - b reconstructed per level through the Householder
    sequence (reference ``get_v``, ``lexlse.h:1560-1582``)."""
    offsets, m = _level_offsets(f.dims)
    v = jnp.zeros((m,), f.lod.dtype)
    for obj, (fr, dim) in enumerate(zip(offsets, f.dims)):
        if dim == 0:
            continue
        rows = jnp.arange(dim)
        rhs_seg = lax.dynamic_slice_in_dim(f.lod[:, f.n_var], fr, dim)
        seg = jnp.where(rows >= f.ranks[obj], -rhs_seg, 0)
        v = lax.dynamic_update_slice_in_dim(v, _apply_hh_seq(f, obj, seg), fr, axis=0)
    return v


def objective_sensitivity(
    f: LexQR, obj_index: int, A_fixed_cols: Optional[jax.Array] = None,
    wy_factors: Optional[list] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Lagrange multipliers of objective ``obj_index`` (static int).

    Returns (lam_fixed (n,), lam (m,)): ``lam`` holds multipliers for every
    constraint row of levels <= obj_index (zero elsewhere, including masked
    rows); ``lam_fixed`` holds per-variable multipliers of the fixed
    variables (zero where not fixed), computed as -A_fix^T lam with the
    *original* fixed columns supplied via ``A_fixed_cols`` (m, n).

    Mirrors reference ``ObjectiveSensitivity`` (``lexlse.h:611-762``): the
    residual of level obj_index is reconstructed through Q, then multipliers
    back-propagate through the coupling blocks of all higher levels.
    """
    offsets, m = _level_offsets(f.dims)
    n = f.n_var
    dtype = f.lod.dtype
    lam = jnp.zeros((m,), dtype)
    rhs = jnp.zeros((n,), dtype)
    col_pos = jnp.arange(n)

    fr, dim = offsets[obj_index], f.dims[obj_index]
    rows = jnp.arange(dim)
    rhs_seg = lax.dynamic_slice_in_dim(f.lod[:, n], fr, dim)
    seg = jnp.where(rows >= f.ranks[obj_index], -rhs_seg, 0)
    wy = (lambda k: wy_factors[k]) if wy_factors is not None else (lambda k: None)
    seg = _apply_hh_seq(f, obj_index, seg, wy=wy(obj_index))
    lam = lax.dynamic_update_slice_in_dim(lam, seg, fr, axis=0)

    if obj_index > 0:
        block = lax.dynamic_slice_in_dim(f.lod, fr, dim, axis=0)[:, :n]
        contrib = block.T @ seg
        rhs = rhs - jnp.where(col_pos < f.first_col[obj_index], contrib, 0)
        for k in range(obj_index - 1, -1, -1):
            frk, dimk = offsets[k], f.dims[k]
            K = min(dimk, n)
            rowsk = jnp.arange(dimk)
            cols = jnp.minimum(f.first_col[k] + jnp.arange(K, dtype=jnp.int32), n - 1)
            rhs_slice = rhs.take(cols)
            segk = jnp.zeros((dimk,), dtype).at[:K].set(rhs_slice)
            segk = jnp.where(rowsk < f.ranks[k], segk, 0)
            segk = _apply_hh_seq(f, k, segk, wy=wy(k))
            lam = lax.dynamic_update_slice_in_dim(lam, segk, frk, axis=0)
            blockk = lax.dynamic_slice_in_dim(f.lod, frk, dimk, axis=0)[:, :n]
            contrib = blockk.T @ segk
            rhs = rhs - jnp.where(col_pos < f.first_col[k], contrib, 0)

    lam_fixed = jnp.zeros((n,), dtype)
    if A_fixed_cols is not None:
        lam_fixed = jnp.where(f.fixed_mask, -(A_fixed_cols.T @ lam), 0)
    return lam_fixed, lam


def sensitivities_all(
    f: LexQR, A_fixed_cols: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """All objectives' multipliers at once: (lam_fixed_all (p, n),
    lam_all (p, m)), row j = λ of objective j.

    Transposed evaluation of the p back-propagations of
    :func:`objective_sensitivity`: one global pass per level k
    (descending) computes objective k's residual segment AND every
    higher objective's level-k back-substitution segment in a single
    batched WY application — O(p) level passes of (p, dim)-wide matmuls
    instead of O(p^2) narrow ones.  Exact same arithmetic per (j, k)
    pair as the per-objective routine.
    """
    offsets, m = _level_offsets(f.dims)
    n = f.n_var
    p = len(f.dims)
    dtype = f.lod.dtype
    col_pos = jnp.arange(n)
    j_idx = jnp.arange(p)[:, None]

    lam_all = jnp.zeros((p, m), dtype)
    rhs_all = jnp.zeros((p, n), dtype)

    for k in range(p - 1, -1, -1):
        fr, dim = offsets[k], f.dims[k]
        if dim == 0:
            continue
        K = min(dim, n)
        rows = jnp.arange(dim)
        V, W = _level_wy(f, k)

        # objective k's own (top) segment: Q_k [0; -rhs_tail]
        rhs_seg = lax.dynamic_slice_in_dim(f.lod[:, n], fr, dim)
        seg_top = jnp.where(rows >= f.ranks[k], -rhs_seg, 0)

        # higher objectives' back-prop segments: Q_k [z_j; 0]
        cols = jnp.minimum(f.first_col[k] + jnp.arange(K, dtype=jnp.int32), n - 1)
        Z = rhs_all[:, cols]                       # (p, K)
        segs = jnp.zeros((p, dim), dtype).at[:, :K].set(Z)
        segs = jnp.where(rows[None, :] < f.ranks[k], segs, 0)

        seg_k = jnp.where(j_idx == k, seg_top[None, :], segs)  # (p, dim)
        # batched Q_k apply, row form: (Q z)^T = z^T - (z^T V) W^T
        seg_k = seg_k - (seg_k @ V) @ W.T
        valid = j_idx >= k
        seg_k = jnp.where(valid, seg_k, 0)

        lam_all = lax.dynamic_update_slice_in_dim(lam_all, seg_k, fr, axis=1)

        # rhs_j -= (block_k^T seg_k_j) on positions < first_col[k]
        block = lax.dynamic_slice_in_dim(f.lod, fr, dim, axis=0)[:, :n]
        contrib = seg_k @ block                                # (p, n)
        rhs_all = jnp.where(valid & (col_pos[None, :] < f.first_col[k]),
                            rhs_all - contrib, rhs_all)

    lam_fixed_all = jnp.zeros((p, n), dtype)
    if A_fixed_cols is not None:
        lam_fixed_all = jnp.where(f.fixed_mask[None, :],
                                  -(lam_all @ A_fixed_cols), 0)
    return lam_fixed_all, lam_all


def lambda_matrix(f: LexQR, A_fixed_cols: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
    """All multipliers: (lam_fixed (n, p), lam (m, p)); column k = λ of
    objective k (cf. the MEX ``debug.lambda`` output)."""
    lf, lm = [], []
    for k in range(len(f.dims)):
        a, b_ = objective_sensitivity(f, k, A_fixed_cols)
        lf.append(a)
        lm.append(b_)
    return jnp.stack(lf, axis=1), jnp.stack(lm, axis=1)
