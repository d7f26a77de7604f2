"""NumPy oracle for the equality-constrained lexicographic LS solver.

This is an independent re-implementation (in plain NumPy, float64,
dynamic shapes) of the *semantics* of the reference solver:

  * lexicographic QR ("l-QR"): column-pivoted Householder QR per priority
    level + Gauss elimination of the trailing block
    (reference ``include/lexls/lexlse.h:117-506`` and the MATLAB prototype
    ``interfaces/matlab-octave/tests/implementation/lexqr/lexqr_form.m``)
  * basic solve via blockwise back-substitution (``lexlse.h:1015-1045``)
  * residual reconstruction through the Householder sequence
    (``lexlse.h:1560-1582``)
  * Lagrange-multiplier back-propagation / objective sensitivity
    (``lexlse.h:511-762``)
  * least-norm completions (``lexlse.h:1052-1277``)
  * fixed-variable handling (``lexlse.h:132-156, 1381-1419``)

It plays the role of the reference's MATLAB validation prototype: the JAX
solver is tested against this oracle, and this oracle is tested against
mathematical invariants (KKT conditions, lexicographic optimality).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..types import CtrType, ParametersLexLSE, RegularizationType


# ---------------------------------------------------------------------------
# Householder primitives (Eigen conventions: makeHouseholderInPlace /
# applyHouseholderOnTheLeft, see reference ``lexlse.h:241-246``)
# ---------------------------------------------------------------------------


def make_householder(x: np.ndarray) -> Tuple[float, float, np.ndarray]:
    """Return (tau, beta, essential) such that

        (I - tau * u u^T) x = beta * e1,   u = [1; essential].

    Matches Eigen's ``makeHouseholder``: tau = 0 when the tail is zero.
    """
    c0 = x[0]
    tail = x[1:]
    s = float(tail @ tail)
    if s == 0.0:
        return 0.0, float(c0), np.zeros_like(tail)
    beta = float(np.sqrt(c0 * c0 + s))
    if c0 >= 0.0:
        beta = -beta
    essential = tail / (c0 - beta)
    tau = (beta - c0) / beta
    return float(tau), beta, essential


def apply_householder_left(M: np.ndarray, essential: np.ndarray, tau: float) -> None:
    """In-place M := (I - tau u u^T) M with u = [1; essential]."""
    if tau == 0.0:
        return
    u = np.concatenate(([1.0], essential))
    w = u @ M
    M -= tau * np.outer(u, w)


def apply_householder_seq_left(
    V: np.ndarray, h: np.ndarray, vec: np.ndarray
) -> np.ndarray:
    """Apply Q = H_0 H_1 ... H_{r-1} to ``vec`` (in a copy).

    ``V`` is (dim x r): essential vectors stored below the diagonal
    (column j, rows j+1..dim-1), ``h`` the Householder scalars (length dim,
    entry j used for reflection j).  Matches Eigen's
    ``householderSequence(...).applyOnTheLeft`` used at ``lexlse.h:550-552``:
    H_{r-1} is applied first.
    """
    out = vec.copy()
    dim, r = V.shape
    for j in range(r - 1, -1, -1):
        tau = h[j]
        if tau == 0.0:
            continue
        u = np.concatenate(([1.0], V[j + 1 :, j]))
        seg = out[j:dim]
        seg -= tau * u * (u @ seg)
    return out


# ---------------------------------------------------------------------------
# Factorization result
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LexQR:
    """The l-QR of a stacked hierarchy (oracle form; dynamic shapes)."""

    lod: np.ndarray  # in-place factorization storage, (m, n+1), rhs in last col
    hh_scalars: np.ndarray  # (m,)
    perm_cols: np.ndarray  # (n,) P = I[:, perm_cols]; x_user[perm_cols[j]] = x_pos[j]
    dims: Tuple[int, ...]
    ranks: List[int]
    first_row: List[int]
    first_col: List[int]
    total_rank: int
    n_var: int
    n_fixed: int
    fixed_values: np.ndarray  # values of fixed variables (in permuted head order)
    fixed_type: np.ndarray  # CtrType of each fixed variable
    fixed_a: np.ndarray  # original columns of fixed variables, (m, n_fixed)
    # regularized-multiplier machinery (TIKHONOV_1 only; reference
    # ``regularize_tikhonov_1_test`` lexlse.h:1774-1886)
    X_mu: Optional[np.ndarray] = None        # (n_var, n_obj) damped solutions
    X_mu_rhs: Optional[np.ndarray] = None    # (n_var, n_obj) scratch for initialize_rhs
    residual_mu: Optional[np.ndarray] = None  # (m,) damped residuals per level
    reg_factors: Optional[np.ndarray] = None


def factorize(
    A: np.ndarray,
    b: np.ndarray,
    dims: Tuple[int, ...],
    params: Optional[ParametersLexLSE] = None,
    fixed_idx: Optional[np.ndarray] = None,
    fixed_val: Optional[np.ndarray] = None,
    fixed_type: Optional[np.ndarray] = None,
    regularization: Optional[np.ndarray] = None,
) -> LexQR:
    """Lexicographic QR with column pivoting.

    Per level: column-pivoted Householder QR restricted to the remaining
    variables, rank cutoff at ``tol_linear_dependence``, then Gauss
    elimination of the sub-diagonal block against lower-priority levels
    (reference ``lexlse.h:117-506``).
    """
    if params is None:
        params = ParametersLexLSE()
    tol = params.tol_linear_dependence

    m, n_var = A.shape
    n_obj = len(dims)
    assert sum(dims) == m

    lod = np.concatenate([A.astype(np.float64, copy=True), b.reshape(-1, 1)], axis=1)
    hh_scalars = np.zeros(m)
    perm_cols = np.arange(n_var)
    first_row = list(np.cumsum((0,) + tuple(dims))[:-1].astype(int))
    first_col = [0] * n_obj
    ranks = [0] * n_obj

    # ---- fixed variables: permute to the front, eliminate from the RHS
    # (reference ``lexlse.h:132-156``)
    n_fixed = 0
    fixed_values = np.zeros(0)
    ftype = np.zeros(0, dtype=np.int64)
    fixed_a = np.zeros((m, 0))
    if fixed_idx is not None and len(fixed_idx) > 0:
        n_fixed = len(fixed_idx)
        fixed_values = np.asarray(fixed_val, dtype=np.float64).copy()
        if fixed_type is None:
            ftype = np.full(n_fixed, int(CtrType.ACTIVE_UB), dtype=np.int64)
        else:
            ftype = np.asarray(fixed_type, dtype=np.int64).copy()
        fi = np.asarray(fixed_idx, dtype=np.int64).copy()
        for k in range(n_fixed):
            coeff = fi[k]
            perm_cols[[k, coeff]] = perm_cols[[coeff, k]]
            if k != coeff:
                lod[:, [k, coeff]] = lod[:, [coeff, k]]
            # later fixed indices that pointed at column k now live at `coeff`
            for i in range(k + 1, n_fixed):
                if fi[i] == k:
                    fi[i] = coeff
                    break
        lod[:, n_var] -= lod[:, :n_fixed] @ fixed_values
        fixed_a = lod[:, :n_fixed].copy()

    col_index = n_fixed
    remaining_columns = n_var - n_fixed

    reg = np.zeros(n_obj) if regularization is None else np.asarray(regularization)
    # accumulated nullspace basis for Tikhonov variants (``lexlse.h:2592``)
    null_space = np.zeros((n_var, n_var + 1))

    if col_index >= n_var:
        return LexQR(
            lod=lod, hh_scalars=hh_scalars, perm_cols=perm_cols, dims=tuple(dims),
            ranks=ranks, first_row=first_row, first_col=[n_fixed] * n_obj,
            total_rank=n_fixed, n_var=n_var, n_fixed=n_fixed,
            fixed_values=fixed_values, fixed_type=ftype, fixed_a=fixed_a,
        )

    col_norms = np.zeros(n_var)
    terminated = False

    # regularized-multiplier machinery (TIKHONOV_1; reference
    # ``regularize_tikhonov_1_test``): damped per-level solutions X_mu and
    # damped residuals residual_mu
    track_mu = params.regularization_type == RegularizationType.TIKHONOV_1
    X_mu = np.zeros((n_var, n_obj)) if track_mu else None
    residual_mu = np.zeros(m) if track_mu else None

    for obj in range(n_obj):
        frow = first_row[obj]
        first_col[obj] = col_index
        dim = dims[obj]

        if terminated:
            if track_mu and obj > 0:
                # ``lexlse.h:475-490``: propagate to remaining levels
                X_mu[:, obj] = X_mu[:, obj - 1]
                residual_mu[frow : frow + dim] = -lod[frow : frow + dim, n_var]
            # reference ``lexlse.h:475-490``: propagate first_col to the
            # remaining levels, ranks stay 0
            if obj > 0:
                first_col[obj] = first_col[obj - 1] + ranks[obj - 1]
            continue

        if track_mu:
            # ``lexlse.h:188-191``: after the elimination steps, before
            # the Householder transformations
            residual_mu[frow : frow + dim] = lod[frow : frow + dim, n_var]

        col_norms[col_index:] = (lod[frow : frow + dim, col_index:n_var] ** 2).sum(axis=0)

        for counter in range(dim):
            row_index = frow + counter
            remaining_rows = dim - counter

            # pivot: column of max squared norm among remaining columns
            rel = int(np.argmax(col_norms[col_index:n_var]))
            piv = col_index + rel
            # stability recomputation (``lexlse.h:208-211``)
            max_val = float(
                (lod[row_index : row_index + remaining_rows, piv] ** 2).sum()
            )
            col_norms[piv] = max_val

            if max_val < tol:
                break

            # column permutation
            if col_index != piv:
                lod[:, [col_index, piv]] = lod[:, [piv, col_index]]
                col_norms[[col_index, piv]] = col_norms[[piv, col_index]]
                null_space[:, [col_index, piv]] = null_space[:, [piv, col_index]]
            perm_cols[[col_index, piv]] = perm_cols[[piv, col_index]]

            # Householder (applied to the remaining columns and the RHS)
            if remaining_rows > 1:
                seg = lod[row_index : row_index + remaining_rows, col_index]
                tau, beta, essential = make_householder(seg)
                lod[row_index, col_index] = beta
                lod[row_index + 1 : row_index + remaining_rows, col_index] = essential
                apply_householder_left(
                    lod[row_index : row_index + remaining_rows, col_index + 1 :],
                    essential,
                    tau,
                )
                hh_scalars[frow + counter] = tau

            col_index += 1
            remaining_columns = n_var - col_index
            if remaining_columns == 0:
                break

            if remaining_rows > 0:
                col_norms[col_index:n_var] -= lod[row_index, col_index:n_var] ** 2

        ranks[obj] = col_index - first_col[obj]

        # ---- variable (conditioning-driven) regularization factor
        # (reference ``lexlse.h:277-312``, Chiaverini damping formula)
        factor_eff = float(reg[obj])
        if params.variable_regularization_factor != 0.0:
            factor_eff = 0.0
            rk = ranks[obj]
            if rk > 0:
                fcol = first_col[obj]
                rhs_seg = lod[frow : frow + rk, n_var].copy()
                ce = float(rhs_seg @ rhs_seg)
                y = _solve_triu_left(lod[frow : frow + rk, fcol : fcol + rk], rhs_seg)
                denom = float(y @ y)
                if denom > 0.0:
                    ce /= denom
                eps = params.variable_regularization_factor
                if ce < eps:
                    factor_eff = np.sqrt(1.0 - (ce * ce) / (eps * eps)) * float(reg[obj])

        # ---- regularization of this level's RHS segment (before Gauss)
        if factor_eff != 0.0 and params.regularization_type != RegularizationType.NONE:
            y_mu = _apply_regularization(
                params, lod, null_space, n_var, n_fixed, frow, first_col[obj],
                ranks[obj], remaining_columns, factor_eff,
            )
            if track_mu and ranks[obj] > 0:
                # ``regularize_tikhonov_1_test`` extras: damped residual
                # and the damped solution of the obj-th problem
                fcol = first_col[obj]
                rk = ranks[obj]
                seg = np.zeros(dim)
                seg[:rk] = lod[frow : frow + rk, n_var]
                V = lod[frow : frow + dim, fcol : fcol + rk]
                rw = apply_householder_seq_left(
                    V, hh_scalars[frow : frow + dim], seg)
                residual_mu[frow : frow + dim] = (
                    rw - residual_mu[frow : frow + dim])
                # X_mu in position space: damped solution over [fcol, n)
                X_pos = np.zeros(n_var)
                X_pos[fcol:] = y_mu
                _get_intermediate_x(lod, X_pos, first_row, first_col, ranks,
                                    obj, fcol, n_var)
                # to variable (user) order
                X_mu[perm_cols, obj] = X_pos
        if params.regularization_type in (
            RegularizationType.TIKHONOV,
            RegularizationType.TIKHONOV_CG,
            RegularizationType.R,
            RegularizationType.TIKHONOV_1,
            RegularizationType.TIKHONOV_2,
        ):
            _accumulate_nullspace_basis(
                lod, null_space, n_fixed, frow, first_col[obj], ranks[obj],
                remaining_columns,
            )

        # ---- Gauss elimination of the sub-diagonal block
        # (reference ``lexlse.h:431-471``)
        rank = ranks[obj]
        if obj < n_obj - 1 and rank > 0:
            next_row = frow + dim
            below = lod[next_row:m, :]
            fcol = first_col[obj]
            R = lod[frow : frow + rank, fcol : fcol + rank]
            # L = B R^{-1}  (triangular solve on the right)
            Lblk = _solve_triu_right(below[:, fcol : fcol + rank], R)
            below[:, fcol : fcol + rank] = Lblk
            up = lod[frow : frow + rank, col_index:]
            below[:, col_index:] -= Lblk @ up

        if remaining_columns == 0:
            terminated = True

    total_rank = n_fixed + sum(ranks)

    return LexQR(
        lod=lod, hh_scalars=hh_scalars, perm_cols=perm_cols, dims=tuple(dims),
        ranks=ranks, first_row=first_row, first_col=first_col,
        total_rank=total_rank, n_var=n_var, n_fixed=n_fixed,
        fixed_values=fixed_values, fixed_type=ftype, fixed_a=fixed_a,
        X_mu=X_mu, X_mu_rhs=None if X_mu is None else np.zeros_like(X_mu),
        residual_mu=residual_mu, reg_factors=reg.copy(),
    )


def _get_intermediate_x(lod, X_pos, first_row, first_col, ranks, obj, fcol, n_var):
    """Complete the damped solution of the obj-th regularized problem
    (reference ``get_intermediate_x``, ``lexlse.h:2010-2071``): given the
    tail X_pos[fcol:] (this level's damped solve), back-substitute the
    earlier levels' rank positions through the current staircase."""
    if obj == 0:
        return
    for i in range(obj):
        fr_i, fc_i, r_i = first_row[i], first_col[i], ranks[i]
        X_pos[fc_i : fc_i + r_i] = (
            lod[fr_i : fr_i + r_i, n_var]
            - lod[fr_i : fr_i + r_i, fcol:n_var] @ X_pos[fcol:]
        )
    acc = 0
    for k in range(obj - 1, -1, -1):
        fr_k, fc_k, r_k = first_row[k], first_col[k], ranks[k]
        if r_k > 0:
            if acc > 0:
                fc_next = first_col[k + 1]
                X_pos[fc_k : fc_k + r_k] -= (
                    lod[fr_k : fr_k + r_k, fc_next : fc_next + acc]
                    @ X_pos[fc_next : fc_next + acc]
                )
            X_pos[fc_k : fc_k + r_k] = _solve_triu_left(
                lod[fr_k : fr_k + r_k, fc_k : fc_k + r_k],
                X_pos[fc_k : fc_k + r_k],
            )
            acc += r_k


def _initialize_rhs_regularized(f: LexQR, obj_index: int) -> np.ndarray:
    """Seed of the λ back-propagation in the regularized case
    (reference ``initialize_rhs``, ``lexlse.h:1920-1959``): forward
    substitution of -mu^2 X_mu through the transposed staircase."""
    n = f.n_var
    mu2 = float(f.reg_factors[obj_index]) ** 2
    # variable -> position order, scaled
    X = -mu2 * f.X_mu[f.perm_cols, obj_index]
    last_col = f.first_col[obj_index] + f.ranks[obj_index] - 1
    for k in range(obj_index + 1):
        fr_k, fc_k, r_k = f.first_row[k], f.first_col[k], f.ranks[k]
        if k > 0:
            remain = last_col - fc_k + 1
            fr_p, fc_p, r_p = f.first_row[k - 1], f.first_col[k - 1], f.ranks[k - 1]
            X[fc_k : fc_k + remain] -= (
                f.lod[fr_p : fr_p + r_p, fc_k : fc_k + remain].T
                @ X[fc_p : fc_p + r_p]
            )
        if r_k > 0:
            R = np.triu(f.lod[fr_k : fr_k + r_k, fc_k : fc_k + r_k])
            X[fc_k : fc_k + r_k] = np.linalg.solve(R.T, X[fc_k : fc_k + r_k])
    if f.X_mu_rhs is not None:
        # debug mirror of the MEX output: the reference's X_mu_rhs column
        # is a view mutated by the substitutions above, so the exported
        # state is the POST-substitution vector (lexlse.h:1925-1957)
        f.X_mu_rhs[:, obj_index] = X
    return X


def objective_sensitivity_regularized(
    f: LexQR, obj_index: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Lagrange multipliers of objective ``obj_index`` in the
    TIKHONOV_1-regularized case (reference ``ObjectiveSensitivity`` with
    ``compute_residual_from_factorization = false``, ``lexlse.h:648-690``):
    the top segment is the damped residual ``residual_mu`` and the
    back-propagation rhs is seeded by ``initialize_rhs``."""
    assert f.residual_mu is not None, "factorize with TIKHONOV_1 first"
    n_lambda = sum(f.dims[: obj_index + 1])
    lam = np.zeros(n_lambda)
    n_rank = sum(f.ranks[:obj_index])
    rhs = _initialize_rhs_regularized(f, obj_index)[: n_rank + f.n_fixed].copy()

    fr, fc = f.first_row[obj_index], f.first_col[obj_index]
    dim = f.dims[obj_index]
    lam[fr : fr + dim] = f.residual_mu[fr : fr + dim]

    if obj_index > 0:
        col_dim = fc
        rhs[:col_dim] -= f.lod[fr : fr + dim, :col_dim].T @ lam[fr : fr + dim]
        for k in range(obj_index - 1, -1, -1):
            fr, fc = f.first_row[k], f.first_col[k]
            dim, r = f.dims[k], f.ranks[k]
            seg = np.zeros(dim)
            seg[:r] = rhs[fc : fc + r]
            V = f.lod[fr : fr + dim, fc : fc + r]
            lam[fr : fr + dim] = apply_householder_seq_left(
                V, f.hh_scalars[fr : fr + dim], seg
            )
            col_dim = fc
            rhs[:col_dim] -= f.lod[fr : fr + dim, :col_dim].T @ lam[fr : fr + dim]

    lam_fixed = np.zeros(f.n_fixed)
    if f.n_fixed > 0:
        lam_fixed = -(f.fixed_a[:n_lambda, :].T @ lam)
    return lam_fixed, lam


def _solve_triu_right(B: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Return L with L @ triu(R) = B (solve on the right)."""
    import scipy.linalg

    if R.shape[0] == 0:
        return B
    return scipy.linalg.solve_triangular(R.T, B.T, lower=True).T


def _solve_triu_left(R: np.ndarray, y: np.ndarray) -> np.ndarray:
    import scipy.linalg

    if R.shape[0] == 0:
        return y
    return scipy.linalg.solve_triangular(R, y, lower=False)


# ---------------------------------------------------------------------------
# Regularization suite (reference ``lexlse.h:1700-2694``)
# ---------------------------------------------------------------------------


def _apply_regularization(
    params: ParametersLexLSE,
    lod: np.ndarray,
    null_space: np.ndarray,
    n_var: int,
    n_fixed: int,
    frow: int,
    fcol: int,
    rank: int,
    remaining: int,
    factor: float,
) -> None:
    rt = params.regularization_type
    if rt == RegularizationType.NONE:
        return
    if rt in (RegularizationType.TIKHONOV, RegularizationType.TIKHONOV_1,
              RegularizationType.TIKHONOV_2):
        if rt == RegularizationType.TIKHONOV:
            # dimension-based dispatch, reference ``lexlse.h:322-329``
            if fcol + rank <= remaining:
                _regularize_tikhonov_2(lod, null_space, n_var, n_fixed, frow, fcol, rank, remaining, factor)
            else:
                _regularize_tikhonov_1(lod, null_space, n_var, n_fixed, frow, fcol, rank, remaining, factor)
        elif rt == RegularizationType.TIKHONOV_1:
            return _regularize_tikhonov_1(lod, null_space, n_var, n_fixed, frow, fcol, rank, remaining, factor)
        else:
            _regularize_tikhonov_2(lod, null_space, n_var, n_fixed, frow, fcol, rank, remaining, factor)
    elif rt == RegularizationType.TIKHONOV_CG:
        _regularize_tikhonov_cg(params, lod, null_space, n_var, n_fixed, frow, fcol, rank, remaining, factor)
    elif rt == RegularizationType.R:
        _regularize_R(lod, null_space, n_var, n_fixed, frow, fcol, rank, factor)
    elif rt == RegularizationType.R_NO_Z:
        _regularize_R_no_z(lod, n_var, frow, fcol, rank, factor)
    elif rt == RegularizationType.RT_NO_Z:
        _regularize_RT_no_z(lod, n_var, frow, fcol, rank, remaining, factor)
    elif rt == RegularizationType.RT_NO_Z_CG:
        _regularize_RT_no_z_cg(params, lod, n_var, frow, fcol, rank, remaining, factor)
    elif rt == RegularizationType.TEST:
        lod[frow : frow + rank, n_var] *= factor


def _regularize_tikhonov_1(lod, null_space, n_var, n_fixed, frow, fcol, rank, remaining, factor):
    """Normal-equations Tikhonov incl. accumulated nullspace S_{k-1}
    (reference ``lexlse.h:1700-1763``)."""
    mu = factor * factor
    Rk = np.triu(lod[frow : frow + rank, fcol : fcol + rank])
    Tk = lod[frow : frow + rank, fcol + rank : fcol + rank + remaining]
    up = null_space[: fcol - n_fixed, fcol : fcol + rank + remaining]
    dim = rank + remaining
    RT = np.concatenate([Rk, Tk], axis=1)
    D = RT.T @ RT + mu * (up.T @ up) + mu * np.eye(dim)
    rhs = lod[frow : frow + rank, n_var]
    d = RT.T @ rhs + mu * (up.T @ null_space[: fcol - n_fixed, n_var])
    d = np.linalg.solve(D, d)
    lod[frow : frow + rank, n_var] = RT @ d
    return d  # the damped solution over positions [fcol, n_var)


def _regularize_tikhonov_2(lod, null_space, n_var, n_fixed, frow, fcol, rank, remaining, factor):
    """Dual-form Tikhonov (reference ``lexlse.h:2078-2133``)."""
    mu = factor * factor
    Rk = np.triu(lod[frow : frow + rank, fcol : fcol + rank])
    Tk = lod[frow : frow + rank, fcol + rank : fcol + rank + remaining]
    up = null_space[: fcol - n_fixed, fcol : fcol + rank + remaining]
    p = fcol - n_fixed
    D = np.zeros((p + rank, p + rank))
    D[:rank, :rank] = Rk @ Rk.T + Tk @ Tk.T
    D[rank:, rank:] = mu * (up @ up.T)
    D[rank:, :rank] = factor * (up[:, :rank] @ Rk.T + up[:, rank:] @ Tk.T)
    D[:rank, rank:] = D[rank:, :rank].T
    D += mu * np.eye(p + rank)
    d = np.concatenate(
        [lod[frow : frow + rank, n_var], factor * null_space[:p, n_var]]
    )
    d = np.linalg.solve(D, d)
    D -= mu * np.eye(p + rank)
    d = D @ d
    lod[frow : frow + rank, n_var] = d[:rank]


def _regularize_R(lod, null_space, n_var, n_fixed, frow, fcol, rank, factor):
    """Tikhonov on basic variables only (reference ``lexlse.h:2138-2170``)."""
    mu = factor * factor
    Rk = np.triu(lod[frow : frow + rank, fcol : fcol + rank])
    up = null_space[: fcol - n_fixed, fcol : fcol + rank]
    D = Rk.T @ Rk + mu * (up.T @ up) + mu * np.eye(rank)
    d = mu * (up.T @ null_space[: fcol - n_fixed, n_var]) + Rk.T @ lod[frow : frow + rank, n_var]
    d = np.linalg.solve(D, d)
    lod[frow : frow + rank, n_var] = Rk @ d


def _regularize_R_no_z(lod, n_var, frow, fcol, rank, factor):
    """Reference ``lexlse.h:2175-2202``."""
    mu = factor * factor
    Rk = np.triu(lod[frow : frow + rank, fcol : fcol + rank])
    D = Rk.T @ Rk + mu * np.eye(rank)
    d = Rk.T @ lod[frow : frow + rank, n_var]
    d = np.linalg.solve(D, d)
    lod[frow : frow + rank, n_var] = Rk @ d


def _regularize_RT_no_z(lod, n_var, frow, fcol, rank, remaining, factor):
    """min ||[R,T]x - b||^2 + mu^2||x||^2 via the dual
    (reference ``lexlse.h:2207-2242``)."""
    mu = factor * factor
    Rk = np.triu(lod[frow : frow + rank, fcol : fcol + rank])
    Tk = lod[frow : frow + rank, fcol + rank : fcol + rank + remaining]
    D = Rk @ Rk.T + Tk @ Tk.T + mu * np.eye(rank)
    d = np.linalg.solve(D, lod[frow : frow + rank, n_var])
    D -= mu * np.eye(rank)
    lod[frow : frow + rank, n_var] = D @ d


def _cgls(matvec, rmatvec, b_parts, x0, max_iter, tol=1e-12):
    """CGLS on the stacked least-squares system (reference ``lexlse.h:2367-2554``)."""
    x = x0.copy()
    r = b_parts - matvec(x)
    s = rmatvec(r)
    p = s.copy()
    gamma = float(s @ s)
    it = 0
    while np.sqrt(gamma) > tol and it < max_iter:
        q = matvec(p)
        alpha = gamma / float(q @ q)
        x += alpha * p
        r -= alpha * q
        s = rmatvec(r)
        gamma_prev = gamma
        gamma = float(s @ s)
        p = s + (gamma / gamma_prev) * p
        it += 1
    return x


def _regularize_tikhonov_cg(params, lod, null_space, n_var, n_fixed, frow, fcol, rank, remaining, factor):
    """Reference ``lexlse.h:2256-2279`` + ``cg_tikhonov`` ``:2367-2462``."""
    Rk = np.triu(lod[frow : frow + rank, fcol : fcol + rank])
    Tk = lod[frow : frow + rank, fcol + rank : fcol + rank + remaining]
    Sk = null_space[: fcol - n_fixed, fcol : fcol + rank + remaining]
    sk = null_space[: fcol - n_fixed, n_var]
    yk = lod[frow : frow + rank, n_var]
    dim = rank + remaining

    def matvec(x):
        return np.concatenate([
            Rk @ x[:rank] + Tk @ x[rank:],
            factor * (Sk @ x),
            factor * x,
        ])

    def rmatvec(r):
        r1, r2, r3 = r[:rank], r[rank : rank + Sk.shape[0]], r[rank + Sk.shape[0] :]
        out = factor * (Sk.T @ r2 + r3)
        out[:rank] += Rk.T @ r1
        out[rank:] += Tk.T @ r1
        return out

    b = np.concatenate([yk, factor * sk, np.zeros(dim)])
    sol = _cgls(matvec, rmatvec, b, np.zeros(dim), params.max_number_of_CG_iterations)
    lod[frow : frow + rank, n_var] = Rk @ sol[:rank] + Tk @ sol[rank:]


def _regularize_RT_no_z_cg(params, lod, n_var, frow, fcol, rank, remaining, factor):
    """Reference ``lexlse.h:2333-2356`` + ``cg_RT`` ``:2472-2554``."""
    Rk = np.triu(lod[frow : frow + rank, fcol : fcol + rank])
    Tk = lod[frow : frow + rank, fcol + rank : fcol + rank + remaining]
    yk = lod[frow : frow + rank, n_var]
    dim = rank + remaining

    def matvec(x):
        return np.concatenate([Rk @ x[:rank] + Tk @ x[rank:], factor * x])

    def rmatvec(r):
        r1, r3 = r[:rank], r[rank:]
        out = factor * r3
        out[:rank] += Rk.T @ r1
        out[rank:] += Tk.T @ r1
        return out

    b = np.concatenate([yk, np.zeros(dim)])
    sol = _cgls(matvec, rmatvec, b, np.zeros(dim), params.max_number_of_CG_iterations)
    lod[frow : frow + rank, n_var] = Rk @ sol[:rank] + Tk @ sol[rank:]


def _accumulate_nullspace_basis(lod, null_space, n_fixed, frow, fcol, rank, remaining):
    """Accumulate Z_1 * ... * Z_k with Z_j = [-inv(R_j) T_j; I]
    (reference ``lexlse.h:2592-2625``; the identity block is implicit)."""
    if rank == 0:
        return
    Rk = lod[frow : frow + rank, fcol : fcol + rank]
    up = lod[frow : frow + rank, fcol + rank :]  # T_k and the rhs column
    rows = fcol - n_fixed
    left = np.zeros((rows + rank, rank))
    left[:rows, :] = null_space[:rows, fcol : fcol + rank]
    left[rows:, :] = np.eye(rank)
    left = _solve_triu_right(left, np.triu(Rk))
    null_space[: rows + rank, fcol : fcol + rank] = left
    null_space[: rows + rank, fcol + rank :] -= left @ up


# ---------------------------------------------------------------------------
# Solves
# ---------------------------------------------------------------------------


def solve_basic(f: LexQR) -> np.ndarray:
    """Basic solution (free variables set to zero), ``lexlse.h:1015-1045``."""
    n = f.n_var
    x_pos = np.zeros(n)
    x_pos[: f.n_fixed] = f.fixed_values
    acc = 0
    for k in range(len(f.dims) - 1, -1, -1):
        r = f.ranks[k]
        if r == 0:
            continue
        fr, fc = f.first_row[k], f.first_col[k]
        rhs = f.lod[fr : fr + r, f.n_var].copy()
        if acc > 0:
            nc = f.first_col[k + 1]
            rhs -= f.lod[fr : fr + r, nc : nc + acc] @ x_pos[nc : nc + acc]
        x_pos[fc : fc + r] = _solve_triu_left(f.lod[fr : fr + r, fc : fc + r], rhs)
        acc += r
    x = np.zeros(n)
    x[f.perm_cols] = x_pos
    return x


def solve_least_norm(f: LexQR) -> np.ndarray:
    """Least-norm completion via the normal equations on the free block
    (reference ``solveLeastNorm_2``, ``lexlse.h:1138-1213``)."""
    n = f.n_var
    n_rank = sum(f.ranks)
    n_free = n - n_rank - f.n_fixed
    if n_free == 0:
        return solve_basic(f)

    # assemble RT = staircase [R, T | rhs] rows (r x (r + free + 1))
    RT = np.zeros((n_rank, n_rank + n_free + 1))
    counter = 0
    col_dim = n_rank + n_free
    for k in range(len(f.dims)):
        r = f.ranks[k]
        if r == 0:
            continue
        fr, fc = f.first_row[k], f.first_col[k]
        blk = f.lod[fr : fr + r, fc : fc + col_dim + 1]
        RT[counter : counter + r, counter : counter + col_dim + 1] = blk
        # zero below-diagonal entries of the R part (Householder storage)
        for j in range(r):
            RT[counter + j, counter : counter + j] = 0.0
        counter += r
        col_dim -= r
    R = RT[:, :n_rank]
    T = _solve_triu_left(R, RT[:, n_rank:])  # inv(R) * [T, rhs]
    Tfree, trhs = T[:, :n_free], T[:, n_free]
    D = Tfree.T @ Tfree + np.eye(n_free)
    d = Tfree.T @ trhs
    x_free = np.linalg.solve(D, d)

    x_pos = np.zeros(n)
    x_pos[: f.n_fixed] = f.fixed_values
    counter = 0
    for k in range(len(f.dims)):
        r = f.ranks[k]
        if r == 0:
            continue
        fr = f.first_row[k]
        x_pos[f.n_fixed + counter : f.n_fixed + counter + r] = (
            f.lod[fr : fr + r, f.n_var]
            - f.lod[fr : fr + r, n_rank + f.n_fixed : n_rank + f.n_fixed + n_free]
            @ x_free
        )
        counter += r
    x_pos[f.n_fixed : f.n_fixed + n_rank] = _solve_triu_left(
        np.triu(R), x_pos[f.n_fixed : f.n_fixed + n_rank]
    )
    x_pos[f.n_fixed + n_rank :] = x_free
    x = np.zeros(n)
    x[f.perm_cols] = x_pos
    return x


def residual(f: LexQR) -> np.ndarray:
    """Reconstruct v = A x* - b per level through the Householder sequence
    (reference ``get_v``, ``lexlse.h:1560-1582``)."""
    m = sum(f.dims)
    v = np.zeros(m)
    for k in range(len(f.dims)):
        fr, fc = f.first_row[k], f.first_col[k]
        dim, r = f.dims[k], f.ranks[k]
        seg = np.zeros(dim)
        seg[r:] = -f.lod[fr + r : fr + dim, f.n_var]
        V = f.lod[fr : fr + dim, fc : fc + r]
        v[fr : fr + dim] = apply_householder_seq_left(V, f.hh_scalars[fr : fr + dim], seg)
    return v


def objective_sensitivity(f: LexQR, obj_index: int) -> Tuple[np.ndarray, np.ndarray]:
    """Lagrange multipliers of objective ``obj_index`` w.r.t. all constraints
    of levels <= obj_index, plus fixed-variable multipliers.

    Returns (lambda_fixed (n_fixed,), lambda (n_lambda,)), where n_lambda
    covers the stacked rows of levels 0..obj_index.  Mirrors reference
    ``ObjectiveSensitivity`` (``lexlse.h:770-861``).
    """
    n_lambda = sum(f.dims[: obj_index + 1])
    lam = np.zeros(n_lambda)
    n_rank = sum(f.ranks[:obj_index])
    rhs = np.zeros(n_rank + f.n_fixed)

    fr, fc = f.first_row[obj_index], f.first_col[obj_index]
    dim, r = f.dims[obj_index], f.ranks[obj_index]

    seg = np.zeros(dim)
    seg[r:] = -f.lod[fr + r : fr + dim, f.n_var]
    V = f.lod[fr : fr + dim, fc : fc + r]
    lam[fr : fr + dim] = apply_householder_seq_left(V, f.hh_scalars[fr : fr + dim], seg)

    if obj_index > 0:
        col_dim = fc
        rhs[:col_dim] -= f.lod[fr : fr + dim, :col_dim].T @ lam[fr : fr + dim]
        for k in range(obj_index - 1, -1, -1):
            fr, fc = f.first_row[k], f.first_col[k]
            dim, r = f.dims[k], f.ranks[k]
            seg = np.zeros(dim)
            seg[:r] = rhs[fc : fc + r]
            V = f.lod[fr : fr + dim, fc : fc + r]
            lam[fr : fr + dim] = apply_householder_seq_left(
                V, f.hh_scalars[fr : fr + dim], seg
            )
            col_dim = fc
            rhs[:col_dim] -= f.lod[fr : fr + dim, :col_dim].T @ lam[fr : fr + dim]

    lam_fixed = np.zeros(f.n_fixed)
    if f.n_fixed > 0:
        lam_fixed = -(f.fixed_a[:n_lambda, :].T @ lam)
    return lam_fixed, lam


def lambda_matrix(f: LexQR) -> np.ndarray:
    """All multipliers: column k holds λ of objective k (rows = n_fixed
    fixed-variable rows followed by all constraint rows).

    Mirrors the debug λ matrix assembled by the MATLAB prototype
    (``lexqr_lambda.m``) and the MEX ``debug.lambda`` output.
    """
    m = sum(f.dims)
    L = np.zeros((f.n_fixed + m, len(f.dims)))
    for k in range(len(f.dims)):
        lam_fixed, lam = objective_sensitivity(f, k)
        L[: f.n_fixed, k] = lam_fixed
        L[f.n_fixed : f.n_fixed + len(lam), k] = lam
    return L
