"""Random problem generators with controlled per-level rank.

Port of the semantics of the reference's MATLAB fixture
``interfaces/matlab-octave/tests/implementation/utility/define_problem.m``:
level ``i`` contributes exactly rank ``r[i]`` on top of the previous levels
(its rows are random combinations of all previous rows plus ``r[i]`` fresh
random rows).  This is the key fixture for rank-deficiency coverage.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..types import (
    InequalityHierarchy,
    build_general_hierarchy,
    build_hierarchy_with_bounds,
)


def random_equality_hierarchy(
    rng: np.random.Generator,
    n_var: int,
    dims: Sequence[int],
    ranks: Optional[Sequence[int]] = None,
    fixed_variables: int = 0,
):
    """Return (A, b, dims, fixed_idx, fixed_val) with controlled ranks.

    ``ranks[i]`` = rank that level i contributes on top of levels < i.
    ``fixed_variables`` > 0 prepends that many variable-fixing rows
    (handled by the caller as fixed variables, not as a level).
    """
    dims = list(dims)
    if ranks is None:
        ranks = list(dims)
    ranks = list(ranks)
    assert len(ranks) == len(dims)

    C = np.zeros((0, n_var))
    A_levels = []
    b_levels = []
    for i, (m_i, r_i) in enumerate(zip(dims, ranks)):
        prev_rows = C.shape[0]
        fresh = rng.standard_normal((r_i, n_var))
        mix = rng.standard_normal((m_i, prev_rows + r_i))
        A_i = mix @ np.concatenate([C, fresh], axis=0)
        b_i = rng.standard_normal(m_i)
        C = np.concatenate([C, A_i], axis=0)
        # rescale to keep magnitudes bounded across many levels
        s = np.abs(C).max()
        if s > 1.0:
            C = C / s
        A_levels.append(A_i)
        b_levels.append(b_i)

    if A_levels:
        A = np.concatenate(A_levels, axis=0)
        b = np.concatenate(b_levels)
    else:  # e.g. a bounds-only hierarchy: no general levels
        A = np.zeros((0, n_var))
        b = np.zeros(0)

    fixed_idx = fixed_val = None
    if fixed_variables > 0:
        fixed_idx = rng.permutation(n_var)[:fixed_variables]
        fixed_val = rng.standard_normal(fixed_variables)

    return A, b, tuple(dims), fixed_idx, fixed_val


def random_inequality_hierarchy(
    rng: np.random.Generator,
    n_var: int,
    dims: Sequence[int],
    ranks: Optional[Sequence[int]] = None,
    equality_fraction: float = 0.2,
    tight_fraction: float = 0.5,
    simple_bounds: bool = False,
) -> InequalityHierarchy:
    """Random inequality hierarchy.

    A fraction of rows become equalities (lb == ub); the rest get finite
    two-sided bounds around a random interior point, with ``tight_fraction``
    of them likely to be active at the optimum (narrow intervals).
    """
    gen_dims = list(dims)
    bound_idx = bound_lb = bound_ub = None
    if simple_bounds:
        n0 = gen_dims[0]
        bound_idx = rng.permutation(n_var)[:n0]
        center = rng.standard_normal(n0)
        half = np.abs(rng.standard_normal(n0)) * 0.5 + 0.05
        eq0 = rng.random(n0) < equality_fraction
        bound_lb = np.where(eq0, center, center - half)
        bound_ub = np.where(eq0, center, center + half)
        gen_dims = gen_dims[1:]

    A, b, _, _, _ = random_equality_hierarchy(rng, n_var, gen_dims, ranks if ranks is None else list(ranks)[1 if simple_bounds else 0 :])

    eq = rng.random(len(b)) < equality_fraction
    width = np.where(rng.random(len(b)) < tight_fraction, 0.01, 1.0)
    half = np.abs(rng.standard_normal(len(b))) * width + 1e-3
    lb = np.where(eq, b, b - half)
    ub = np.where(eq, b, b + half)

    objectives = []
    ofs = 0
    for d in gen_dims:
        objectives.append((A[ofs : ofs + d], lb[ofs : ofs + d], ub[ofs : ofs + d]))
        ofs += d

    if simple_bounds:
        return build_hierarchy_with_bounds(bound_idx, bound_lb, bound_ub, objectives, n_var=n_var)
    return build_general_hierarchy(objectives)


def lex_solve_nullspace(
    A: np.ndarray, b: np.ndarray, dims: Sequence[int], rcond: float = 1e-10
) -> Tuple[np.ndarray, np.ndarray]:
    """Brute-force SVD-based equality lexicographic LS (independent of the
    l-QR): minimize ||A_1 x - b_1||, then ||A_2 x - b_2|| over the argmin
    set, etc.  Returns (x, v) with v the stacked residuals.

    This is oracle #2: used to validate the NumPy l-QR oracle itself.
    """
    n = A.shape[1]
    x = np.zeros(n)
    Z = np.eye(n)  # basis of the remaining free subspace
    ofs = 0
    for d in dims:
        Ak = A[ofs : ofs + d]
        bk = b[ofs : ofs + d]
        if Z.shape[1] > 0:
            M = Ak @ Z
            r = bk - Ak @ x
            U, s, Vt = np.linalg.svd(M, full_matrices=True)
            # absolute floor: a level made of combinations of previous rows
            # has M ~ 0 up to roundoff of the *original* scale of Ak
            scale = max(1.0, float(np.abs(Ak).max()))
            cutoff = max((s[0] * rcond) if s.size else 0.0, scale * 1e-9)
            rank = int((s > cutoff).sum())
            y = Vt[:rank].T @ ((U[:, :rank].T @ r) / s[:rank])
            x = x + Z @ y
            # contract the free subspace by the row space of M
            Z = Z @ Vt[rank:].T
        ofs += d
    v = A @ x - b
    return x, v
