"""Public façade (reference L5, ``include/lexls/lexls.h``).

``LexLSE`` mirrors the reference wrapper class: hold problem data, then
``solve(solve_option)`` = factorize + one of the four solves
(``lexls.h:39-63``).  The heavy lifting stays in the functional,
jit/vmap-friendly modules; this class is the convenient host-side entry
point for equality-only hierarchies, including the MEX feature set of
``lexlse.cpp`` (fixed variables, regularization, least-norm options).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import lexlse as le
from .types import EqualityHierarchy, LexLSError, ParametersLexLSE, RegularizationType


@dataclasses.dataclass
class LexLSEResult:
    x: np.ndarray
    v: np.ndarray                 # stacked residuals, per constraint row
    ranks: np.ndarray             # discovered rank per level
    total_rank: int
    lexqr: le.LexQR


class LexLSE:
    """Host-side equality-hierarchy solver (reference ``lexls.h:16-69``,
    MEX surface ``lexlse.cpp:25-247``)."""

    def __init__(self, prob: EqualityHierarchy,
                 params: Optional[ParametersLexLSE] = None,
                 reg_factors: Optional[np.ndarray] = None,
                 dtype=jnp.float64):
        self.prob = prob
        self.params = params or ParametersLexLSE()
        self.dtype = dtype
        n = prob.n_var
        if prob.fixed_idx is not None:
            fixed_mask = np.zeros(n, bool)
            fixed_mask[prob.fixed_idx] = True
            fixed_val = np.zeros(n)
            fixed_val[prob.fixed_idx] = prob.fixed_val
            self._fixed = (jnp.asarray(fixed_mask), jnp.asarray(fixed_val, dtype))
        else:
            self._fixed = (None, None)
        if reg_factors is None and self.params.regularization_type != RegularizationType.NONE:
            reg_factors = np.zeros(prob.n_obj)
        self._reg = None if reg_factors is None else jnp.asarray(reg_factors, dtype)
        self._f: Optional[le.LexQR] = None

    def factorize(self) -> le.LexQR:
        self._f = le.factorize(
            jnp.asarray(self.prob.A, self.dtype), jnp.asarray(self.prob.b, self.dtype),
            self.prob.dims, self.params,
            fixed_mask=self._fixed[0], fixed_val=self._fixed[1],
            reg_factors=self._reg,
        )
        return self._f

    def solve(self, solve_option: int = 0) -> LexLSEResult:
        """0: basic (free variables = 0); 1: least-norm, orthogonal;
        2: least-norm, normal equations; 3: least-norm via the Tikhonov
        nullspace basis (requires TIKHONOV regularization with zero
        factors).  Mirrors ``lexls.h:39-63``."""
        f = self.factorize()
        if solve_option == 0:
            x = le.solve(f)
        elif solve_option == 1:
            x = le.solve_least_norm_1(f)
        elif solve_option == 2:
            x = le.solve_least_norm(f)
        elif solve_option == 3:
            if self.params.regularization_type != RegularizationType.TIKHONOV:
                raise LexLSError(
                    "solve_option 3 requires regularization_type TIKHONOV "
                    "with zero factors (reference lexlse.h:1219-1221)")
            x = le.solve_least_norm_3(f)
        else:
            raise LexLSError(f"unknown solve_option {solve_option}")
        return self._result(f, x)

    def solve_general_norm(self, M: np.ndarray, m_rhs: np.ndarray) -> LexLSEResult:
        """min ||M x - m_rhs|| over the solution set (``lexlse.h:1286``)."""
        f = self.factorize()
        x = le.solve_general_norm(f, jnp.asarray(M, self.dtype),
                                  jnp.asarray(m_rhs, self.dtype))
        return self._result(f, x)

    def lambdas(self) -> np.ndarray:
        """λ matrix (m, p): column k = multipliers of objective k."""
        f = self._f or self.factorize()
        # original columns serve as the fixed-variable data snapshot
        A_cols = jnp.asarray(self.prob.A, self.dtype)
        _, lam = le.lambda_matrix(f, A_fixed_cols=A_cols)
        return np.asarray(lam)

    def _result(self, f: le.LexQR, x) -> LexLSEResult:
        xh = np.asarray(x)
        v = self.prob.A @ xh - self.prob.b
        return LexLSEResult(
            x=xh, v=v, ranks=np.asarray(f.ranks), total_rank=int(f.total_rank),
            lexqr=f,
        )


def solve_equality_batched(A, b, dims, params: Optional[ParametersLexLSE] = None,
                           least_norm: bool = False):
    """Batched equality-hierarchy solve on device: ``A`` (B, m, n),
    ``b`` (B, m) -> x (B, n).  One jitted vmap of the fast l-QR + solve
    (BASELINE config 1 at scale: many independent equality hierarchies
    per chip).  ``least_norm`` switches to the least-norm completion."""
    import jax

    params = params or ParametersLexLSE()
    dims = tuple(int(d) for d in dims)

    @functools.partial(jax.jit, static_argnames=("ln",))
    def run(A, b, ln):
        with jax.default_matmul_precision("float32"):
            def one(Ai, bi):
                f = le.factorize_fast(Ai, bi, dims, params)
                return le.solve_least_norm(f) if ln else le.solve(f)

            return jax.vmap(one)(A, b)

    return run(jnp.asarray(A), jnp.asarray(b), least_norm)
