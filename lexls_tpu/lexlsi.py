"""TPU-native inequality-constrained lexicographic LS solver (LexLSI).

A from-scratch JAX implementation of the primal active-set method of the
reference (``include/lexls/lexlsi.h``, ``objective.h``, ``workingset.h``,
``cycling.h``), designed for ``jit``/``vmap``/``shard_map``:

  * **The whole active-set loop is one ``lax.while_loop``** whose carry is
    the full solver state pytree {x, v, dv, Ax, Adx, activation types,
    stamps, counters, cycling state, trace log}.
    ``vmap`` of the solve gives batched solving with per-instance
    convergence (converged instances no-op until all terminate).
  * **The working set is data, not structure**: a per-constraint int32
    activation-type array (INACTIVE / ACTIVE_LB / ACTIVE_UB / ACTIVE_EQ)
    replaces the reference's swap-managed index lists
    (``workingset.h:243-260``); insertion order (needed by
    ``deactivate_first_wrong_sign`` and the cycling detector) is carried
    as a per-constraint activation stamp.
  * **The equality subproblem keeps every constraint row**, with inactive
    rows masked to zero — a zero row provably does not perturb the
    column-pivoted Householder l-QR, its residual, or its multipliers.
  * **Warm start is data**: the carry-out {final types, x} of solve *k*
    is the carry-in guess of solve *k+1* (see :mod:`lexls_tpu.sequence`).

Semantics mirrored from the reference, by function:
  phase1                      ``lexlsi.h:816-869``
  phase1_v0                   ``lexlsi.h:880-915``
  formInitialWorkingSet       ``objective.h:115-172`` (hot-start Alg. 1)
  initialize_v0               ``objective.h:183-237``
  formStep                    ``objective.h:288-338``
  checkBlockingConstraints    ``objective.h:521-578``, ``lexlsi.h:1006-1029``
  verifyWorkingSet            ``lexlsi.h:1144-1265``
  findActiveCtr2Remove        ``lexlsi.h:1048-1139``
  cycling handling            ``cycling.h:32-65``
  getLambda                   ``lexlsi.h:552-605``
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import lexlse
from .types import (
    CtrType,
    InequalityHierarchy,
    LexLSError,
    OperationType,
    ParametersLexLSI,
    RegularizationType,
    TerminationStatus,
)

_INT_MAX = jnp.iinfo(jnp.int32).max


def _is_active(t: jax.Array) -> jax.Array:
    return (t == int(CtrType.ACTIVE_LB)) | (t == int(CtrType.ACTIVE_UB)) | (
        t == int(CtrType.ACTIVE_EQ)
    )


def _rhs_of_type(lb, ub, t):
    """Active right-hand side: ub for EQ/UB, lb for LB; 0 for inactive
    (``objective.h:302-313``)."""
    is_ub = (t == int(CtrType.ACTIVE_UB)) | (t == int(CtrType.ACTIVE_EQ))
    is_lb = t == int(CtrType.ACTIVE_LB)
    return jnp.where(is_ub, ub, jnp.where(is_lb, lb, 0.0))


# ---------------------------------------------------------------------------
# Static problem structure (hashable; closed over at trace time)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Structure:
    """Static structure of a hierarchy: level segmentation + level-0 kind.

    ``var_idx`` must be a hashable tuple when ``simple_bounds`` (the
    bounded-variable index of each level-0 row, ``typedefs.h:60-64``).
    """

    dims: Tuple[int, ...]
    n_var: int
    simple_bounds: bool = False
    var_idx: Optional[Tuple[int, ...]] = None

    @property
    def m(self) -> int:
        return sum(self.dims)

    @property
    def n_obj(self) -> int:
        return len(self.dims)

    @property
    def obj_offset(self) -> int:
        return 1 if self.simple_bounds else 0

    @property
    def d0(self) -> int:
        return self.dims[0] if self.simple_bounds else 0

    @property
    def lexlse_dims(self) -> Tuple[int, ...]:
        return self.dims[1:] if self.simple_bounds else self.dims

    @functools.cached_property
    def first_row(self) -> Tuple[int, ...]:
        out, ofs = [], 0
        for d in self.dims:
            out.append(ofs)
            ofs += d
        return tuple(out)

    @functools.cached_property
    def level_of_row(self) -> np.ndarray:
        out = np.zeros(self.m, dtype=np.int32)
        for k, (fr, d) in enumerate(zip(self.first_row, self.dims)):
            out[fr : fr + d] = k
        return out

    @functools.cached_property
    def var_idx_np(self) -> np.ndarray:
        return np.asarray(self.var_idx, dtype=np.int32)

    def sweep_priority(self, j: int) -> np.ndarray:
        """Visit-order priority of each constraint row during the λ sweep
        of lexlse objective ``j`` (levels j..0 descending, then the fixed
        simple-bounds rows; ``lexlse.h:611-762`` sweep order).  Ineligible
        rows get a large priority."""
        prio = np.full(self.m, np.iinfo(np.int32).max, dtype=np.int32)
        c = 0
        for k in range(j, -1, -1):
            lvl = k + self.obj_offset
            fr, d = self.first_row[lvl], self.dims[lvl]
            prio[fr : fr + d] = np.arange(c, c + d)
            c += d
        if self.simple_bounds:
            prio[: self.d0] = np.arange(c, c + self.d0)
        return prio

    def sweep_eligible(self, j: int) -> np.ndarray:
        """Rows visited during the λ sweep of lexlse objective ``j``."""
        return self.sweep_priority(j) != np.iinfo(np.int32).max

    @staticmethod
    def of(prob: InequalityHierarchy) -> "Structure":
        return Structure(
            dims=prob.dims,
            n_var=prob.n_var,
            simple_bounds=prob.simple_bounds,
            var_idx=None if prob.var_idx is None else tuple(int(i) for i in prob.var_idx),
        )


# ---------------------------------------------------------------------------
# Solver state (the while-loop carry)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "x", "v", "dx", "dv", "Ax", "Adx",
        "ctr_type", "stamp", "next_stamp", "lb", "ub",
        "it", "n_act", "n_deact", "n_fact", "status",
        "cyc_counter", "cyc_prev_op", "cyc_prev_row", "cyc_prev_type",
        "log_obj", "log_ctr", "log_type", "log_value", "log_rank",
        "log_cycling", "log_len", "log_overflow",
        "trace_x", "trace_v", "trace_dx", "trace_dv", "trace_alpha",
        "trace_op", "trace_row",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class LexLSIState:
    x: jax.Array
    v: jax.Array
    dx: jax.Array
    dv: jax.Array
    Ax: jax.Array
    Adx: jax.Array
    ctr_type: jax.Array      # (m,) int32 CtrType
    stamp: jax.Array         # (m,) int32 working-set insertion stamp (-1 inactive)
    next_stamp: jax.Array
    lb: jax.Array            # possibly relaxed by cycling handling
    ub: jax.Array
    it: jax.Array
    n_act: jax.Array
    n_deact: jax.Array
    n_fact: jax.Array
    status: jax.Array
    cyc_counter: jax.Array
    cyc_prev_op: jax.Array
    cyc_prev_row: jax.Array
    cyc_prev_type: jax.Array
    log_obj: jax.Array       # (cap,) int32
    log_ctr: jax.Array
    log_type: jax.Array
    log_value: jax.Array
    log_rank: jax.Array
    log_cycling: jax.Array   # (cap,) bool
    log_len: jax.Array
    log_overflow: jax.Array  # () bool: an entry was dropped (capacity hit)
    trace_x: jax.Array       # (tcap, n) per-iteration snapshots (tcap=0 when off)
    trace_v: jax.Array       # (tcap, m)
    trace_dx: jax.Array      # (tcap, n)
    trace_dv: jax.Array      # (tcap, m)
    trace_alpha: jax.Array   # (tcap,)
    trace_op: jax.Array      # (tcap,) OperationType
    trace_row: jax.Array     # (tcap,) constraint row added/removed (-1)


# ---------------------------------------------------------------------------
# Subproblem assembly
# ---------------------------------------------------------------------------


def _masked_general(A, lb, ub, ctr_type, struct: Structure):
    """(A_masked, b_masked, fixed_mask, fixed_val) of the LexLSE subproblem
    at the current working set (``formLexLSE``: ``lexlsi.h:968-982``,
    ``objective.h:434-494``).  Simple-bounds rows become fixed variables;
    general rows are zero-masked when inactive."""
    active = _is_active(ctr_type)
    rhs = _rhs_of_type(lb, ub, ctr_type)
    d0 = struct.d0
    if struct.simple_bounds:
        vidx = jnp.asarray(struct.var_idx_np)
        act0 = active[:d0]
        fixed_mask = jnp.zeros((struct.n_var,), bool).at[vidx].set(act0)
        fixed_val = jnp.zeros((struct.n_var,), A.dtype).at[vidx].set(
            jnp.where(act0, rhs[:d0], 0.0)
        )
    else:
        fixed_mask = jnp.zeros((struct.n_var,), bool)
        fixed_val = jnp.zeros((struct.n_var,), A.dtype)
    Ag = A[d0:] * active[d0:, None]
    bg = rhs[d0:] * active[d0:]
    return Ag, bg, fixed_mask, fixed_val


def _factorize(A, lb, ub, ctr_type, struct: Structure, params: ParametersLexLSI,
               reg: Optional[jax.Array]) -> lexlse.LexQR:
    Ag, bg, fixed_mask, fixed_val = _masked_general(A, lb, ub, ctr_type, struct)
    return _factorize_masked(Ag, bg, fixed_mask, fixed_val, struct, params, reg)


def _factorize_masked(Ag, bg, fixed_mask, fixed_val, struct: Structure,
                      params: ParametersLexLSI,
                      reg: Optional[jax.Array]) -> lexlse.LexQR:
    from .regularization import FAST_TIER_TYPES

    lexlse_params = params.lexlse_parameters()
    reg_g = None if reg is None else (reg[1:] if struct.simple_bounds else reg)
    if params.regularization_type in FAST_TIER_TYPES:
        # hot path: virtual-permutation factorization (every
        # regularization variant, including TIKHONOV_1, runs here)
        return lexlse.factorize_fast(
            Ag, bg, struct.lexlse_dims, lexlse_params,
            fixed_mask=fixed_mask, fixed_val=fixed_val, reg_factors=reg_g,
        )
    return lexlse.factorize(
        Ag, bg, struct.lexlse_dims, lexlse_params,
        fixed_mask=fixed_mask, fixed_val=fixed_val, reg_factors=reg_g,
    )


def _form_step(A, lb, ub, ctr_type, Ax, v, dx):
    """``objective.h:288-338``: dv anchored to the rhs to kill drift.

    ``Ax`` is the solver's *cached* value (incrementally updated by
    ``step``), matching the reference's use of the cached ``Ax`` member."""
    Adx = A @ dx
    rhs = _rhs_of_type(lb, ub, ctr_type)
    active = _is_active(ctr_type)
    dv = -v + jnp.where(active, Ax + Adx - rhs, 0.0)
    return Adx, dv


# ---------------------------------------------------------------------------
# Ratio test
# ---------------------------------------------------------------------------


def _check_blocking(ctr_type, Ax, Adx, v, dv, lb, ub, tol_feasibility, dtype):
    """Vectorized ratio test over inactive rows (``objective.h:521-578``).

    Returns (alpha, row, type); row = -1 when no blocking constraint.  The
    reference scans rows in order and takes a strictly smaller ratio, so
    ties resolve to the first row — matching ``argmin``'s first-minimum
    rule."""
    inactive = ctr_type == int(CtrType.INACTIVE)
    den = Adx - dv
    neg = den < -tol_feasibility
    pos = den > tol_feasibility
    eligible = inactive & (neg | pos)
    rhs = jnp.where(neg, lb, ub)
    typ = jnp.where(neg, int(CtrType.ACTIVE_LB), int(CtrType.ACTIVE_UB))
    num = rhs - Ax + v
    ratio = jnp.maximum(num / jnp.where(eligible, den, 1.0), 0.0)
    masked = jnp.where(eligible, ratio, jnp.asarray(jnp.inf, dtype))
    row = jnp.argmin(masked).astype(jnp.int32)
    alpha_c = masked[row]
    blocking = alpha_c < 1.0
    alpha = jnp.where(blocking, alpha_c, jnp.asarray(1.0, dtype))
    return (
        alpha,
        jnp.where(blocking, row, -1),
        jnp.where(blocking, typ[row], int(CtrType.INACTIVE)),
    )


# ---------------------------------------------------------------------------
# λ sweep (constraint removal)
# ---------------------------------------------------------------------------


def _lambda_sweep(f: lexlse.LexQR, A_masked_gen, ctr_type, stamp,
                  struct: Structure, params: ParametersLexLSI):
    """Find an active constraint to remove (``lexlsi.h:1048-1139`` with the
    CORRECT_SIGN_OF_LAMBDA exemption of ``lexlse.h:891-907``).

    Objectives are swept in priority order; the first objective with any
    wrong-sign multiplier commits (the reference breaks there).  Static
    unrolled loop: later objectives still compute, their results are
    discarded by predication — the price of batch-staticness."""
    m = struct.m
    d0 = struct.d0
    dtype = A_masked_gen.dtype
    n_obj_g = len(struct.lexlse_dims)

    sense = ctr_type
    found = jnp.zeros((), bool)
    sel_row = jnp.full((), -1, jnp.int32)
    sel_val = jnp.zeros((), dtype)

    regularized = params.regularization_type == RegularizationType.TIKHONOV_1
    if regularized:
        lam_fixed_all, lam_all = None, None
    else:
        # all objectives' multipliers in one transposed pass (O(p) wide
        # level operations instead of O(p^2) narrow ones)
        lam_fixed_all, lam_all = lexlse.sensitivities_all(
            f, A_fixed_cols=A_masked_gen)

    for j in range(n_obj_g):
        if regularized:
            # damped residual + X_mu-seeded back-propagation (reference
            # ``ObjectiveSensitivity`` with regularization_type == 7)
            lam_fixed, lam = lexlse.objective_sensitivity_regularized(
                f, j, A_fixed_cols=A_masked_gen)
        else:
            lam_fixed, lam = lam_fixed_all[j], lam_all[j]
        vals = jnp.zeros((m,), dtype)
        if struct.simple_bounds:
            vals = vals.at[:d0].set(lam_fixed[jnp.asarray(struct.var_idx_np)])
        vals = vals.at[d0:].set(lam)

        eligible = jnp.asarray(struct.sweep_eligible(j))
        a = jnp.where(ctr_type == int(CtrType.ACTIVE_LB), -vals, vals)
        consider = eligible & (
            (sense == int(CtrType.ACTIVE_LB)) | (sense == int(CtrType.ACTIVE_UB))
        )
        mark = consider & (a > params.tol_correct_sign_lambda)
        wrong = consider & (a < -params.tol_wrong_sign_lambda)
        sense = jnp.where(
            mark & jnp.logical_not(found), int(CtrType.CORRECT_SIGN_OF_LAMBDA), sense
        )
        found_j = jnp.any(wrong)

        if params.deactivate_first_wrong_sign:
            # first in working-set insertion order (``lexlsi.h:1063-1105``)
            key = jnp.where(wrong, stamp, _INT_MAX)
            row_j = jnp.argmin(key).astype(jnp.int32)
            val_j = jnp.zeros((), dtype)
        else:
            # largest wrong-sign multiplier; ties resolve to the earliest
            # row in sweep visit order (``lexlsi.h:1115-1139``)
            amask = jnp.where(wrong, a, jnp.asarray(jnp.inf, dtype))
            amin = jnp.min(amask)
            tie = wrong & (a == amin)
            prio = jnp.asarray(struct.sweep_priority(j))
            row_j = jnp.argmin(jnp.where(tie, prio, _INT_MAX)).astype(jnp.int32)
            val_j = amin

        commit = found_j & jnp.logical_not(found)
        sel_row = jnp.where(commit, row_j, sel_row)
        sel_val = jnp.where(commit, val_j, sel_val)
        found = found | found_j

    return found, sel_row, sel_val


# ---------------------------------------------------------------------------
# Phase 1
# ---------------------------------------------------------------------------


def _form_initial_working_set(ctr_type, stamp, next_stamp, Ax, lb, ub,
                              params: ParametersLexLSI):
    """Hot-start guess repair, Algorithm 1 (``objective.h:115-172``).

    Repairs are not counted as (de)activations; newly activated rows get
    fresh stamps in row order."""
    t = ctr_type
    inactive = t == int(CtrType.INACTIVE)
    is_lb = t == int(CtrType.ACTIVE_LB)
    is_ub = t == int(CtrType.ACTIVE_UB)
    new_t = t
    if params.modify_type_inactive_enabled:
        new_t = jnp.where(inactive & (Ax <= lb), int(CtrType.ACTIVE_LB), new_t)
        new_t = jnp.where(inactive & (Ax > lb) & (Ax >= ub), int(CtrType.ACTIVE_UB), new_t)
    if params.modify_type_active_enabled:
        lb_off = is_lb & (Ax > lb)
        new_t = jnp.where(lb_off, jnp.where(Ax >= ub, int(CtrType.ACTIVE_UB),
                                            int(CtrType.INACTIVE)), new_t)
        ub_off = is_ub & (Ax < ub)
        new_t = jnp.where(ub_off, jnp.where(Ax <= lb, int(CtrType.ACTIVE_LB),
                                            int(CtrType.INACTIVE)), new_t)
    changed = new_t != t
    newly_active = changed & _is_active(new_t)
    deact = changed & (new_t == int(CtrType.INACTIVE))
    order = (jnp.cumsum(newly_active.astype(jnp.int32)) - 1).astype(jnp.int32)
    stamp = jnp.where(newly_active, next_stamp + order,
                      jnp.where(deact, -1, stamp))
    next_stamp = next_stamp + jnp.sum(newly_active).astype(jnp.int32)
    return new_t, stamp, next_stamp


def _modify_x_guess(x, ctr_type, lb, ub, struct: Structure):
    """ensureZeroCtrViolationForSimpleBounds (``objective.h:73-103``)."""
    d0 = struct.d0
    t0 = ctr_type[:d0]
    val = jnp.where(
        t0 == int(CtrType.INACTIVE), 0.5 * (lb[:d0] + ub[:d0]),
        jnp.where(t0 == int(CtrType.ACTIVE_LB), lb[:d0], ub[:d0]),
    )
    return x.at[jnp.asarray(struct.var_idx_np)].set(val)


def _initialize_v0(ctr_type, Ax, lb, ub, params: ParametersLexLSI):
    """``objective.h:183-237``."""
    t = ctr_type
    mid = Ax - 0.5 * (lb + ub)
    v = mid
    v = jnp.where(t == int(CtrType.ACTIVE_LB), Ax - lb, v)
    v = jnp.where((t == int(CtrType.ACTIVE_UB)) | (t == int(CtrType.ACTIVE_EQ)),
                  Ax - ub, v)
    inactive = t == int(CtrType.INACTIVE)
    if params.set_min_init_ctr_violation:
        vin = jnp.where(Ax <= lb, Ax - lb, jnp.where(Ax >= ub, Ax - ub, 0.0))
        v = jnp.where(inactive, vin, v)
    else:
        tolf = params.tol_feasibility
        feas = (Ax >= lb - tolf) & (Ax <= ub + tolf)
        v = jnp.where(inactive & feas, 0.0, v)
    return v


# ---------------------------------------------------------------------------
# The solver
# ---------------------------------------------------------------------------


def _initial_state(A, lb, ub, ctr_type0, stamp0, next_stamp0, x0, v0,
                   struct: Structure, params: ParametersLexLSI,
                   reg: Optional[jax.Array],
                   x_guess_specified: bool, v0_specified: bool) -> LexLSIState:
    """Phase 1 (``lexlsi.h:816-915``): initial x, v, working set, step."""
    dtype = A.dtype
    m, n = struct.m, struct.n_var
    ctr_type, stamp, next_stamp = ctr_type0, stamp0, next_stamp0

    # hot_start_related_tests (``lexlsi.h:758-793``): v0 needs x_guess
    if v0_specified and not x_guess_specified:
        v0_specified = False

    n_fact = jnp.zeros((), jnp.int32)

    if params.use_phase1_v0:
        if not x_guess_specified:
            raise ValueError("when use_phase1_v0 = true, x_guess has to be specified")
        x = x0
        Ax = A @ x
        if not v0_specified:
            ctr_type, stamp, next_stamp = _form_initial_working_set(
                ctr_type, stamp, next_stamp, Ax, lb, ub, params)
            if struct.simple_bounds and params.modify_x_guess_enabled:
                x = _modify_x_guess(x, ctr_type, lb, ub, struct)
                Ax = A @ x
            v = _initialize_v0(ctr_type, Ax, lb, ub, params)
        else:
            v = v0
        dx = jnp.zeros((n,), dtype)
    else:
        if x_guess_specified:
            x = x0
        else:
            f0 = _factorize(A, lb, ub, ctr_type, struct, params, reg)
            x = lexlse.solve(f0)
        Ax = A @ x
        if not v0_specified:
            if x_guess_specified:
                ctr_type, stamp, next_stamp = _form_initial_working_set(
                    ctr_type, stamp, next_stamp, Ax, lb, ub, params)
                if struct.simple_bounds and params.modify_x_guess_enabled:
                    x = _modify_x_guess(x, ctr_type, lb, ub, struct)
                    Ax = A @ x
            v = _initialize_v0(ctr_type, Ax, lb, ub, params)
        else:
            v = v0
        # NOTE: dx of iteration 0 is recomputed by the loop body itself
        # (the body factorizes unconditionally; at iteration 0 the working
        # set is unchanged since phase 1, so the recomputation reproduces
        # the phase-1 step exactly — the reference reuses phase 1's
        # factorization, ``lexlsi.h:1160-1170``)
        dx = jnp.zeros((n,), dtype)
        n_fact = n_fact + 1

    Adx, dv = _form_step(A, lb, ub, ctr_type, Ax, v, dx)

    cap = params.max_number_of_factorizations + 2
    tcap = cap if params.trace_enabled else 0
    return LexLSIState(
        x=x, v=v, dx=dx, dv=dv, Ax=Ax, Adx=Adx,
        ctr_type=ctr_type, stamp=stamp, next_stamp=next_stamp, lb=lb, ub=ub,
        it=jnp.zeros((), jnp.int32),
        n_act=jnp.zeros((), jnp.int32), n_deact=jnp.zeros((), jnp.int32),
        n_fact=n_fact,
        status=jnp.full((), int(TerminationStatus.UNKNOWN), jnp.int32),
        cyc_counter=jnp.zeros((), jnp.int32),
        cyc_prev_op=jnp.full((), int(OperationType.UNDEFINED), jnp.int32),
        cyc_prev_row=jnp.full((), -1, jnp.int32),
        cyc_prev_type=jnp.full((), -1, jnp.int32),
        log_obj=jnp.zeros((cap,), jnp.int32), log_ctr=jnp.zeros((cap,), jnp.int32),
        log_type=jnp.zeros((cap,), jnp.int32), log_value=jnp.zeros((cap,), dtype),
        log_rank=jnp.zeros((cap,), jnp.int32), log_cycling=jnp.zeros((cap,), bool),
        log_len=jnp.zeros((), jnp.int32), log_overflow=jnp.zeros((), bool),
        trace_x=jnp.zeros((tcap, n), dtype), trace_v=jnp.zeros((tcap, m), dtype),
        trace_dx=jnp.zeros((tcap, n), dtype), trace_dv=jnp.zeros((tcap, m), dtype),
        trace_alpha=jnp.zeros((tcap,), dtype),
        trace_op=jnp.zeros((tcap,), jnp.int32),
        trace_row=jnp.full((tcap,), -1, jnp.int32),
    )


def _verify_working_set(s: LexLSIState, A, struct: Structure,
                        params: ParametersLexLSI, reg) -> LexLSIState:
    """One active-set iteration (``lexlsi.h:1144-1265``).

    The factorization runs unconditionally: at iteration 0 the working
    set is unchanged since phase 1, so this reproduces phase 1's step
    (which the reference reuses) — and under ``vmap`` a conditional
    would execute both branches anyway.  Only the factorization counter
    is gated (the reference counts one factorization for phase 1)."""
    # masked subproblem data, shared by the factorization and the λ sweep
    Ag, bg, fixed_mask, fixed_val = _masked_general(
        A, s.lb, s.ub, s.ctr_type, struct)
    f = _factorize_masked(Ag, bg, fixed_mask, fixed_val, struct, params, reg)
    return _verify_with_f(s, A, Ag, f, struct, params)


def _verify_with_f(s: LexLSIState, A, Ag, f: lexlse.LexQR,
                   struct: Structure, params: ParametersLexLSI) -> LexLSIState:
    """The per-instance remainder of one active-set iteration, given the
    factorization ``f`` of the current working set (split out so the
    natively-batched driver can produce ``f`` with the Pallas panels)."""
    dtype = A.dtype
    need_fact = s.it > 0
    normal_iteration = jnp.logical_not(
        (s.it == 0) & jnp.asarray(params.use_phase1_v0)
    )

    x_star = lexlse.solve(f)
    # with use_phase1_v0, iteration 0 keeps phase 1's dx = 0 / dv = -v
    dx = jnp.where(normal_iteration, x_star - s.x, s.dx)
    Adx_new, dv_new = _form_step(A, s.lb, s.ub, s.ctr_type, s.Ax, s.v, dx)
    Adx = jnp.where(normal_iteration, Adx_new, s.Adx)
    dv = jnp.where(normal_iteration, dv_new, s.dv)
    n_fact = s.n_fact + need_fact.astype(jnp.int32)

    alpha, brow, btype = _check_blocking(
        s.ctr_type, s.Ax, Adx, s.v, dv, s.lb, s.ub,
        jnp.asarray(params.tol_feasibility, dtype), dtype)
    blocking = brow >= 0

    # --- removal sweep (only runs when no blocking constraint was found;
    # under vmap the cond lowers to a select and both branches execute)
    want_sweep = jnp.logical_not(blocking) & normal_iteration
    found_rm, rrow, rval = lax.cond(
        want_sweep,
        lambda: _lambda_sweep(f, Ag, s.ctr_type, s.stamp, struct, params),
        lambda: (jnp.zeros((), bool), jnp.full((), -1, jnp.int32),
                 jnp.zeros((), dtype)),
    )
    do_remove = want_sweep & found_rm
    solved = want_sweep & jnp.logical_not(found_rm)

    # --- working-set update
    ctr_type = s.ctr_type
    stamp = s.stamp
    next_stamp = s.next_stamp
    ctr_type = jnp.where(
        blocking,
        ctr_type.at[brow].set(btype.astype(ctr_type.dtype)),
        jnp.where(do_remove, ctr_type.at[rrow].set(int(CtrType.INACTIVE)), ctr_type),
    )
    stamp = jnp.where(
        blocking, stamp.at[brow].set(next_stamp),
        jnp.where(do_remove, stamp.at[rrow].set(-1), stamp),
    )
    next_stamp = next_stamp + blocking.astype(jnp.int32)
    n_act = s.n_act + blocking.astype(jnp.int32)
    n_deact = s.n_deact + do_remove.astype(jnp.int32)
    status = jnp.where(solved, int(TerminationStatus.PROBLEM_SOLVED), s.status)

    # --- working-set log (``typedefs.h:380-432``, ``lexlsi.h:1188-1222``)
    log_obj, log_ctr, log_type = s.log_obj, s.log_ctr, s.log_type
    log_value, log_rank, log_len = s.log_value, s.log_rank, s.log_len
    log_cycling = s.log_cycling
    log_overflow = s.log_overflow
    if params.log_working_set_enabled:
        want_log = blocking | do_remove
        # a full log DROPS the entry and raises the overflow flag
        # (previously the last entry was silently overwritten)
        log_overflow = log_overflow | (
            want_log & (log_len >= s.log_obj.shape[0]))
        do_log = want_log & (log_len < s.log_obj.shape[0])
        row = jnp.where(blocking, brow, rrow)
        lvl = jnp.asarray(struct.level_of_row)[row]
        first_row = jnp.asarray(np.asarray(struct.first_row, np.int32))[lvl]
        entry_type = jnp.where(blocking, btype, int(CtrType.INACTIVE))
        entry_val = jnp.where(blocking, alpha, rval)
        idx = jnp.minimum(log_len, log_obj.shape[0] - 1)
        log_obj = jnp.where(do_log, log_obj.at[idx].set(lvl), log_obj)
        log_ctr = jnp.where(do_log, log_ctr.at[idx].set(row - first_row), log_ctr)
        log_type = jnp.where(do_log, log_type.at[idx].set(entry_type.astype(jnp.int32)), log_type)
        log_value = jnp.where(do_log, log_value.at[idx].set(entry_val), log_value)
        log_rank = jnp.where(do_log, log_rank.at[idx].set(f.total_rank), log_rank)
        log_len = jnp.minimum(log_len + do_log.astype(jnp.int32),
                              s.log_obj.shape[0])

    # --- step (``lexlsi.h:1243-1250``)
    take = alpha > 0.0
    x = jnp.where(take, s.x + alpha * dx, s.x)
    v = jnp.where(take, s.v + alpha * dv, s.v)
    Ax = jnp.where(take, s.Ax + alpha * Adx, s.Ax)

    # --- per-iteration trace (≙ ``outputStuff``, ``lexlsi.h:1272-1379``)
    trace = (s.trace_x, s.trace_v, s.trace_dx, s.trace_dv, s.trace_alpha,
             s.trace_op, s.trace_row)
    if params.trace_enabled:
        ti = jnp.minimum(s.it, s.trace_x.shape[0] - 1)
        op_code = jnp.where(blocking, int(OperationType.ADD),
                            jnp.where(do_remove, int(OperationType.REMOVE),
                                      int(OperationType.UNDEFINED)))
        row_code = jnp.where(blocking, brow, jnp.where(do_remove, rrow, -1))
        trace = (
            s.trace_x.at[ti].set(x), s.trace_v.at[ti].set(v),
            s.trace_dx.at[ti].set(dx), s.trace_dv.at[ti].set(dv),
            s.trace_alpha.at[ti].set(alpha),
            s.trace_op.at[ti].set(op_code), s.trace_row.at[ti].set(row_code),
        )

    # --- cycling handling (``cycling.h:32-65``)
    lb, ub = s.lb, s.ub
    cyc_counter = s.cyc_counter
    cyc_prev_op, cyc_prev_row, cyc_prev_type = (
        s.cyc_prev_op, s.cyc_prev_row, s.cyc_prev_type)
    if params.cycling_handling_enabled:
        op = jnp.where(blocking, int(OperationType.ADD),
                       jnp.where(do_remove, int(OperationType.REMOVE),
                                 int(OperationType.UNDEFINED)))
        row = jnp.where(blocking, brow, jnp.where(do_remove, rrow, -1))
        # type identifying the constraint: the type it was added with /
        # the type it had before removal
        ctyp = jnp.where(blocking, btype,
                         jnp.where(do_remove, s.ctr_type[jnp.maximum(rrow, 0)], -1))
        detected = (
            (op == int(OperationType.ADD))
            & (cyc_prev_op == int(OperationType.REMOVE))
            & (row == cyc_prev_row) & (ctyp == cyc_prev_type)
        )
        over = detected & (cyc_counter >= params.cycling_max_counter)
        relax = detected & jnp.logical_not(over)
        status = jnp.where(
            over, int(TerminationStatus.PROBLEM_SOLVED_CYCLING_HANDLING), status)
        prow = jnp.maximum(cyc_prev_row, 0)
        lb = jnp.where(relax & (cyc_prev_type == int(CtrType.ACTIVE_LB)),
                       lb.at[prow].add(-params.cycling_relax_step), lb)
        ub = jnp.where(relax & (cyc_prev_type == int(CtrType.ACTIVE_UB)),
                       ub.at[prow].add(params.cycling_relax_step), ub)
        cyc_counter = cyc_counter + relax.astype(jnp.int32)
        if params.log_working_set_enabled:
            last = jnp.maximum(log_len - 1, 0)
            log_cycling = jnp.where(relax, log_cycling.at[last].set(True), log_cycling)
        upd = op != int(OperationType.UNDEFINED)
        cyc_prev_op = jnp.where(upd, op, cyc_prev_op)
        cyc_prev_row = jnp.where(upd, row, cyc_prev_row)
        cyc_prev_type = jnp.where(upd, ctyp, cyc_prev_type)

    return dataclasses.replace(
        s, x=x, v=v, dx=dx, dv=dv, Ax=Ax, Adx=Adx,
        ctr_type=ctr_type, stamp=stamp, next_stamp=next_stamp, lb=lb, ub=ub,
        it=s.it + 1, n_act=n_act, n_deact=n_deact, n_fact=n_fact, status=status,
        cyc_counter=cyc_counter, cyc_prev_op=cyc_prev_op,
        cyc_prev_row=cyc_prev_row, cyc_prev_type=cyc_prev_type,
        log_obj=log_obj, log_ctr=log_ctr, log_type=log_type, log_value=log_value,
        log_rank=log_rank, log_cycling=log_cycling, log_len=log_len,
        log_overflow=log_overflow,
        trace_x=trace[0], trace_v=trace[1], trace_dx=trace[2], trace_dv=trace[3],
        trace_alpha=trace[4], trace_op=trace[5], trace_row=trace[6],
    )


@functools.partial(
    jax.jit,
    static_argnames=("struct", "params", "x_guess_specified", "v0_specified"),
)
def solve_core(
    A, lb, ub, ctr_type0, stamp0, next_stamp0, x0, v0, reg,
    struct: Structure, params: ParametersLexLSI,
    x_guess_specified: bool, v0_specified: bool,
) -> LexLSIState:
    """Jitted whole-solver: phase 1 + the active-set ``while_loop``
    (``lexlsi.h:205-246``).  All shapes static; ``vmap`` over the array
    arguments gives batched solving.

    Matmul precision is pinned to float32: on TPU the default lowers f32
    dots to bfloat16 MXU passes, whose ~8-bit mantissa destroys the
    Householder factorization's rank decisions and the active-set
    convergence."""
    with jax.default_matmul_precision("float32"):
        s = _initial_state(
            A, lb, ub, ctr_type0, stamp0, next_stamp0, x0, v0,
            struct, params, reg, x_guess_specified, v0_specified)

        max_fact = params.max_number_of_factorizations

        def cond(s: LexLSIState):
            return (s.status == int(TerminationStatus.UNKNOWN)) & (
                (s.it == 0) | (s.n_fact < max_fact)
            )

        def body(s: LexLSIState):
            return _verify_working_set(s, A, struct, params, reg)

        s = lax.while_loop(cond, body, s)
        status = jnp.where(
            s.status == int(TerminationStatus.UNKNOWN),
            int(TerminationStatus.MAX_NUMBER_OF_FACTORIZATIONS_EXCEEDED),
            s.status,
        )
        return dataclasses.replace(s, status=status)


def _instance_alive(s: LexLSIState, max_fact: int):
    return (s.status == int(TerminationStatus.UNKNOWN)) & (
        (s.it == 0) | (s.n_fact < max_fact)
    )


@functools.partial(
    jax.jit,
    static_argnames=("struct", "params", "x_guess_specified", "v0_specified",
                     "use_pallas"),
)
def solve_core_batched(
    A, lb, ub, ctr_type0, stamp0, next_stamp0, x0, v0, reg,
    struct: Structure, params: ParametersLexLSI,
    x_guess_specified: bool, v0_specified: bool, use_pallas: bool = True,
) -> LexLSIState:
    """Natively-batched whole-solver (all arrays carry a leading batch
    axis).  Functionally identical to ``vmap`` of :func:`solve_core`, but
    the per-iteration factorization runs through the batch-tiled Pallas
    panel kernels (``lexls_tpu.ops``) instead of a vmapped XLA loop —
    the level blocks stay in VMEM across the whole pivot loop instead of
    round-tripping HBM every pivot step.  Converged instances are frozen
    by predication, exactly like the ``vmap``-of-``while_loop`` batching
    rule."""
    max_fact = params.max_number_of_factorizations
    pallas_ok = (use_pallas
                 and params.regularization_type == RegularizationType.NONE)
    interpret = jax.default_backend() != "tpu"

    with jax.default_matmul_precision("float32"):
        s = jax.vmap(
            lambda a, l, u, c, st, ns, x, v: _initial_state(
                a, l, u, c, st, ns, x, v, struct, params, reg,
                x_guess_specified, v0_specified)
        )(A, lb, ub, ctr_type0, stamp0, next_stamp0, x0, v0)

        def body(s: LexLSIState):
            Ag, bg, fm, fv = jax.vmap(
                lambda a, l, u, c: _masked_general(a, l, u, c, struct)
            )(A, s.lb, s.ub, s.ctr_type)
            if pallas_ok:
                from .ops import factorize_fast_batched

                f = factorize_fast_batched(
                    Ag, bg, struct.lexlse_dims, params.lexlse_parameters(),
                    fm, fv, use_pallas=True, interpret=interpret)
            else:
                f = jax.vmap(
                    lambda ag, bgi, fmi, fvi: _factorize_masked(
                        ag, bgi, fmi, fvi, struct, params, reg)
                )(Ag, bg, fm, fv)
            s2 = jax.vmap(
                lambda si, Ai, Agi, fi: _verify_with_f(
                    si, Ai, Agi, fi, struct, params)
            )(s, A, Ag, f)
            alive = _instance_alive(s, max_fact)
            return jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    alive.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
                s2, s)

        def cond(s: LexLSIState):
            return jnp.any(_instance_alive(s, max_fact))

        s = lax.while_loop(cond, body, s)
        status = jnp.where(
            s.status == int(TerminationStatus.UNKNOWN),
            int(TerminationStatus.MAX_NUMBER_OF_FACTORIZATIONS_EXCEEDED),
            s.status,
        )
        return dataclasses.replace(s, status=status)


@functools.partial(
    jax.jit,
    static_argnames=("struct", "params", "x_guess_specified", "v0_specified",
                     "tile", "interpret", "vmem_limit_mb", "compact",
                     "tile_b", "panel_unroll", "compact_rounds",
                     "return_factors"),
)
def solve_core_fused(
    A, lb, ub, ctr_type0, stamp0, next_stamp0, x0, v0, reg,
    struct: Structure, params: ParametersLexLSI,
    x_guess_specified: bool, v0_specified: bool,
    tile: int = 8, interpret: bool = False, vmem_limit_mb: int = 0,
    compact: int = 0, tile_b: int = 0, panel_unroll: int = 1,
    compact_rounds: int = 1, return_factors: bool = False,
) -> LexLSIState:
    """Fully-fused whole-solver: phase 1 in XLA, then the ENTIRE
    active-set loop in one Pallas program per batch tile with all state
    resident in VMEM (:mod:`lexls_tpu.ops.fused`).

    Functionally equivalent to ``vmap`` of :func:`solve_core` for the
    supported configuration (general objectives, no regularization,
    no trace, no phase1-v0; cycling handling and the working-set log
    run IN-kernel); raises ``LexLSError`` otherwise — the XLA tiers
    remain the general path (PARITY.md option x tier matrix).
    """
    if params.regularization_type != RegularizationType.NONE:
        raise LexLSError("solve_core_fused: regularization unsupported")
    if params.trace_enabled or params.use_phase1_v0:
        raise LexLSError(
            "solve_core_fused: trace/use_phase1_v0 unsupported")
    B = A.shape[0]
    for name, t in (("tile", tile), ("tile_b", tile_b)):
        t_eff = min(t, B) if t else t
        if t_eff and B % t_eff:
            raise LexLSError(
                f"solve_core_fused: batch size {B} is not divisible by "
                f"{name}={t} — pick a divisor of the batch size")
    from .ops.fused import fused_active_set

    p = len(struct.lexlse_dims)
    prio = tuple(tuple(int(q) for q in struct.sweep_priority(j))
                 for j in range(p))
    elig = tuple(tuple(bool(e) for e in struct.sweep_eligible(j))
                 for j in range(p))
    with jax.default_matmul_precision("float32"):
        s = jax.vmap(
            lambda a, l, u, c, st, ns, x, v: _initial_state(
                a, l, u, c, st, ns, x, v, struct, params, reg,
                x_guess_specified, v0_specified)
        )(A, lb, ub, ctr_type0, stamp0, next_stamp0, x0, v0)
        return _fused_tail(
            A, s, None, struct=struct, params=params, tile=tile,
            interpret=interpret, vmem_limit_mb=vmem_limit_mb,
            compact=compact, tile_b=tile_b, panel_unroll=panel_unroll,
            compact_rounds=compact_rounds, return_factors=return_factors)


def _permute_rows(arr, hot):
    """Permute rows by the one-hot matrix ``hot`` on the MXU.
    A TPU row-gather dispatches one DMA per row (~10 us each, ~4 ms for
    the full state at B=384 — measured to erase the compaction win); a
    one-hot matmul moves the same data in ~0.1 ms and is EXACT: with 0/1
    weights at HIGHEST precision every product is a representable value
    or zero.  Integer arrays round-trip through f32 (all carried ints
    are far below 2**24).  ``hot`` may be RECTANGULAR (rows, B): a
    gather of `rows` instances (the tracker pyramid's slab compaction
    permutes head and tail slabs separately)."""
    flat = arr.reshape(arr.shape[0], -1)
    if jnp.issubdtype(arr.dtype, jnp.integer) or arr.dtype == bool:
        out = jnp.dot(hot, flat.astype(jnp.float32),
                      precision=lax.Precision.HIGHEST)
        out = jnp.round(out).astype(arr.dtype)
    else:
        out = jnp.dot(hot.astype(arr.dtype), flat,
                      precision=lax.Precision.HIGHEST)
    return out.reshape((hot.shape[0],) + arr.shape[1:])


def _fused_tail(A, s: LexLSIState, it0, *, struct: Structure,
                params: ParametersLexLSI, tile: int, interpret: bool,
                vmem_limit_mb: int, compact: int, tile_b: int,
                panel_unroll: int, compact_rounds: int,
                return_factors: bool):
    """Run the fused Pallas active-set kernel from an already-built
    batched state ``s`` (phase 1 done, or a handed-over mid-solve state
    with per-instance iteration counters ``it0``), with optional
    iteration compaction.  Shared by :func:`solve_core_fused` and the
    cross-solve warm tracker (:mod:`lexls_tpu.tracker`)."""
    from .ops.fused import fused_active_set

    p = len(struct.lexlse_dims)
    prio = tuple(tuple(int(q) for q in struct.sweep_priority(j))
                 for j in range(p))
    elig = tuple(tuple(bool(e) for e in struct.sweep_eligible(j))
                 for j in range(p))
    var_idx = struct.var_idx if struct.simple_bounds else ()

    log_on = params.log_working_set_enabled
    cyc_on = params.cycling_handling_enabled
    with jax.default_matmul_precision("float32"):
        kw = dict(
            dims=struct.lexlse_dims, d0=struct.d0, var_idx=var_idx,
            tol_ld=params.tol_linear_dependence,
            tol_feas=params.tol_feasibility,
            tol_wrong=params.tol_wrong_sign_lambda,
            tol_correct=params.tol_correct_sign_lambda,
            max_fact=params.max_number_of_factorizations,
            deact_first=params.deactivate_first_wrong_sign,
            prio=prio, elig=elig, tile=tile, interpret=interpret,
            vmem_limit_mb=vmem_limit_mb, panel_unroll=panel_unroll,
            log_cap=(s.log_obj.shape[1] if log_on else 0),
            cycling=cyc_on, cyc_max=params.cycling_max_counter,
            cyc_relax=params.cycling_relax_step)
        log_state0 = ((s.log_obj, s.log_ctr, s.log_type, s.log_value,
                       s.log_rank, s.log_cycling.astype(jnp.int32),
                       s.log_len[:, None], s.log_overflow[:, None]
                       .astype(jnp.int32)) if log_on else None)
        cyc_state0 = ((s.cyc_counter[:, None], s.cyc_prev_op[:, None],
                       s.cyc_prev_row[:, None], s.cyc_prev_type[:, None])
                      if cyc_on else None)
        outs = fused_active_set(
            A, s.lb, s.ub, s.ctr_type, s.stamp, s.next_stamp, s.x, s.v,
            s.Ax, s.n_fact, it0=it0, iter_cap=compact,
            log_state=log_state0, cyc_state=cyc_state0, **kw)
        if compact:
            # iteration compaction: pause after `compact` iterations,
            # permute unconverged instances to the front (a tile whose
            # instances are all done exits its while loop immediately),
            # continue, and scatter back.  With compact_rounds > 1 the
            # pause/permute/resume repeats, RE-clustering the shrinking
            # straggler set each round — total tile-iterations approach
            # the per-instance iteration sum instead of the per-tile max.
            # The trajectory is identical to the continuous run (it0
            # carries the iteration counter across calls).
            kw_b = dict(kw, tile=tile_b) if tile_b else kw
            iota_b = jnp.arange(A.shape[0], dtype=jnp.int32)

            def permute(arr, hot):
                """Permute rows by the one-hot matrix ``hot`` on the MXU.
                A TPU row-gather dispatches one DMA per row (~10 us each,
                ~4 ms for the full state at B=384 — measured to erase the
                compaction win); a one-hot matmul moves the same data in
                ~0.1 ms and is EXACT: with 0/1 weights at HIGHEST
                precision every product is a representable value or
                zero.  Integer arrays round-trip through f32 (all carried
                ints are far below 2**24)."""
                flat = arr.reshape(arr.shape[0], -1)
                if jnp.issubdtype(arr.dtype, jnp.integer) or arr.dtype == bool:
                    out = jnp.dot(hot, flat.astype(jnp.float32),
                                  precision=lax.Precision.HIGHEST)
                    out = jnp.round(out).astype(arr.dtype)
                else:
                    out = jnp.dot(hot.astype(arr.dtype), flat,
                                  precision=lax.Precision.HIGHEST)
                return out.reshape(arr.shape)

            def resume(outs, cap, kw_r):
                (xA, vA, dxA, dvA, AxA, AdxA, ctA, stA, nsA, itA, naA,
                 ndA, nfA, stat) = outs[:14]
                lbA, ubA = outs[17], outs[18]
                unconverged = stat[:, 0] == int(TerminationStatus.UNKNOWN)
                order = jnp.argsort(~unconverged)
                hot = (order[:, None] == iota_b[None, :]).astype(jnp.float32)
                g = lambda arr: permute(arr, hot)
                outs_B = fused_active_set(
                    g(A), g(lbA), g(ubA), g(ctA), g(stA), g(nsA)[:, 0],
                    g(xA), g(vA), g(AxA), g(nfA)[:, 0], it0=g(itA)[:, 0],
                    log_state=tuple(g(a) for a in outs[19:27]),
                    cyc_state=tuple(g(a) for a in outs[27:31]),
                    iter_cap=cap, **kw_r)
                hot_t = hot.T
                # resumed instances take the new phase; converged keep
                # the old (the new phase zero-initializes dx/dv/Adx and
                # never runs their body).  n_act / n_deact (indices 10,
                # 11) restart from zero each phase, so phases sum.
                return tuple(
                    jnp.where(
                        unconverged.reshape((-1,) + (1,) * (a.ndim - 1)),
                        permute(b, hot_t) + (a if i in (10, 11) else 0),
                        a)
                    for i, (a, b) in enumerate(zip(outs, outs_B)))

            for _ in range(max(0, compact_rounds - 1)):
                outs = resume(outs, compact, kw)
            outs = resume(outs, 0, kw_b)
        (x, v, dx, dv, Ax, Adx, ct, stamp, ns2, it, na, nd, nf,
         status, rpadf, posf, ranksf, lb_f, ub_f,
         lobj, lctr, ltyp, lval, lrank, lcyc, llen, lovf,
         ccnt, cop, crow, ctypv) = outs

        status = jnp.where(
            status[:, 0] == int(TerminationStatus.UNKNOWN),
            int(TerminationStatus.MAX_NUMBER_OF_FACTORIZATIONS_EXCEEDED),
            status[:, 0],
        )
        state = dataclasses.replace(
            s, x=x, v=v, dx=dx, dv=dv, Ax=Ax, Adx=Adx, ctr_type=ct,
            stamp=stamp, next_stamp=ns2[:, 0], it=it[:, 0], n_act=na[:, 0],
            n_deact=nd[:, 0], n_fact=nf[:, 0], status=status,
        )
        if log_on:
            state = dataclasses.replace(
                state, log_obj=lobj, log_ctr=lctr, log_type=ltyp,
                log_value=lval, log_rank=lrank,
                log_cycling=lcyc.astype(bool), log_len=llen[:, 0],
                log_overflow=lovf[:, 0].astype(bool))
        if cyc_on:
            state = dataclasses.replace(
                state, lb=lb_f, ub=ub_f, cyc_counter=ccnt[:, 0],
                cyc_prev_op=cop[:, 0], cyc_prev_row=crow[:, 0],
                cyc_prev_type=ctypv[:, 0])
        if return_factors:
            return state, (rpadf, posf, ranksf)
        return state


# ---------------------------------------------------------------------------
# Lagrange multipliers at the current working set
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("struct", "params"))
def get_lambda(A, lb, ub, ctr_type, reg, struct: Structure,
               params: ParametersLexLSI) -> jax.Array:
    """λ matrix (m, n_obj) in user constraint order (``lexlsi.h:552-605``);
    column k holds the multipliers of objective k."""
    return _get_lambda_impl(A, lb, ub, ctr_type, reg, struct, params)


def _get_lambda_impl(A, lb, ub, ctr_type, reg, struct, params):
    with jax.default_matmul_precision("float32"):
        return _get_lambda_body(A, lb, ub, ctr_type, reg, struct, params)


def _get_lambda_body(A, lb, ub, ctr_type, reg, struct, params):
    # NOTE: like the reference's debug λ-matrix overload
    # (``lexlse.h:770-861``), this uses the factorization residual even
    # in the regularized case.
    f = _factorize(A, lb, ub, ctr_type, struct, params, reg)
    active = _is_active(ctr_type)
    Ag = A[struct.d0 :] * active[struct.d0 :, None]
    m, d0 = struct.m, struct.d0
    lam_fixed_all, lam_all = lexlse.sensitivities_all(f, A_fixed_cols=Ag)
    cols = []
    for _ in range(struct.obj_offset):
        cols.append(jnp.zeros((m,), A.dtype))
    for j in range(len(struct.lexlse_dims)):
        col = jnp.zeros((m,), A.dtype)
        if struct.simple_bounds:
            col = col.at[:d0].set(
                lam_fixed_all[j][jnp.asarray(struct.var_idx_np)])
        col = col.at[d0:].set(lam_all[j])
        cols.append(col)
    return jnp.stack(cols, axis=1)


def collect_wrong_sign(A, lb, ub, ctr_type, reg, struct: Structure,
                       params: ParametersLexLSI):
    """All wrong-sign multipliers of every objective, one vectorized pass.

    TPU-native equivalent of the reference's collect-all
    ``ObjectiveSensitivity`` overload (``lexlse.h:511-602``) evaluated
    for every objective at once (each objective with single-call
    semantics: the CORRECT_SIGN marking of ``findDescentDirection``,
    ``lexlse.h:866-910``, is *returned*, not applied — within one call
    each row is visited exactly once so marking cannot affect
    collection).

    Returns ``(wrong (m, n_obj) bool, marked (m, n_obj) bool,
    lam (m, n_obj))`` in user constraint order: ``wrong[i, j]`` iff row
    ``i`` is an active LB/UB constraint in objective ``j``'s scope
    (levels <= j, plus the simple-bounds rows — the reference's
    fixed-variable check, ``lexlse.h:591-601``) whose sign-adjusted
    multiplier is below ``-tol_wrong_sign_lambda``; ``marked[i, j]`` iff
    it exceeds ``tol_correct_sign_lambda`` (the rows the reference would
    flip to CORRECT_SIGN_OF_LAMBDA)."""
    lam = _get_lambda_impl(A, lb, ub, ctr_type, reg, struct, params)
    scope_np = np.zeros((struct.m, struct.n_obj), bool)
    for j in range(struct.obj_offset, struct.n_obj):
        scope_np[:, j] = np.asarray(
            struct.sweep_eligible(j - struct.obj_offset))
    scope = jnp.asarray(scope_np)
    is_lb = ctr_type == int(CtrType.ACTIVE_LB)
    eligible = (is_lb | (ctr_type == int(CtrType.ACTIVE_UB)))[:, None] & scope
    a = jnp.where(is_lb[:, None], -lam, lam)
    wrong = eligible & (a < -params.tol_wrong_sign_lambda)
    marked = eligible & (a > params.tol_correct_sign_lambda)
    return wrong, marked, lam


# ---------------------------------------------------------------------------
# Host-facing API
# ---------------------------------------------------------------------------


def initial_activation(
    prob: InequalityHierarchy,
    active_guess: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.int32]:
    """Initial (ctr_type, stamp, next_stamp): equality constraints
    auto-activate in row order at data-set time (``lexlsi.h:367-385``),
    then the user guess (``api_activate``, ``lexlsi.h:120-136``; EQ is not
    user-settable, already-typed rows are not overridden)."""
    ctr_type = prob.initial_ctr_type().astype(np.int32)
    stamp = np.full(prob.n_ctr, -1, dtype=np.int32)
    eq = ctr_type == int(CtrType.ACTIVE_EQ)
    stamp[eq] = np.arange(int(eq.sum()), dtype=np.int32)
    c = int(eq.sum())
    if active_guess is not None:
        guess = np.asarray(active_guess, np.int32)
        g = (ctr_type == int(CtrType.INACTIVE)) & (
            (guess == int(CtrType.ACTIVE_LB))
            | (guess == int(CtrType.ACTIVE_UB)))
        ctr_type[g] = guess[g]
        stamp[g] = c + np.arange(int(g.sum()), dtype=np.int32)
        c += int(g.sum())
    return ctr_type, stamp, np.int32(c)


@dataclasses.dataclass
class LexLSIResult:
    """Host-side result mirror of the MEX outputs (``lexlsi.cpp:632-770``)."""

    x: np.ndarray
    status: TerminationStatus
    ctr_type: np.ndarray
    v: np.ndarray
    n_iterations: int
    n_activations: int
    n_deactivations: int
    n_factorizations: int
    cycling_counter: int
    working_set_log: list
    log_overflow: bool
    lb: np.ndarray
    ub: np.ndarray
    state: LexLSIState

    def trace(self) -> dict:
        """Per-iteration solver trace (requires
        ``ParametersLexLSI(trace_enabled=True)``): dict of arrays trimmed
        to the realized iteration count — x, v, dx, dv, alpha, op
        (OperationType code), row (constraint added/removed, -1 none).
        TPU-native counterpart of the reference's per-iteration MATLAB
        dump (``outputStuff``, ``lexlsi.h:1272-1379``)."""
        s = self.state
        if s.trace_x.shape[0] == 0:
            raise LexLSError("trace_enabled was not set in ParametersLexLSI")
        k = min(self.n_iterations, s.trace_x.shape[0])
        return {
            "x": np.asarray(s.trace_x[:k]), "v": np.asarray(s.trace_v[:k]),
            "dx": np.asarray(s.trace_dx[:k]), "dv": np.asarray(s.trace_dv[:k]),
            "alpha": np.asarray(s.trace_alpha[:k]),
            "op": np.asarray(s.trace_op[:k]), "row": np.asarray(s.trace_row[:k]),
        }

    def export_trace(self, path: str, append: bool = False) -> None:
        """Write the per-iteration trace as a MATLAB-readable script —
        the file-export analogue of the reference's ``outputStuff``
        (``lexlsi.h:1272-1379``): per iteration t it emits
        ``nFactorizations_(t)``, ``operation_(t)``, ``stepLength_(t)``,
        and the column vectors ``x_(:,t)``, ``v_(:,t)``, ``dx_(:,t)``,
        ``dv_(:,t)``; final counters at the top as comments."""
        tr = self.trace()
        k = tr["x"].shape[0]

        def vec(v):
            return "[ " + "; ".join(f"{float(a):.15e}" for a in v) + " ];"

        with open(path, "a" if append else "w") as fh:
            fh.write("% lexls_tpu solver trace\n")
            fh.write(f"% status          = {int(self.status)}\n")
            fh.write(f"% nIterations     = {self.n_iterations}\n")
            fh.write(f"% nFactorizations = {self.n_factorizations}\n")
            fh.write(f"% nActivations    = {self.n_activations}\n")
            fh.write(f"% nDeactivations  = {self.n_deactivations}\n")
            fh.write(f"% cycling counter = {self.cycling_counter}\n")
            for t in range(k):
                fh.write("% ==============================================\n")
                fh.write(f"operation_({t + 1}) = {int(tr['op'][t])};\n")
                fh.write(f"ctr_row_({t + 1}) = {int(tr['row'][t])};\n")
                fh.write(f"stepLength_({t + 1}) = {float(tr['alpha'][t]):.15e};\n")
                fh.write(f"x_(:,{t + 1}) = {vec(tr['x'][t])}\n")
                fh.write(f"v_(:,{t + 1}) = {vec(tr['v'][t])}\n")
                fh.write(f"dx_(:,{t + 1}) = {vec(tr['dx'][t])}\n")
                fh.write(f"dv_(:,{t + 1}) = {vec(tr['dv'][t])}\n")


def solve(
    prob: InequalityHierarchy,
    params: Optional[ParametersLexLSI] = None,
    x0: Optional[np.ndarray] = None,
    v0: Optional[np.ndarray] = None,
    active_guess: Optional[np.ndarray] = None,
    dtype=jnp.float64,
) -> LexLSIResult:
    """Solve one inequality-constrained hierarchy on device."""
    from .oracle.lexlsi import WorkingSetLogEntry  # shared log record type

    params = params or ParametersLexLSI()
    struct = Structure.of(prob)
    ctr_type0, stamp0, next_stamp0 = initial_activation(prob, active_guess)
    n = prob.n_var

    s = solve_core(
        jnp.asarray(prob.A, dtype), jnp.asarray(prob.lb, dtype),
        jnp.asarray(prob.ub, dtype),
        jnp.asarray(ctr_type0), jnp.asarray(stamp0), jnp.asarray(next_stamp0),
        jnp.zeros((n,), dtype) if x0 is None else jnp.asarray(x0, dtype),
        jnp.zeros((struct.m,), dtype) if v0 is None else jnp.asarray(v0, dtype),
        jnp.asarray(prob.regularization, dtype),
        struct, params, x0 is not None, v0 is not None,
    )

    log = []
    if params.log_working_set_enabled:
        L = int(s.log_len)
        for i in range(L):
            log.append(WorkingSetLogEntry(
                obj_index=int(s.log_obj[i]), ctr_index=int(s.log_ctr[i]),
                ctr_type=int(s.log_type[i]), alpha_or_lambda=float(s.log_value[i]),
                rank=int(s.log_rank[i]), cycling_detected=bool(s.log_cycling[i]),
            ))

    return LexLSIResult(
        x=np.asarray(s.x), status=TerminationStatus(int(s.status)),
        ctr_type=np.asarray(s.ctr_type), v=np.asarray(s.v),
        n_iterations=int(s.it), n_activations=int(s.n_act),
        n_deactivations=int(s.n_deact), n_factorizations=int(s.n_fact),
        cycling_counter=int(s.cyc_counter), working_set_log=log,
        log_overflow=bool(s.log_overflow),
        lb=np.asarray(s.lb), ub=np.asarray(s.ub), state=s,
    )


def solve_lambda(prob: InequalityHierarchy, res: LexLSIResult,
                 params: Optional[ParametersLexLSI] = None,
                 dtype=jnp.float64) -> np.ndarray:
    """λ matrix at the final working set of ``res``."""
    params = params or ParametersLexLSI()
    struct = Structure.of(prob)
    return np.asarray(get_lambda(
        jnp.asarray(prob.A, dtype), jnp.asarray(res.lb, dtype),
        jnp.asarray(res.ub, dtype), jnp.asarray(res.ctr_type),
        jnp.asarray(prob.regularization, dtype), struct, params))


def solve_collect_wrong_sign(prob: InequalityHierarchy, res: LexLSIResult,
                             params: Optional[ParametersLexLSI] = None,
                             dtype=jnp.float64):
    """Host wrapper of :func:`collect_wrong_sign` at the working set of
    ``res``: ``(wrong (m, n_obj) bool, marked (m, n_obj) bool,
    lam (m, n_obj))`` as NumPy arrays."""
    params = params or ParametersLexLSI()
    struct = Structure.of(prob)
    w, mk, lam = collect_wrong_sign(
        jnp.asarray(prob.A, dtype), jnp.asarray(res.lb, dtype),
        jnp.asarray(res.ub, dtype), jnp.asarray(res.ctr_type),
        jnp.asarray(prob.regularization, dtype), struct, params)
    return np.asarray(w), np.asarray(mk), np.asarray(lam)
