"""NumPy oracle for the inequality-constrained lexicographic LS solver.

Independent re-implementation of the primal active-set method of the
reference (``include/lexls/lexlsi.h``, ``objective.h``, ``workingset.h``,
``cycling.h``), restated in the *masked constraint-order* formulation that
the JAX/TPU solver uses:

  * the working set is a per-constraint activation-type array (INACTIVE /
    ACTIVE_LB / ACTIVE_UB / ACTIVE_EQ) instead of swap-managed index lists;
  * the equality subproblem keeps every constraint row, with inactive rows
    masked to zero (a zero row provably does not perturb the column-pivoted
    Householder l-QR: its column-norm contribution is zero and the first
    ``rank`` columns of Q vanish on it, so its residual and multipliers are
    exactly zero);
  * insertion order (needed by ``deactivate_first_wrong_sign`` and by the
    cycling detector) is carried as a per-constraint activation stamp.

Semantics mirrored from the reference, by function:
  phase1                      ``lexlsi.h:816-869``
  phase1_v0                   ``lexlsi.h:880-915``
  formInitialWorkingSet       ``objective.h:115-172`` (hot-start Algorithm 1)
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
from typing import List, Optional, Tuple

import numpy as np

from ..types import (
    CtrType,
    InequalityHierarchy,
    OperationType,
    ParametersLexLSI,
    TerminationStatus,
)
from . import lexlse as oe


@dataclasses.dataclass
class WorkingSetLogEntry:
    obj_index: int
    ctr_index: int  # row index within the objective
    ctr_type: int  # type when added; INACTIVE when removed
    alpha_or_lambda: float
    rank: int
    cycling_detected: bool = False


@dataclasses.dataclass
class LexLSIResult:
    x: np.ndarray
    status: TerminationStatus
    ctr_type: np.ndarray  # final activation types, per stacked constraint row
    v: np.ndarray  # residuals per stacked constraint row
    n_iterations: int
    n_activations: int
    n_deactivations: int
    n_factorizations: int
    cycling_counter: int
    working_set_log: List[WorkingSetLogEntry]
    lexqr: Optional[oe.LexQR] = None
    lb: Optional[np.ndarray] = None  # possibly relaxed bounds (cycling)
    ub: Optional[np.ndarray] = None


ACTIVE_TYPES = (int(CtrType.ACTIVE_LB), int(CtrType.ACTIVE_UB), int(CtrType.ACTIVE_EQ))


def _rhs_of_type(lb: np.ndarray, ub: np.ndarray, ctr_type: np.ndarray) -> np.ndarray:
    """Active right-hand side: ub for EQ/UB (upper bound by convention,
    ``objective.h:302-313``), lb for LB; 0 for inactive."""
    rhs = np.zeros_like(lb)
    is_ub = (ctr_type == int(CtrType.ACTIVE_UB)) | (ctr_type == int(CtrType.ACTIVE_EQ))
    is_lb = ctr_type == int(CtrType.ACTIVE_LB)
    rhs[is_ub] = ub[is_ub]
    rhs[is_lb] = lb[is_lb]
    return rhs


class _OracleLexLSI:
    """Stateful oracle solver for one problem instance."""

    def __init__(self, prob: InequalityHierarchy, params: Optional[ParametersLexLSI] = None):
        self.prob = prob
        self.params = params or ParametersLexLSI()
        m = prob.n_ctr
        self.m = m
        self.n = prob.n_var
        self.level_of_row = prob.level_of_row()
        self.first_row = [sum(prob.dims[:k]) for k in range(prob.n_obj)]
        self.obj_offset = 1 if prob.simple_bounds else 0

        self.lb = prob.lb.copy()
        self.ub = prob.ub.copy()
        self.ctr_type = prob.initial_ctr_type()
        self.stamp = np.full(m, -1, dtype=np.int64)
        # EQ constraints enter the WS at data-set time, in row order
        self.next_stamp = 0
        for i in range(m):
            if self.ctr_type[i] == int(CtrType.ACTIVE_EQ):
                self.stamp[i] = self.next_stamp
                self.next_stamp += 1

        self.x = np.zeros(self.n)
        self.dx = np.zeros(self.n)
        self.v = np.zeros(m)
        self.dv = np.zeros(m)
        self.Ax = np.zeros(m)
        self.Adx = np.zeros(m)

        self.x_guess_specified = False
        self.v0_specified = False

        self.n_iterations = 0
        self.n_activations = 0
        self.n_deactivations = 0
        self.n_factorizations = 0
        self.status = TerminationStatus.UNKNOWN
        self.log: List[WorkingSetLogEntry] = []
        self.lexqr: Optional[oe.LexQR] = None
        self.lexlse_rank = 0

        # cycling handler state (``cycling.h``)
        self.cyc_counter = 0
        self.cyc_prev_op = OperationType.UNDEFINED
        self.cyc_prev_ctr = (-1, -1)  # (row, type)

    # -- API mirrors -------------------------------------------------------

    def set_x0(self, x0: np.ndarray) -> None:
        self.x = np.asarray(x0, dtype=np.float64).copy()
        self.x_guess_specified = True

    def set_v0(self, v0: np.ndarray) -> None:
        self.v = np.asarray(v0, dtype=np.float64).copy()
        self.v0_specified = True

    def api_activate(self, row: int, ctr_type: int) -> None:
        """User working-set guess; EQ is not user-settable (``lexlsi.h:120-136``)."""
        if self.ctr_type[row] == int(CtrType.INACTIVE) and ctr_type in (
            int(CtrType.ACTIVE_LB),
            int(CtrType.ACTIVE_UB),
        ):
            self._activate(row, ctr_type, count=False)

    # -- working set -------------------------------------------------------

    def _activate(self, row: int, ctr_type: int, count: bool = True) -> None:
        self.ctr_type[row] = ctr_type
        self.stamp[row] = self.next_stamp
        self.next_stamp += 1
        if count:
            self.n_activations += 1

    def _deactivate(self, row: int) -> None:
        self.ctr_type[row] = int(CtrType.INACTIVE)
        self.stamp[row] = -1
        self.n_deactivations += 1

    # -- equality subproblem -----------------------------------------------

    def _factorize(self) -> oe.LexQR:
        """Masked LexLSE at the current working set (``formLexLSE``,
        ``lexlsi.h:968-982`` / ``objective.h:434-494``)."""
        p = self.prob
        active = np.isin(self.ctr_type, ACTIVE_TYPES)
        rhs = _rhs_of_type(self.lb, self.ub, self.ctr_type)

        if p.simple_bounds:
            d0 = p.dims[0]
            rows0 = np.arange(d0)
            act0 = rows0[active[:d0]]
            fixed_idx = p.var_idx[act0]
            fixed_val = rhs[act0]
            fixed_type = self.ctr_type[act0]
            self._fixed_rows = act0  # map: fixed slot -> constraint row
            gen = slice(d0, self.m)
            A = p.A[gen] * active[gen, None]
            b = rhs[gen] * active[gen]
            dims = p.dims[1:]
            f = oe.factorize(
                A, b, dims, self.params.lexlse_parameters(),
                fixed_idx=fixed_idx, fixed_val=fixed_val, fixed_type=fixed_type,
                regularization=p.regularization[1:],
            )
        else:
            self._fixed_rows = np.zeros(0, dtype=np.int64)
            A = p.A * active[:, None]
            b = rhs * active
            f = oe.factorize(
                A, b, p.dims, self.params.lexlse_parameters(),
                regularization=p.regularization,
            )
        self.lexqr = f
        self.lexlse_rank = f.total_rank
        return f

    # -- phase 1 -----------------------------------------------------------

    def _hot_start_tests(self) -> None:
        """``lexlsi.h:758-793`` — discard v0 if x_guess missing (per-level
        partial specification cannot occur in this API: v0 is all-or-nothing)."""
        if self.v0_specified and not self.x_guess_specified:
            self.v0_specified = False

    def _form_initial_working_set(self) -> None:
        """Hot-start Algorithm 1 (``objective.h:115-172``)."""
        prm = self.params
        if prm.modify_type_active_enabled or prm.modify_type_inactive_enabled:
            for i in range(self.m):
                t = self.ctr_type[i]
                if t == int(CtrType.INACTIVE) and prm.modify_type_inactive_enabled:
                    if self.Ax[i] <= self.lb[i]:
                        self._activate(i, int(CtrType.ACTIVE_LB), count=False)
                    elif self.Ax[i] >= self.ub[i]:
                        self._activate(i, int(CtrType.ACTIVE_UB), count=False)
                elif t == int(CtrType.ACTIVE_LB) and prm.modify_type_active_enabled:
                    if self.Ax[i] > self.lb[i]:
                        self._deactivate(i)
                        self.n_deactivations -= 1  # guess repair is not counted
                        if self.Ax[i] >= self.ub[i]:
                            self._activate(i, int(CtrType.ACTIVE_UB), count=False)
                elif t == int(CtrType.ACTIVE_UB) and prm.modify_type_active_enabled:
                    if self.Ax[i] < self.ub[i]:
                        self._deactivate(i)
                        self.n_deactivations -= 1
                        if self.Ax[i] <= self.lb[i]:
                            self._activate(i, int(CtrType.ACTIVE_LB), count=False)

        if self.prob.simple_bounds and prm.modify_x_guess_enabled:
            # ensureZeroCtrViolationForSimpleBounds (``objective.h:73-103``)
            d0 = self.prob.dims[0]
            for i in range(d0):
                vi = self.prob.var_idx[i]
                t = self.ctr_type[i]
                if t == int(CtrType.INACTIVE):
                    self.x[vi] = 0.5 * (self.lb[i] + self.ub[i])
                elif t in (int(CtrType.ACTIVE_EQ), int(CtrType.ACTIVE_UB)):
                    self.x[vi] = self.ub[i]
                elif t == int(CtrType.ACTIVE_LB):
                    self.x[vi] = self.lb[i]
            self.Ax = self.prob.A @ self.x

    def _initialize_v0(self) -> None:
        """``objective.h:183-237``."""
        prm = self.params
        v = self.Ax - 0.5 * (self.lb + self.ub)
        for i in range(self.m):
            t = self.ctr_type[i]
            if t == int(CtrType.ACTIVE_LB):
                v[i] = self.Ax[i] - self.lb[i]
            elif t in (int(CtrType.ACTIVE_UB),):
                v[i] = self.Ax[i] - self.ub[i]
            elif t == int(CtrType.INACTIVE):
                if prm.set_min_init_ctr_violation:
                    if self.Ax[i] <= self.lb[i]:
                        v[i] = self.Ax[i] - self.lb[i]
                    elif self.Ax[i] >= self.ub[i]:
                        v[i] = self.Ax[i] - self.ub[i]
                    else:
                        v[i] = 0.0
                else:
                    if (self.Ax[i] >= self.lb[i] - prm.tol_feasibility) and (
                        self.Ax[i] <= self.ub[i] + prm.tol_feasibility
                    ):
                        v[i] = 0.0
            # EQ active: v = Ax - ub handled by the UB branch? EQ keeps
            # v = Ax - rhs with rhs = ub (upper bound by convention).
            if t == int(CtrType.ACTIVE_EQ):
                v[i] = self.Ax[i] - self.ub[i]
        self.v = v

    def _form_step(self) -> None:
        """``objective.h:288-338`` (anchored to the rhs to avoid drift)."""
        self.Adx = self.prob.A @ self.dx
        rhs = _rhs_of_type(self.lb, self.ub, self.ctr_type)
        active = np.isin(self.ctr_type, ACTIVE_TYPES)
        self.dv = -self.v
        self.dv[active] += self.Ax[active] + self.Adx[active] - rhs[active]

    def _phase1(self) -> None:
        self._hot_start_tests()
        if not self.x_guess_specified:
            self.x = oe.solve_basic(self._factorize())

        self.Ax = self.prob.A @ self.x
        if not self.v0_specified:
            if self.x_guess_specified:
                self._form_initial_working_set()
            self._initialize_v0()

        if self.x_guess_specified:
            x_star = oe.solve_basic(self._factorize())
            self.dx = x_star - self.x
        else:
            self.dx = np.zeros(self.n)

        self._form_step()
        self.n_factorizations += 1

    def _phase1_v0(self) -> None:
        if not self.x_guess_specified:
            raise ValueError("when use_phase1_v0 = true, x_guess has to be specified")
        self._hot_start_tests()
        self.Ax = self.prob.A @ self.x
        if not self.v0_specified:
            self._form_initial_working_set()
            self._initialize_v0()
        self.dx = np.zeros(self.n)
        self._form_step()

    # -- active-set iteration ----------------------------------------------

    def _check_blocking(self) -> Tuple[float, int, int]:
        """Ratio test over inactive rows (``objective.h:521-578``).

        Returns (alpha, blocking_row, blocking_type); blocking_row = -1 if
        no blocking constraint.
        """
        tolf = self.params.tol_feasibility
        alpha = 1.0
        row, typ = -1, int(CtrType.INACTIVE)
        for i in range(self.m):
            if self.ctr_type[i] != int(CtrType.INACTIVE):
                continue
            den = self.Adx[i] - self.dv[i]
            if den < -tolf:
                t, rhs = int(CtrType.ACTIVE_LB), self.lb[i]
            elif den > tolf:
                t, rhs = int(CtrType.ACTIVE_UB), self.ub[i]
            else:
                continue
            num = rhs - self.Ax[i] + self.v[i]
            ratio = num / den
            if ratio < 0.0:
                ratio = 0.0
            if ratio < alpha:
                alpha = ratio
                row, typ = i, t
        return alpha, row, typ

    def _lambda_sweep(self) -> Tuple[bool, int, float]:
        """Find an active constraint to remove.

        Returns (found, row, lambda_wrong_sign).  Implements both removal
        strategies (``lexlsi.h:1048-1139``) with the CORRECT_SIGN_OF_LAMBDA
        exemption marking of ``lexlse.h:891-907`` carried across levels.
        """
        f = self.lexqr
        assert f is not None
        prm = self.params
        p = self.prob
        sense_type = self.ctr_type.copy()  # mutated with CORRECT_SIGN marks
        n_lexlse_obj = p.n_obj - self.obj_offset
        d0 = p.dims[0] if p.simple_bounds else 0

        wrong: List[Tuple[int, float]] = []  # (row, adjusted lambda)
        best_val = 0.0
        best_row = -1

        for j in range(n_lexlse_obj):
            lam_fixed, lam = oe.objective_sensitivity(f, j)
            found_this_obj = False

            # sweep order: level j, then j-1..0, then fixed variables
            for k in list(range(j, -1, -1)) + ["fixed"]:
                if k == "fixed":
                    rows = self._fixed_rows  # constraint rows of level 0
                    vals = lam_fixed
                else:
                    lvl = k + self.obj_offset
                    fr = self.first_row[lvl]
                    rows = np.arange(fr, fr + p.dims[lvl])
                    vals = lam[fr - d0 : fr - d0 + p.dims[lvl]]
                for idx, i in enumerate(rows):
                    t = sense_type[i]
                    if t in (int(CtrType.ACTIVE_EQ), int(CtrType.CORRECT_SIGN_OF_LAMBDA),
                             int(CtrType.INACTIVE)):
                        continue
                    a = vals[idx]
                    if t == int(CtrType.ACTIVE_LB):
                        a = -a
                    if a > prm.tol_correct_sign_lambda:
                        sense_type[i] = int(CtrType.CORRECT_SIGN_OF_LAMBDA)
                    elif a < -prm.tol_wrong_sign_lambda:
                        found_this_obj = True
                        wrong.append((int(i), float(a)))
                        if a < best_val:
                            best_val = a
                            best_row = int(i)

            if found_this_obj:
                break

        if best_row < 0 and not wrong:
            return False, -1, 0.0

        if prm.deactivate_first_wrong_sign:
            # first in working-set insertion order (``lexlsi.h:1034-1046``)
            rows = [w[0] for w in wrong]
            stamps = [self.stamp[r] for r in rows]
            row = rows[int(np.argmin(stamps))]
            return True, row, 0.0
        return True, best_row, best_val

    def _cycling_update(self, op: OperationType, ctr_id: Tuple[int, int]) -> None:
        """``cycling.h:32-65``: REMOVE followed by ADD of the same constraint
        relaxes the offending bound by ``relax_step``."""
        if (
            op == OperationType.ADD
            and self.cyc_prev_op == OperationType.REMOVE
            and ctr_id == self.cyc_prev_ctr
        ):
            if self.cyc_counter >= self.params.cycling_max_counter:
                self.status = TerminationStatus.PROBLEM_SOLVED_CYCLING_HANDLING
            else:
                row, typ = self.cyc_prev_ctr
                if typ == int(CtrType.ACTIVE_LB):
                    self.lb[row] -= self.params.cycling_relax_step
                elif typ == int(CtrType.ACTIVE_UB):
                    self.ub[row] += self.params.cycling_relax_step
                self.cyc_counter += 1
                if self.log:
                    self.log[-1].cycling_detected = True
        self.cyc_prev_op = op
        self.cyc_prev_ctr = ctr_id

    def _verify_working_set(self) -> OperationType:
        """One active-set iteration (``lexlsi.h:1144-1265``)."""
        prm = self.params
        operation = OperationType.UNDEFINED
        normal_iteration = True

        if self.n_iterations != 0:
            x_star = oe.solve_basic(self._factorize())
            self.dx = x_star - self.x
            self._form_step()
            self.n_factorizations += 1
        else:
            if prm.use_phase1_v0:
                normal_iteration = False

        alpha, row, typ = self._check_blocking()
        ctr_id = (-1, -1)

        if row >= 0:  # blocking constraint found
            ctr_id = (row, typ)
            if prm.log_working_set_enabled:
                lvl = int(self.level_of_row[row])
                self.log.append(WorkingSetLogEntry(
                    lvl, row - self.first_row[lvl], typ, alpha, self.lexlse_rank))
            operation = OperationType.ADD
            self._activate(row, typ)
        else:
            alpha = 1.0
            if normal_iteration:
                found, rrow, lam_val = self._lambda_sweep()
                if found:
                    ctr_id = (rrow, int(self.ctr_type[rrow]))
                    if prm.log_working_set_enabled:
                        lvl = int(self.level_of_row[rrow])
                        self.log.append(WorkingSetLogEntry(
                            lvl, rrow - self.first_row[lvl], int(CtrType.INACTIVE),
                            lam_val, self.lexlse_rank))
                    operation = OperationType.REMOVE
                    self._deactivate(rrow)
                else:
                    self.status = TerminationStatus.PROBLEM_SOLVED

        if alpha > 0.0:
            self.x = self.x + alpha * self.dx
            self.v = self.v + alpha * self.dv
            self.Ax = self.Ax + alpha * self.Adx

        if prm.cycling_handling_enabled and operation != OperationType.UNDEFINED:
            self._cycling_update(operation, ctr_id)

        self.n_iterations += 1
        return operation

    def solve(self) -> LexLSIResult:
        if self.params.use_phase1_v0:
            self._phase1_v0()
        else:
            self._phase1()

        while True:
            self._verify_working_set()
            if self.status in (
                TerminationStatus.PROBLEM_SOLVED,
                TerminationStatus.PROBLEM_SOLVED_CYCLING_HANDLING,
            ):
                break
            if self.n_factorizations >= self.params.max_number_of_factorizations:
                self.status = TerminationStatus.MAX_NUMBER_OF_FACTORIZATIONS_EXCEEDED
                break

        return LexLSIResult(
            x=self.x.copy(), status=self.status, ctr_type=self.ctr_type.copy(),
            v=self.v.copy(), n_iterations=self.n_iterations,
            n_activations=self.n_activations, n_deactivations=self.n_deactivations,
            n_factorizations=self.n_factorizations, cycling_counter=self.cyc_counter,
            working_set_log=self.log, lexqr=self.lexqr,
            lb=self.lb.copy(), ub=self.ub.copy(),
        )

    def collect_wrong_sign(self, obj_index: int):
        """Reference collect-all ``ObjectiveSensitivity`` overload
        (``lexlse.h:511-602``) for LexLSE objective ``obj_index``: a
        sequential sweep over levels obj_index..0 then the fixed
        (simple-bounds) rows, collecting every active LB/UB row whose
        sign-adjusted multiplier is below ``-tol_wrong_sign_lambda``
        and marking rows above ``tol_correct_sign_lambda`` CORRECT_SIGN
        (``findDescentDirection`` vector form, ``lexlse.h:866-910``).
        Single-call semantics: marks are returned, not written to the
        solver state.  Returns ``(wrong_rows, marked_rows)`` as sorted
        lists of user constraint-row indexes."""
        f = self._factorize()
        prm = self.params
        p = self.prob
        d0 = p.dims[0] if p.simple_bounds else 0
        lam_fixed, lam = oe.objective_sensitivity(f, obj_index)
        wrong: List[int] = []
        marked: List[int] = []
        for k in list(range(obj_index, -1, -1)) + ["fixed"]:
            if k == "fixed":
                rows = self._fixed_rows
                vals = lam_fixed
            else:
                lvl = k + self.obj_offset
                fr = self.first_row[lvl]
                rows = np.arange(fr, fr + p.dims[lvl])
                vals = lam[fr - d0 : fr - d0 + p.dims[lvl]]
            for idx, i in enumerate(rows):
                t = self.ctr_type[i]
                if t in (int(CtrType.ACTIVE_EQ),
                         int(CtrType.CORRECT_SIGN_OF_LAMBDA),
                         int(CtrType.INACTIVE)):
                    continue
                a = vals[idx]
                if t == int(CtrType.ACTIVE_LB):
                    a = -a
                if a > prm.tol_correct_sign_lambda:
                    marked.append(int(i))
                elif a < -prm.tol_wrong_sign_lambda:
                    wrong.append(int(i))
        return sorted(wrong), sorted(marked)

    def get_lambda(self) -> np.ndarray:
        """λ matrix (n_ctr x n_obj) in user constraint order
        (``lexlsi.h:552-605``); column k = multipliers of objective k."""
        p = self.prob
        f = self._factorize()  # factorize at the current working set
        L = np.zeros((self.m, p.n_obj))
        d0 = p.dims[0] if p.simple_bounds else 0
        for j in range(p.n_obj - self.obj_offset):
            lam_fixed, lam = oe.objective_sensitivity(f, j)
            col = j + self.obj_offset
            if p.simple_bounds:
                L[self._fixed_rows, col] = lam_fixed
            n_lam = len(lam)
            L[d0 : d0 + n_lam, col] = lam
        return L


def solve(
    prob: InequalityHierarchy,
    params: Optional[ParametersLexLSI] = None,
    x0: Optional[np.ndarray] = None,
    v0: Optional[np.ndarray] = None,
    active_guess: Optional[np.ndarray] = None,
) -> LexLSIResult:
    """Solve an inequality-constrained lexicographic LS problem.

    ``active_guess`` is an optional per-row CtrType array (the warm-start
    working set, cf. ``api_activate``)."""
    s = _OracleLexLSI(prob, params)
    if active_guess is not None:
        for i in range(prob.n_ctr):
            t = int(active_guess[i])
            if t != int(CtrType.INACTIVE):
                s.api_activate(i, t)
    if x0 is not None:
        s.set_x0(x0)
    if v0 is not None:
        s.set_v0(v0)
    return s.solve()


def solve_with_lambda(
    prob: InequalityHierarchy,
    params: Optional[ParametersLexLSI] = None,
    **kw,
) -> Tuple[LexLSIResult, np.ndarray]:
    s = _OracleLexLSI(prob, params)
    if kw.get("active_guess") is not None:
        for i in range(prob.n_ctr):
            t = int(kw["active_guess"][i])
            if t != int(CtrType.INACTIVE):
                s.api_activate(i, t)
    if kw.get("x0") is not None:
        s.set_x0(kw["x0"])
    if kw.get("v0") is not None:
        s.set_v0(kw["v0"])
    res = s.solve()
    lam = s.get_lambda()
    return res, lam
