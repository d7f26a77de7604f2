"""Fused whole-solve Pallas kernel: the entire active-set loop in VMEM.

Round-1 profiling showed the per-iteration formulation pays ~5-8 full
(B, m, n) HBM passes per *pivot step*: every XLA op in the factorize /
solve / ratio-test / lambda-sweep chain round-trips the LOD through HBM,
and the op dispatch overhead multiplies across the ~120 sequential pivot
steps of one iteration.  This kernel runs the ENTIRE active-set solve
(reference ``LexLSI::solve``, ``lexlsi.h:205-246``, whose hot loop is
``verifyWorkingSet``, ``lexlsi.h:1144-1265``) for a tile of TB batch
instances inside one Pallas program:

  * All solver state — LOD, working-set types, stamps, x/v/Ax, counters —
    lives in VMEM refs for the whole solve (~150 KB/instance at the
    north-star shape; TB=8 uses ~1.5 MB of the ~16 MB VMEM).
  * HBM traffic per solve drops to reading the problem data once and
    writing the results once.
  * The active-set iteration is a ``lax.while_loop`` whose carry is a
    single "any instance alive" scalar; per-instance termination freezes
    state by predication (the same semantics ``vmap`` of the XLA solver's
    ``while_loop`` produces).
  * The lambda sweep runs under a *scalar* ``lax.cond`` — unlike the
    vmapped XLA path (where ``cond`` lowers to ``select`` and the sweep
    executes even on blocking iterations), a tile whose live instances
    all hit blocking constraints skips the sweep entirely.

Numerical design (all shared with the XLA tiers, parity-tested):
  * the panel pivot loop reuses ``_panel_step_core`` (ops/pallas_lqr.py)
    — virtual column permutation, one-hot contractions, no dynamic lane
    indexing;
  * inter-level Gauss elimination (reference ``lexlse.h:431-471``) is a
    forward column sweep producing L = B R^{-1} without materializing
    R^{-1}; the trailing update is a true per-instance MXU matmul;
  * the basic solve (reference ``lexlse.h:1015-1045``) is a per-level
    backward substitution in the virtual frame;
  * multipliers (reference ``ObjectiveSensitivity``, ``lexlse.h:611-762``)
    back-propagate by sequential Householder replay — exactly the
    reference's ``applyOnTheLeft(householderSequence(...))`` order.

Simple-bounds level 0 IS supported (fixed-variable elimination inside the
kernel: ``d0``/``var_idx`` inputs, column zeroing + rhs folding), and so
are the working-set log (fixed-capacity VMEM ring, ``typedefs.h:380-432``)
and cycling handling (``cycling.h:32-65``) since round 4.  Unsupported
here (the XLA path remains the general tier): regularization, trace,
use_phase1_v0 — see PARITY.md's option x tier matrix.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import CtrType, OperationType, TerminationStatus
from .pallas_lqr import _panel_step_core

_INT_MAX = jnp.iinfo(jnp.int32).max
_HIGH = lax.Precision.HIGHEST


def _bdot(a, b):
    """Per-instance matmul over the leading batch axis, unrolled (Mosaic
    has no batched dot; TB is small and static)."""
    return jnp.stack(
        [jnp.dot(a[t], b[t], precision=_HIGH) for t in range(a.shape[0])])


def _chot(pos, fc, K, dtype):
    """One-hot position->column map: Chot[t, j, c] = (pos[t,c] == fc+j).
    Contractions with it replace every per-instance gather/scatter."""
    jj = lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)
    return (pos[:, None, :] == (fc[:, :, None] + jj)).astype(dtype)


def _is_active(t):
    return (t == int(CtrType.ACTIVE_LB)) | (t == int(CtrType.ACTIVE_UB)) | (
        t == int(CtrType.ACTIVE_EQ))


def _rhs_of_type(lb, ub, t):
    is_ub = (t == int(CtrType.ACTIVE_UB)) | (t == int(CtrType.ACTIVE_EQ))
    is_lb = t == int(CtrType.ACTIVE_LB)
    return jnp.where(is_ub, ub, jnp.where(is_lb, lb, 0.0))


# ---------------------------------------------------------------------------
# Per-iteration pieces (value-level, batched over the TB tile axis)
# ---------------------------------------------------------------------------


def _gauss_columns(Bpad, Rpad, rank, K):
    """L with L R = B by a forward column sweep (reference Gauss step,
    ``lexlse.h:431-471``): column j of L is (B_j - sum_{i<j} L_i R_{ij})
    / R_{jj}.  Static unroll over K; columns at or beyond the discovered
    rank are zero.  Bpad (TB, Mk, K), Rpad (TB, K, K), rank (TB, 1)."""
    # single working buffer: column j is finalized to L's column at step
    # j while columns > j still carry partially-eliminated B (keeps the
    # unrolled chain at one live (TB, Mk, K) value)
    W = Bpad
    jcol = lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    for j in range(K):
        live = (j < rank).astype(Bpad.dtype)  # (TB, 1)
        rjj = Rpad[:, j, j][:, None]
        rjj_safe = jnp.where(jnp.abs(rjj) > 0, rjj, 1.0)
        lj = (W[:, :, j] / rjj_safe) * live  # (TB, Mk)
        # trailing elimination (cols > j) and L write (col == j) fused;
        # masked full-width update (Mosaic has no scatter-add)
        rrow = Rpad[:, j, :][:, None, :] * (jcol > j).astype(Bpad.dtype)
        W = jnp.where(jcol == j, lj[:, :, None], W - lj[:, :, None] * rrow)
    return W  # (TB, Mk, K) = L


def _backsub(Rpad, seg, rank, K):
    """y with triu(Rpad) y = seg (within-level backward substitution,
    reference ``lexlse.h:1015-1045``); rows at or beyond rank give 0."""
    acc = seg  # (TB, K)
    y = jnp.zeros_like(seg)
    jcol = lax.broadcasted_iota(jnp.int32, (1, K), 1)
    for j in range(K - 1, -1, -1):
        live = (j < rank).astype(seg.dtype)
        rjj = Rpad[:, j, j][:, None]
        rjj_safe = jnp.where(jnp.abs(rjj) > 0, rjj, 1.0)
        yj = (acc[:, j][:, None] / rjj_safe) * live  # (TB, 1)
        if j > 0:
            # masked full-width update (Mosaic has no scatter-add)
            acc = acc - yj * (Rpad[:, :, j] * (jcol < j).astype(seg.dtype))
        # masked element write (narrow stacks miscompile in Mosaic)
        y = jnp.where(jcol == j, yj, y)
    return y  # (TB, K)


def _apply_q_rows(S, VT, tau_lvl, K):
    """S <- S Q^T row-form: apply Q = H_0 ... H_{K-1} to each row of S
    (TB, r, dim) by sequential Householder replay, j = K-1 .. 0 —
    the reference's ``applyOnTheLeft(householderSequence(...))`` order
    (``lexlse.h:550-552``).  VT (TB, K, dim): row j holds reflection
    vector v_j (zero when the step is dead); tau_lvl (TB, >=K)."""
    for j in range(K - 1, -1, -1):
        vj = VT[:, j, :]  # (TB, dim)
        coef = jnp.sum(S * vj[:, None, :], axis=2)  # (TB, r)
        S = S - tau_lvl[:, j][:, None, None] * coef[:, :, None] * vj[:, None, :]
    return S


def _check_blocking_tile(ctr_type, Ax, Adx, v, dv, lb, ub, tol_feasibility,
                         iota_m, dtype):
    """Batched ratio test (mirrors ``lexlsi._check_blocking``,
    reference ``objective.h:521-578``); first-minimum tie-break."""
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
    amin = jnp.min(masked, axis=1, keepdims=True)  # (TB, 1)
    first = eligible & (masked == amin)
    row = jnp.min(jnp.where(first, iota_m, _INT_MAX), axis=1,
                  keepdims=True).astype(jnp.int32)  # (TB, 1)
    blocking = (amin < 1.0) & (row < iota_m.shape[1])
    alpha = jnp.where(blocking, amin, jnp.asarray(1.0, dtype))
    row_hot = iota_m == row
    btype = jnp.sum(jnp.where(row_hot & blocking, typ, 0), axis=1,
                    keepdims=True).astype(jnp.int32)
    row = jnp.where(blocking, row, -1)
    return alpha, row, btype, blocking


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _fused_kernel(ctx, A_in, lb_in, ub_in, ct_in, st_in, ns_in, x_in, v_in,
                  Ax_in, nf_in, it0_in, prio_in, elig_in, vmap_in,
                  vplace_in, gplace_in, lvlrow_in,
                  lobj_in, lctr_in, ltyp_in, lval_in, lrank_in, lcyc_in,
                  llen_in, lovf_in, ccnt_in, cop_in, crow_in, ctypv_in,
                  x_o, v_o, dx_o, dv_o, Ax_o, Adx_o, ct_o, st_o, ns_o,
                  it_o, na_o, nd_o, nf_o, status_o, rpad_o, posf_o, ranks_o,
                  lb_o, ub_o,
                  lobj_o, lctr_o, ltyp_o, lval_o, lrank_o, lcyc_o,
                  llen_o, lovf_o, ccnt_o, cop_o, crow_o, ctypv_o,
                  lod_ref, hh_ref, pos_ref, cn_ref,
                  ci_ref, stop_ref, *v_refs):
    """One batch tile's full active-set solve; ``ctx`` carries the static
    problem structure and tolerances; ``prio_in``/``elig_in`` (p, m) hold
    the lambda-sweep visit priorities / eligibility per objective.

    Working-set log (``typedefs.h:380-432``) and cycling handling
    (``cycling.h:32-65``) run IN-kernel when statically enabled
    (``log_cap`` > 0 / ``cycling``): the log is a fixed-capacity VMEM
    ring written by masked one-hot updates, the cycling detector is four
    scalars per instance, and bound relaxation mutates the lb/ub working
    copies (``lb_o``/``ub_o``).  ``lvlrow_in`` (2, m) maps constraint
    row -> (objective index, row-within-objective) for log entries.

    ``ablate`` (profiling-only, see :func:`fused_active_set`) statically
    skips stages; results are meaningless when non-empty."""
    (dims, offsets, n, m, d0, p, tol_ld, tol_feas, tol_wrong, tol_correct,
     max_fact, deact_first, iter_cap, ablate, panel_unroll,
     log_cap, cycling, cyc_max, cyc_relax) = ctx
    Kmax = rpad_o.shape[-1]
    TB = A_in.shape[0]
    dtype = A_in.dtype
    mg = m - d0  # general (lexlse) rows; rows < d0 are simple bounds

    iota_m = lax.broadcasted_iota(jnp.int32, (TB, m), 1)
    iota_n = lax.broadcasted_iota(jnp.int32, (TB, n), 1)

    # --- state initialization from the phase-1 inputs
    x_o[:] = x_in[:]
    v_o[:] = v_in[:]
    Ax_o[:] = Ax_in[:]
    ct_o[:] = ct_in[:]
    st_o[:] = st_in[:]
    ns_o[:] = ns_in[:]
    nf_o[:] = nf_in[:]
    dx_o[:] = jnp.zeros((TB, n), dtype)
    dv_o[:] = jnp.zeros((TB, m), dtype)
    Adx_o[:] = jnp.zeros((TB, m), dtype)
    it_o[:] = jnp.zeros_like(it0_in) if "force" in ablate else it0_in[:]
    na_o[:] = jnp.zeros((TB, 1), jnp.int32)
    nd_o[:] = jnp.zeros((TB, 1), jnp.int32)
    status_o[:] = jnp.full((TB, 1), int(TerminationStatus.UNKNOWN), jnp.int32)
    rpad_o[:] = jnp.zeros((TB, p, Kmax, Kmax), dtype)
    posf_o[:] = iota_n
    ranks_o[:] = jnp.zeros((TB, p), jnp.int32)
    # lb/ub working copies (cycling relaxation mutates them in-kernel)
    lb_o[:] = lb_in[:]
    ub_o[:] = ub_in[:]
    # working-set log + cycling state (resume-capable: seeded from inputs)
    lobj_o[:] = lobj_in[:]
    lctr_o[:] = lctr_in[:]
    ltyp_o[:] = ltyp_in[:]
    lval_o[:] = lval_in[:]
    lrank_o[:] = lrank_in[:]
    lcyc_o[:] = lcyc_in[:]
    llen_o[:] = llen_in[:]
    lovf_o[:] = lovf_in[:]
    ccnt_o[:] = ccnt_in[:]
    cop_o[:] = cop_in[:]
    crow_o[:] = crow_in[:]
    ctypv_o[:] = ctypv_in[:]

    def alive_now():
        if "off" in ablate:
            # profiling mode: run zero iterations (isolates the call
            # boundary + state copies from the loop cost)
            return jnp.zeros((TB, 1), bool)
        if "force" in ablate:
            # profiling mode: run exactly it0 iterations per instance
            return it_o[:] < it0_in[:]
        alive = (status_o[:] == int(TerminationStatus.UNKNOWN)) & (
            (it_o[:] == 0) | (nf_o[:] < max_fact))
        if iter_cap:
            # pause (do not terminate) after iter_cap iterations of THIS
            # call — the compaction driver resumes via it0
            alive = alive & (it_o[:] < it0_in[:] + iter_cap)
        return alive

    def body(_carry):
        alive = alive_now()  # (TB, 1)
        ct = ct_o[:]
        lb = lb_o[:]
        ub = ub_o[:]
        active = _is_active(ct)
        rhs_row = _rhs_of_type(lb, ub, ct)

        # ---- build the masked LexLSE subproblem in the LOD
        # (``formLexLSE``: lexlsi.h:968-982 — inactive rows are zero;
        # active simple-bounds rows become fixed variables: their columns
        # are zeroed and eliminated from the RHS, ``lexlse.h:132-156``)
        actf = active.astype(dtype)
        if "lodinit" in ablate:
            # profiling stub: factorize whatever the LOD holds (stale,
            # data-dependent — cannot be constant-folded)
            fixed_mask = fixed_val = Agm = None
            if d0:
                fixed_mask = jnp.zeros((TB, n), dtype)
                fixed_val = jnp.zeros((TB, n), dtype)
                Agm = A_in[:, pl.ds(d0, mg), :]
        elif d0:
            vm = vmap_in[:]  # (d0, n) one-hot row->variable map
            act0 = actf[:, :d0]
            fixed_mask = jnp.sum(act0[:, :, None] * vm[None, :, :],
                                 axis=1)  # (TB, n) in {0,1}
            fixed_val = jnp.sum((act0 * rhs_row[:, :d0])[:, :, None]
                                * vm[None, :, :], axis=1)
            # Mosaic cannot reshape a lane-OFFSET vector to a trailing
            # size-1 axis once the width crosses the 128-lane tile:
            # any (TB, mg) SLICE (value slice or pl.ds ref load at a
            # nonzero start) of the d0-offset general rows fails
            # "Unsupported reshape" on `[:, :, None]` (observed on
            # test_01: d0=60, mg=135).  Offset-free full-width vectors
            # reshape fine — so mask A at FULL width (the d0 rows'
            # product is discarded) and take the 3D mid-axis slice of
            # the result, keeping the sliced 2D masks for 2D uses only.
            # Bit-identical values.
            actg = lax.slice_in_dim(actf, d0, m, axis=1)
            rhsg = lax.slice_in_dim(rhs_row, d0, m, axis=1)
            Agm = lax.slice_in_dim(A_in[:] * actf[:, :, None],
                                   d0, m, axis=1)
            lod_ref[:, :, :n] = Agm * (1.0 - fixed_mask[:, None, :])
            # the 2D->3D store of the rhs column reshapes its value to
            # (TB, mg, 1) — unsupported for the OFFSET layout the
            # rhsg/actg slices carry once mg > 128.  Relayout through
            # an exact identity matmul (0/1 weights, one term per
            # row-sum: bit-identical) before the store.
            col = rhsg * actg - jnp.sum(
                Agm * fixed_val[:, None, :], axis=2)
            iota_g = lax.broadcasted_iota(jnp.int32, (mg, mg), 0)
            eye_g = (iota_g == iota_g.T).astype(dtype)
            lod_ref[:, :, n] = jnp.dot(col, eye_g,
                                       precision=lax.Precision.HIGHEST)
        else:
            fixed_mask = fixed_val = Agm = None
            lod_ref[:, :, :n] = A_in[:] * actf[:, :, None]
            lod_ref[:, :, n] = rhs_row * actf

        # ---- factorize: per-level panel pivot loop + Gauss elimination
        pos_ref[:] = iota_n
        ci_ref[:] = jnp.zeros((TB, 1), jnp.int32)
        hh_ref[:] = jnp.zeros((TB, mg), dtype)

        per_level = []  # (fr, dim, K, fc, end, rank, Chot, Rpad, V, taus)
        for k in range(p):
            fr, dim = offsets[k], dims[k]
            K = min(dim, n)
            fc = ci_ref[:]  # (TB, 1) first position of this level
            if dim == 0:
                per_level.append(None)
                continue

            block0 = lod_ref[:, fr : fr + dim, :]
            cn_ref[:] = jnp.sum(block0[:, :, :n] * block0[:, :, :n], axis=1)
            stop_ref[:] = jnp.zeros((TB, 1), jnp.int32)
            hh_ref[:, fr : fr + dim] = jnp.zeros((TB, dim), dtype)
            v_refs[k][:] = jnp.zeros_like(v_refs[k])

            def panel_step(counter, fr=fr, dim=dim, K=K, k=k):
                ci_old = ci_ref[:]
                out = _panel_step_core(
                    counter, lod_ref[:, fr : fr + dim, :], cn_ref[:],
                    pos_ref[:], None, ci_old, stop_ref[:],
                    None, hh_ref[:, fr : fr + dim],
                    fr=fr, dim=dim, n=n, tol=tol_ld,
                    defer_downdate=True, lean=True)
                lod_ref[:, fr : fr + dim, :] = out[0]
                cn = out[1]
                pos_ref[:] = out[2]
                ci_ref[:] = out[4]
                stop_ref[:] = out[5]
                hh_ref[:, fr : fr + dim] = out[7]

                # deferred norm downdate: read the updated pivot row
                # back (dynamic sublane slice — cheaper than a
                # one-hot contraction over the whole block)
                prow = lod_ref[:, pl.ds(fr + counter, 1), :n][:, 0, :]
                accept = ci_ref[:] > ci_old
                dd = jnp.where(pos_ref[:] > ci_old, prow * prow, 0.0)
                cn_ref[:] = jnp.where(accept, cn - dd, cn)

                # stash the reflection vector for the lambda replay
                # (the sweep would otherwise re-gather it via Chot)
                @pl.when(counter < K)
                def _():
                    v_refs[k][:, pl.ds(counter, 1), :] = out[8][:, None, :]

            if "panel" not in ablate:
                if panel_unroll > 1:
                    # unrolling U pivot steps per loop trip keeps the
                    # math bit-identical but widens the scheduler's
                    # window (measured ~neutral; kept as a knob)
                    U = panel_unroll
                    nfull, rem = divmod(dim, U)

                    def panel_multi(g, _c):
                        for i in range(U):
                            @pl.when(jnp.min(stop_ref[:]) == 0)
                            def _(i=i):
                                panel_step(g * U + i)
                        return 0

                    lax.fori_loop(0, nfull, panel_multi, 0)
                    for i in range(rem):
                        @pl.when(jnp.min(stop_ref[:]) == 0)
                        def _(i=i):
                            panel_step(nfull * U + i)
                else:
                    # while loop: the level ends as soon as every
                    # instance in the tile hit its rank cutoff — dead
                    # trailing steps of rank-deficient levels cost
                    # nothing (they are common: masked inactive rows
                    # contribute no rank)
                    def panel_cond(c):
                        return (c < dim) & (jnp.min(stop_ref[:]) == 0)

                    def panel_body(c):
                        panel_step(c)
                        return c + 1

                    lax.while_loop(panel_cond, panel_body, 0)
            hh_lvl = hh_ref[:, fr : fr + dim]

            end = ci_ref[:]            # (TB, 1) position after this level
            rank = end - fc

            # one-hot position->column map of this level's K pivot slots:
            # Chot[t, j, c] = (pos[t, c] == fc + j); replaces every gather.
            # Rebuilt on use (positions < end are frozen once the level's
            # panel is done) — keeping it live across phases costs VMEM.
            Chot = _chot(pos_ref[:], fc, K, dtype)
            ChotT = jnp.swapaxes(Chot, 1, 2)        # (TB, n, K)
            rows_lvl = lod_ref[:, fr : fr + K, :n]  # (TB, K, n)
            Rpad = (jnp.zeros((TB, K, K), dtype) if "rpad" in ablate
                    else _bdot(rows_lvl, ChotT))    # (TB, K, K)

            per_level.append((fr, dim, K, fc, end, rank, Rpad, hh_lvl))

            # ---- Gauss elimination of all lower-priority rows, in row
            # chunks: the column sweep for L is row-independent given
            # Rpad, so chunking bounds the live (TB, rows, n+1)
            # temporaries (VMEM peak) without changing the math
            if k < p - 1 and "gauss" not in ablate:
                jrow = lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)
                Up = lod_ref[:, fr : fr + K, :]
                Up = Up * (jrow < rank[:, :, None]).astype(dtype)
                trail = jnp.concatenate(
                    [(pos_ref[:] >= end).astype(dtype),
                     jnp.ones((TB, 1), dtype)], axis=1)
                Up = Up * trail[:, None, :]
                store = (pos_ref[:] >= fc) & (pos_ref[:] < end)
                Mk = mg - (fr + dim)
                CHUNK = 128
                for r0 in range(0, Mk, CHUNK):
                    r1 = min(r0 + CHUNK, Mk)
                    below = lod_ref[:, fr + dim + r0 : fr + dim + r1, :]
                    Bpad = _bdot(below[:, :, :n], ChotT)  # (TB, rc, K)
                    Lm = _gauss_columns(Bpad, Rpad, rank, K)
                    new_below = below - _bdot(Lm, Up)
                    Lscat = _bdot(Lm, Chot)  # (TB, rc, n)
                    new_below = jnp.concatenate(
                        [jnp.where(store[:, None, :], Lscat,
                                   new_below[:, :, :n]),
                         new_below[:, :, n:]], axis=2)
                    lod_ref[:, fr + dim + r0 : fr + dim + r1, :] = new_below

        # ---- export the factorization of this (the latest alive)
        # iteration: per-level R in pivot order, final positions, ranks.
        # The last alive iteration of a solved instance factorizes its
        # FINAL working set (the working set is unchanged on the solving
        # iteration), so what survives here is the final factorization —
        # the carried state of the cross-solve warm tracker
        # (lexls_tpu/tracker.py).
        a1 = alive[:, :, None]  # (TB,1,1); int-index+None forms lower to
        # a gather that Mosaic rejects inside while loops — broadcast
        # via None on the full slice instead.
        for k in range(p):
            if per_level[k] is None:
                continue
            _, _, K, fc, end, rank, Rpad_k, _ = per_level[k]
            rpad_o[:, k, :K, :K] = jnp.where(a1, Rpad_k,
                                             rpad_o[:, k, :K, :K])
            ranks_o[:, k : k + 1] = jnp.where(alive, rank,
                                              ranks_o[:, k : k + 1])
        posf_o[:] = jnp.where(alive, pos_ref[:], posf_o[:])

        total_rank = ci_ref[:]  # (TB, 1) — positions consumed = Σ ranks

        # ---- basic solve: per-level backward substitution in variable
        # space (free variables = 0; ``lexlse.h:1015-1045``)
        x_var = jnp.zeros((TB, n), dtype)
        for k in range(p - 1, -1, -1):
            if per_level[k] is None or "solve" in ablate:
                continue
            fr, dim, K, fc, end, rank, Rpad, hh_lvl = per_level[k]
            trail_mask = (pos_ref[:] >= end).astype(dtype)
            xt = x_var * trail_mask
            rows_lvl = lod_ref[:, fr : fr + K, :n]
            contrib = jnp.sum(rows_lvl * xt[:, None, :], axis=2)  # (TB, K)
            jr = lax.broadcasted_iota(jnp.int32, (1, K), 1)
            seg = (lod_ref[:, fr : fr + K, n] - contrib) * (
                jr < rank).astype(dtype)
            y = _backsub(Rpad, seg, rank, K)
            x_var = x_var + jnp.sum(
                y[:, :, None] * _chot(pos_ref[:], fc, K, dtype), axis=1)

        if d0:
            x_var = jnp.where(fixed_mask > 0, fixed_val, x_var)

        # ---- form the step (``objective.h:288-338``)
        x_star = x_var
        if "form" in ablate:
            dx = jnp.zeros((TB, n), dtype)
            Adx = jnp.zeros((TB, m), dtype)
            dv = jnp.zeros((TB, m), dtype)
            alpha = jnp.ones((TB, 1), dtype)
            brow = jnp.full((TB, 1), -1, jnp.int32)
            btype = jnp.zeros((TB, 1), jnp.int32)
            blocking = jnp.zeros((TB, 1), bool)
        else:
            dx = x_star - x_o[:]
            if "adx" in ablate:
                # profiling stub: (TB, m)-shaped, data-dependent, cheap
                Adx = v_o[:] * 1.0000001 + dx[:, :1]
            else:
                Adx = jnp.sum(A_in[:] * dx[:, None, :], axis=2)
            dv = -v_o[:] + jnp.where(active, Ax_o[:] + Adx - rhs_row, 0.0)

            # ---- ratio test over inactive constraints
            if "ratio" in ablate:
                # profiling stub: data-dependent scalars, no reductions
                blocking = dv[:, :1] > 1e30
                alpha = jnp.where(blocking, 0.5, 1.0).astype(dtype)
                brow = jnp.where(blocking, 0, -1).astype(jnp.int32)
                btype = jnp.where(blocking, int(CtrType.ACTIVE_LB),
                                  0).astype(jnp.int32)
            else:
                alpha, brow, btype, blocking = _check_blocking_tile(
                    ct, Ax_o[:], Adx, v_o[:], dv, lb, ub, tol_feas, iota_m,
                    dtype)

        # ---- lambda sweep (constraint removal), skipped for the whole
        # tile when every live instance has a blocking constraint
        want_sweep = jnp.logical_not(blocking)
        want_any = jnp.max(jnp.where(alive & want_sweep, 1, 0)) > 0

        def run_sweep():
            # all objectives' multipliers by one descending pass per level
            # (transposed form of ``ObjectiveSensitivity``,
            # ``lexlse.h:611-762``), Householder replay inside; lam spans
            # the GENERAL rows (bounds rows get lam_fixed, see selection)
            lam_parts = [None] * p
            rhs_all = jnp.zeros((TB, p, n), dtype)
            jvec = lax.broadcasted_iota(jnp.int32, (1, p, 1), 1)
            for k in range(p - 1, -1, -1):
                if per_level[k] is None:
                    lam_parts[k] = jnp.zeros((TB, p, dims[k]), dtype)
                    continue
                fr, dim, K, fc, end, rank, Rpad, hh_lvl = per_level[k]
                Chot = _chot(pos_ref[:], fc, K, dtype)
                # reflection vectors stashed during the panel loop
                VT = v_refs[k][:, :K, :dim]  # (TB, K, dim)
                rows_d = lax.broadcasted_iota(jnp.int32, (TB, 1, dim), 2)
                rhs_seg = lod_ref[:, fr : fr + dim, n]  # (TB, dim)
                seg_top = jnp.where(rows_d[:, 0, :] >= rank, -rhs_seg, 0.0)
                Z = jnp.sum(rhs_all[:, :, None, :] * Chot[:, None, :, :],
                            axis=3)  # (TB, p, K)
                if dim > K:
                    segs = jnp.concatenate(
                        [Z, jnp.zeros((TB, p, dim - K), dtype)], axis=2)
                else:
                    segs = Z
                segs = jnp.where(rows_d < rank[:, :, None], segs, 0.0)
                seg_k = jnp.where(jvec == k, seg_top[:, None, :], segs)
                seg_k = _apply_q_rows(seg_k, VT, hh_lvl, K)
                valid = jvec >= k
                seg_k = jnp.where(valid, seg_k, 0.0)
                lam_parts[k] = seg_k
                blockk = lod_ref[:, fr : fr + dim, :n]
                contrib = jnp.sum(seg_k[:, :, :, None] * blockk[:, None, :, :],
                                  axis=2)  # (TB, p, n)
                # physical column c participates iff its *position* is
                # below this level's first pivot slot (the lod here is in
                # the virtual frame, unlike the physicalized LexQR.lod)
                below_fc = pos_ref[:][:, None, :] < fc[:, :, None]
                rhs_all = jnp.where(valid & below_fc, rhs_all - contrib,
                                    rhs_all)
            # assemble (TB, p, m) in row order (no scatter in Mosaic)
            return jnp.concatenate(lam_parts, axis=2)

        lam_all = (jnp.zeros((TB, p, mg), dtype) if "sweep" in ablate
                   else lax.cond(want_any, run_sweep,
                                 lambda: jnp.zeros((TB, p, mg), dtype)))

        # ---- removal selection (``findActiveCtr2Remove``,
        # ``lexlsi.h:1048-1139`` + CORRECT_SIGN exemption)
        sense = ct
        found = jnp.zeros((TB, 1), bool)
        sel_row = jnp.full((TB, 1), -1, jnp.int32)
        sel_val = jnp.zeros((TB, 1), dtype)
        if "rsel" in ablate:
            # profiling stub: data-dependent, skips the selection loop
            found = lam_all[:, 0, :1] > 1e30
            sel_row = jnp.where(found, 0, -1).astype(jnp.int32)
        for j in range(p if ("sweep" not in ablate and "rsel" not in ablate)
                       else 0):
            lam_j = lam_all[:, j, :]  # (TB, mg)
            if d0:
                # lambda of the fixed variables: -A_fix^T lam over the
                # masked general rows (``lexlse.h:591-601``), mapped back
                # to the bounds rows through the variable map
                lam_fixed = -jnp.sum(Agm * lam_j[:, :, None], axis=1)
                lam_fixed = lam_fixed * fixed_mask  # (TB, n)
                # place both segments into row order by one-hot matmuls
                # (vplace (n, m) maps variable v to its bounds row; gplace
                # (mg, m) shifts general rows by d0) — Mosaic-safe where a
                # narrow lane concatenate miscompiles
                vals = (jnp.dot(lam_fixed, vplace_in[:], precision=_HIGH)
                        + jnp.dot(lam_j, gplace_in[:], precision=_HIGH))
            else:
                vals = lam_j
            eligible = (elig_in[j, :] != 0)[None, :]
            a = jnp.where(ct == int(CtrType.ACTIVE_LB), -vals, vals)
            consider = eligible & (
                (sense == int(CtrType.ACTIVE_LB))
                | (sense == int(CtrType.ACTIVE_UB)))
            mark = consider & (a > tol_correct)
            wrong = consider & (a < -tol_wrong)
            sense = jnp.where(mark & jnp.logical_not(found),
                              int(CtrType.CORRECT_SIGN_OF_LAMBDA), sense)
            found_j = jnp.max(jnp.where(wrong, 1, 0), axis=1,
                              keepdims=True) > 0
            if deact_first:
                key = jnp.where(wrong, st_o[:], _INT_MAX)
                kmin = jnp.min(key, axis=1, keepdims=True)
                first = wrong & (st_o[:] == kmin)
                row_j = jnp.min(jnp.where(first, iota_m, _INT_MAX), axis=1,
                                keepdims=True).astype(jnp.int32)
                val_j = jnp.zeros((TB, 1), dtype)
            else:
                amask = jnp.where(wrong, a, jnp.asarray(jnp.inf, dtype))
                amin = jnp.min(amask, axis=1, keepdims=True)
                tie = wrong & (a == amin)
                prio = prio_in[j, :][None, :]
                pmin = jnp.min(jnp.where(tie, prio, _INT_MAX), axis=1,
                               keepdims=True)
                first = tie & (prio == pmin)
                row_j = jnp.min(jnp.where(first, iota_m, _INT_MAX), axis=1,
                                keepdims=True).astype(jnp.int32)
                val_j = amin
            commit = found_j & jnp.logical_not(found)
            sel_row = jnp.where(commit, row_j, sel_row)
            sel_val = jnp.where(commit, val_j, sel_val)
            found = found | found_j

        do_remove = want_sweep & found
        solved = want_sweep & jnp.logical_not(found)
        rrow = sel_row

        # ---- working-set update (+stamps), step, counters
        if "wsupd" in ablate:
            # profiling stub: keep the working set (data-dependent)
            new_ct = jnp.where(blocking, ct, ct)
            new_st = st_o[:]
        else:
            brow_hot = iota_m == brow
            rrow_hot = iota_m == rrow
            new_ct = jnp.where(blocking & brow_hot, btype,
                               jnp.where(do_remove & rrow_hot,
                                         int(CtrType.INACTIVE), ct))
            new_st = jnp.where(blocking & brow_hot, ns_o[:],
                               jnp.where(do_remove & rrow_hot, -1, st_o[:]))
        new_ns = ns_o[:] + blocking.astype(jnp.int32)

        take = (alpha > 0.0).astype(dtype)
        afl = alpha * take
        new_x = x_o[:] + afl * dx
        new_v = v_o[:] + afl * dv
        new_Ax = Ax_o[:] + afl * Adx

        new_status = (status_o[:] if "force" in ablate else
                      jnp.where(solved, int(TerminationStatus.PROBLEM_SOLVED),
                                status_o[:]))
        new_it = it_o[:] + 1
        new_na = na_o[:] + blocking.astype(jnp.int32)
        new_nd = nd_o[:] + do_remove.astype(jnp.int32)
        new_nf = nf_o[:] + (it_o[:] > 0).astype(jnp.int32)

        # ---- working-set log (``typedefs.h:380-432``, ``lexlsi.h:1188-1222``)
        # fixed-capacity VMEM buffer, masked one-hot writes (no scatter)
        if log_cap:
            iota_c = lax.broadcasted_iota(jnp.int32, (TB, log_cap), 1)
            want_log = (blocking | do_remove) & alive
            can_log = llen_o[:] < log_cap
            do_log = want_log & can_log
            lovf_o[:] = jnp.where(want_log & jnp.logical_not(can_log),
                                  1, lovf_o[:])
            lrow = jnp.where(blocking, brow, rrow)            # (TB, 1)
            rh = iota_m == lrow
            lvlrow = lvlrow_in[:]                             # (2, m)
            lvl_map = lax.slice_in_dim(lvlrow, 0, 1, axis=0)  # (1, m)
            row_map = lax.slice_in_dim(lvlrow, 1, 2, axis=0)
            lvl = jnp.sum(jnp.where(rh, lvl_map, 0), axis=1, keepdims=True)
            ctr_in_lvl = jnp.sum(jnp.where(rh, row_map, 0), axis=1,
                                 keepdims=True)
            entry_type = jnp.where(blocking, btype, int(CtrType.INACTIVE))
            entry_val = jnp.where(blocking, alpha, sel_val)
            at = do_log & (iota_c == llen_o[:])
            lobj_o[:] = jnp.where(at, lvl, lobj_o[:])
            lctr_o[:] = jnp.where(at, ctr_in_lvl, lctr_o[:])
            ltyp_o[:] = jnp.where(at, entry_type, ltyp_o[:])
            lval_o[:] = jnp.where(at, entry_val, lval_o[:])
            lrank_o[:] = jnp.where(at, total_rank, lrank_o[:])
            llen_o[:] = llen_o[:] + do_log.astype(jnp.int32)

        # ---- cycling handling (``cycling.h:32-65``): a REMOVE followed
        # by an ADD of the same (row, type) relaxes the bound that was
        # removed; past cyc_max occurrences the solve terminates with
        # PROBLEM_SOLVED_CYCLING_HANDLING
        if cycling:
            op = jnp.where(blocking, int(OperationType.ADD),
                           jnp.where(do_remove, int(OperationType.REMOVE),
                                     int(OperationType.UNDEFINED)))
            crow_now = jnp.where(blocking, brow,
                                 jnp.where(do_remove, rrow, -1))
            # the type the row was added with / had before removal
            rm_typ = jnp.sum(jnp.where((iota_m == rrow) & do_remove, ct, 0),
                             axis=1, keepdims=True).astype(jnp.int32)
            ctyp_now = jnp.where(blocking, btype,
                                 jnp.where(do_remove, rm_typ, -1))
            detected = ((op == int(OperationType.ADD))
                        & (cop_o[:] == int(OperationType.REMOVE))
                        & (crow_now == crow_o[:])
                        & (ctyp_now == ctypv_o[:])
                        & alive)
            over = detected & (ccnt_o[:] >= cyc_max)
            relax = detected & jnp.logical_not(over)
            new_status = jnp.where(
                over,
                int(TerminationStatus.PROBLEM_SOLVED_CYCLING_HANDLING),
                new_status)
            ph = iota_m == crow_o[:]
            lb_o[:] = jnp.where(
                relax & ph & (ctypv_o[:] == int(CtrType.ACTIVE_LB)),
                lb_o[:] - cyc_relax, lb_o[:])
            ub_o[:] = jnp.where(
                relax & ph & (ctypv_o[:] == int(CtrType.ACTIVE_UB)),
                ub_o[:] + cyc_relax, ub_o[:])
            ccnt_o[:] = ccnt_o[:] + relax.astype(jnp.int32)
            if log_cap:
                last = jnp.clip(llen_o[:] - 1, 0, log_cap - 1)
                lcyc_o[:] = jnp.where(relax & (iota_c == last), 1, lcyc_o[:])
            upd = (op != int(OperationType.UNDEFINED)) & alive
            cop_o[:] = jnp.where(upd, op, cop_o[:])
            crow_o[:] = jnp.where(upd, crow_now, crow_o[:])
            ctypv_o[:] = jnp.where(upd, ctyp_now, ctypv_o[:])

        # ---- freeze terminated instances
        af = alive.astype(dtype)
        ai = alive.astype(jnp.int32)
        x_o[:] = x_o[:] + af * (new_x - x_o[:])
        v_o[:] = v_o[:] + af * (new_v - v_o[:])
        Ax_o[:] = Ax_o[:] + af * (new_Ax - Ax_o[:])
        dx_o[:] = dx_o[:] + af * (dx - dx_o[:])
        dv_o[:] = dv_o[:] + af * (dv - dv_o[:])
        Adx_o[:] = Adx_o[:] + af * (Adx - Adx_o[:])
        ct_o[:] = jnp.where(alive, new_ct, ct)
        st_o[:] = jnp.where(alive, new_st, st_o[:])
        ns_o[:] = ns_o[:] + ai * (new_ns - ns_o[:])
        it_o[:] = it_o[:] + ai * (new_it - it_o[:])
        na_o[:] = na_o[:] + ai * (new_na - na_o[:])
        nd_o[:] = nd_o[:] + ai * (new_nd - nd_o[:])
        nf_o[:] = nf_o[:] + ai * (new_nf - nf_o[:])
        status_o[:] = jnp.where(alive, new_status, status_o[:])

        return jnp.max(jnp.where(alive_now(), 1, 0)) > 0

    lax.while_loop(lambda c: c, body,
                   jnp.max(jnp.where(alive_now(), 1, 0)) > 0)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("dims", "d0", "var_idx", "tol_ld", "tol_feas",
                     "tol_wrong", "tol_correct", "max_fact", "deact_first",
                     "prio", "elig", "tile", "interpret", "vmem_limit_mb",
                     "iter_cap", "ablate", "panel_unroll", "log_cap",
                     "cycling", "cyc_max", "cyc_relax"),
)
def fused_active_set(
    A, lb, ub, ctr_type, stamp, next_stamp, x, v, Ax, n_fact,
    it0=None, log_state=None, cyc_state=None,
    *, dims: Tuple[int, ...], tol_ld: float, tol_feas: float,
    tol_wrong: float, tol_correct: float, max_fact: int, deact_first: bool,
    prio, elig, d0: int = 0, var_idx: Tuple[int, ...] = (),
    tile: int = 8, interpret: bool = False, vmem_limit_mb: int = 0,
    iter_cap: int = 0, ablate: Tuple[str, ...] = (), panel_unroll: int = 1,
    log_cap: int = 0, cycling: bool = False, cyc_max: int = 50,
    cyc_relax: float = 1e-8,
):
    """Run the fused active-set loop on a batch (leading axis B).

    ``dims`` are the GENERAL (lexlse) level sizes; when ``d0`` > 0 the
    first ``d0`` constraint rows are a simple-bounds level whose active
    rows fix the variables ``var_idx`` (static tuple).  ``prio`` /
    ``elig`` are tuples-of-tuples (hashable) with the lambda sweep visit
    priorities / eligibility per objective (static, full-m).  Returns
    the tuple of final state arrays.

    ``log_cap`` > 0 enables the in-kernel working-set log at that
    capacity; ``cycling`` enables in-kernel cycling handling
    (``cyc_max``/``cyc_relax`` = ParametersLexLSI's counter/step).
    ``log_state`` = optional (obj, ctr, type, value, rank, cyc, len,
    overflow) arrays and ``cyc_state`` = optional (counter, prev_op,
    prev_row, prev_type) arrays to resume from (compaction phases);
    both default to empty/initial.  The relaxed lb/ub working copies
    and the log/cycling state are appended to the returned tuple.

    ``ablate`` is a PROFILING-ONLY hook (``tools/ablate_fused.py``):
    tokens statically skip kernel stages ("panel", "rpad", "gauss",
    "solve", "form", "sweep") and "force" runs exactly ``it0``
    iterations per instance ignoring convergence — stage cost is then
    the slope of runtime over forced iteration counts.  Results are
    numerically meaningless when ``ablate`` is non-empty.
    """
    B, m, n = A.shape
    p = len(dims)
    dtype = A.dtype
    Kmax = max(1, max((min(d, n) for d in dims), default=1))
    offsets = []
    ofs = 0
    for d in dims:
        offsets.append(ofs)
        ofs += d
    assert ofs == m - d0

    prio_arr = jnp.asarray(np.asarray(prio, np.int32))          # (p, m)
    elig_arr = jnp.asarray(np.asarray(elig, np.int32))          # (p, m)
    vmap_np = np.zeros((max(d0, 1), n), np.float32)
    for r, c in enumerate(var_idx):
        vmap_np[r, c] = 1.0
    vmap_arr = jnp.asarray(vmap_np, dtype)
    # row-placement matrices for the removal sweep's vals assembly:
    # vplace maps variable v to its simple-bounds row (columns < d0),
    # gplace shifts general row i to constraint row d0 + i
    vplace_np = np.zeros((n, m), np.float32)
    for r, c in enumerate(var_idx):
        vplace_np[c, r] = 1.0
    gplace_np = np.zeros((m - d0, m), np.float32)
    for i in range(m - d0):
        gplace_np[i, d0 + i] = 1.0
    vplace_arr = jnp.asarray(vplace_np, dtype)
    gplace_arr = jnp.asarray(gplace_np, dtype)
    # constraint row -> (objective index, row-within-objective) for the
    # working-set log (levels = optional bounds level + general levels)
    lvlrow_np = np.zeros((2, m), np.int32)
    fr_all = 0
    for k, dk in enumerate(([d0] if d0 else []) + list(dims)):
        lvlrow_np[0, fr_all:fr_all + dk] = k
        lvlrow_np[1, fr_all:fr_all + dk] = np.arange(dk)
        fr_all += dk
    lvlrow_arr = jnp.asarray(lvlrow_np)
    ctx = (tuple(dims), tuple(offsets), n, m, d0, p, tol_ld, tol_feas,
           tol_wrong, tol_correct, max_fact, deact_first, iter_cap,
           tuple(ablate), panel_unroll, log_cap, cycling, cyc_max,
           cyc_relax)
    if it0 is None:
        it0 = jnp.zeros((B,), jnp.int32)
    cap = max(log_cap, 1)
    if log_state is None:
        log_state = (jnp.zeros((B, cap), jnp.int32),
                     jnp.zeros((B, cap), jnp.int32),
                     jnp.zeros((B, cap), jnp.int32),
                     jnp.zeros((B, cap), dtype),
                     jnp.zeros((B, cap), jnp.int32),
                     jnp.zeros((B, cap), jnp.int32),
                     jnp.zeros((B, 1), jnp.int32),
                     jnp.zeros((B, 1), jnp.int32))
    if cyc_state is None:
        cyc_state = (jnp.zeros((B, 1), jnp.int32),
                     jnp.full((B, 1), int(OperationType.UNDEFINED),
                              jnp.int32),
                     jnp.full((B, 1), -1, jnp.int32),
                     jnp.full((B, 1), -1, jnp.int32))

    tile = min(tile, B)
    assert B % tile == 0, (B, tile)
    grid = (B // tile,)

    def bspec(*shape):
        return pl.BlockSpec((tile,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    f = jnp.zeros  # noqa: F841  (readability)
    out_shape = (
        jax.ShapeDtypeStruct((B, n), dtype),       # x
        jax.ShapeDtypeStruct((B, m), dtype),       # v
        jax.ShapeDtypeStruct((B, n), dtype),       # dx
        jax.ShapeDtypeStruct((B, m), dtype),       # dv
        jax.ShapeDtypeStruct((B, m), dtype),       # Ax
        jax.ShapeDtypeStruct((B, m), dtype),       # Adx
        jax.ShapeDtypeStruct((B, m), jnp.int32),   # ctr_type
        jax.ShapeDtypeStruct((B, m), jnp.int32),   # stamp
        jax.ShapeDtypeStruct((B, 1), jnp.int32),   # next_stamp
        jax.ShapeDtypeStruct((B, 1), jnp.int32),   # it
        jax.ShapeDtypeStruct((B, 1), jnp.int32),   # n_act
        jax.ShapeDtypeStruct((B, 1), jnp.int32),   # n_deact
        jax.ShapeDtypeStruct((B, 1), jnp.int32),   # n_fact
        jax.ShapeDtypeStruct((B, 1), jnp.int32),   # status
        jax.ShapeDtypeStruct((B, p, Kmax, Kmax), dtype),  # final per-level R
        jax.ShapeDtypeStruct((B, n), jnp.int32),   # final positions
        jax.ShapeDtypeStruct((B, p), jnp.int32),   # final ranks
        jax.ShapeDtypeStruct((B, m), dtype),       # lb (cycling-relaxed)
        jax.ShapeDtypeStruct((B, m), dtype),       # ub (cycling-relaxed)
        jax.ShapeDtypeStruct((B, cap), jnp.int32),  # log_obj
        jax.ShapeDtypeStruct((B, cap), jnp.int32),  # log_ctr
        jax.ShapeDtypeStruct((B, cap), jnp.int32),  # log_type
        jax.ShapeDtypeStruct((B, cap), dtype),      # log_value
        jax.ShapeDtypeStruct((B, cap), jnp.int32),  # log_rank
        jax.ShapeDtypeStruct((B, cap), jnp.int32),  # log_cycling
        jax.ShapeDtypeStruct((B, 1), jnp.int32),    # log_len
        jax.ShapeDtypeStruct((B, 1), jnp.int32),    # log_overflow
        jax.ShapeDtypeStruct((B, 1), jnp.int32),    # cyc_counter
        jax.ShapeDtypeStruct((B, 1), jnp.int32),    # cyc_prev_op
        jax.ShapeDtypeStruct((B, 1), jnp.int32),    # cyc_prev_row
        jax.ShapeDtypeStruct((B, 1), jnp.int32),    # cyc_prev_type
    )
    out_specs = (
        bspec(n), bspec(m), bspec(n), bspec(m), bspec(m), bspec(m),
        bspec(m), bspec(m), bspec(1), bspec(1), bspec(1), bspec(1),
        bspec(1), bspec(1), bspec(p, Kmax, Kmax), bspec(n), bspec(p),
        bspec(m), bspec(m),
        bspec(cap), bspec(cap), bspec(cap), bspec(cap), bspec(cap),
        bspec(cap), bspec(1), bspec(1),
        bspec(1), bspec(1), bspec(1), bspec(1),
    )
    in_specs = [
        bspec(m, n), bspec(m), bspec(m), bspec(m), bspec(m), bspec(1),
        bspec(n), bspec(m), bspec(m), bspec(1), bspec(1),
        pl.BlockSpec((p, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((p, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((max(d0, 1), n), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m - d0, m), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        bspec(cap), bspec(cap), bspec(cap), bspec(cap), bspec(cap),
        bspec(cap), bspec(1), bspec(1),
        bspec(1), bspec(1), bspec(1), bspec(1),
    ]
    mg = m - d0
    scratch = [
        pltpu.VMEM((tile, mg, n + 1), dtype),  # lod (general rows)
        pltpu.VMEM((tile, mg), dtype),         # hh
        pltpu.VMEM((tile, n), jnp.int32),      # pos
        pltpu.VMEM((tile, n), dtype),          # col norms
        pltpu.VMEM((tile, 1), jnp.int32),      # col_index
        pltpu.VMEM((tile, 1), jnp.int32),      # stopped
    ] + [
        # per-level reflection vectors V^T (row j = v_j), filled by the
        # panel loop, consumed by the lambda replay
        pltpu.VMEM((tile, max(min(d, n), 1), max(d, 1)), dtype)
        for d in dims
    ]

    kwargs = {}
    if vmem_limit_mb and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_fused_kernel, ctx),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(A, lb, ub, ctr_type, stamp, next_stamp[:, None], x, v, Ax,
      n_fact[:, None], it0[:, None], prio_arr, elig_arr, vmap_arr,
      vplace_arr, gplace_arr, lvlrow_arr, *log_state, *cyc_state)
