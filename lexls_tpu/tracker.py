"""Cross-solve warm-start tracker: iteration 0 on the MXU.

The reference's design point is warm-started IK sequences
(``/root/reference/README.md:14``): consecutive problems differ by a
small drift, and the final active set of solve *t* seeds solve *t+1*
(``doc/hot_start.tex:437-571``).  In that regime, iteration 0 of solve
*t+1* factorizes almost the same matrix as the final iteration of solve
*t* — yet the reference (and our fused kernel) rebuilds the
column-pivoted l-QR from scratch, a serial chain of ~n pivot steps that
no amount of batching can shorten (``lexlse.h:117-506`` refactorizes
every iteration; the reference has **no** factorization reuse).

This module re-factorizes with the CARRIED pivot order instead:

* ``M = B̃_P · Rinv_old`` (the drifted pivot block times the carried
  inverse triangular factor) is near-orthonormal under drift, so a few
  Newton–Schulz inverse-square-root iterations re-orthonormalize it —
  nothing but batched MXU matmuls, no serial dependency chains;
* the rank pattern is VERIFIED post-hoc: ``‖MᵀM − I‖_max`` bounds the
  pivot block's conditioning drift (a pivot column going dependent
  drives it to ~1), and the trailing column-norm test (norms after
  projecting out Q below ``tol_linear_dependence``) certifies that no
  new pivot is needed — the same acceptance rule the greedy panel
  enforces, checked at the same float precision;
* instances that pass and terminate (no blocking constraint, no
  wrong-sign multiplier) are DONE after one tracker iteration at
  batched-matmul cost; everything else falls back into the fused Pallas
  kernel, entering at iteration 1 with the tracker's working-set update
  already applied — or at iteration 0 untouched when verification
  failed.

Correctness envelope (opt-in mode): when verification accepts, the
pivot SET equals the previous solve's and the per-level residuals v are
pivot-order invariant, so x/v match the from-scratch solver to solver
tolerance; the working-set TRAJECTORY can differ from the reference on
degenerate ties (accepted — x/v parity is the criterion, PARITY.md).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .lexlsi import (Structure, _check_blocking, _form_step,
                     _initial_state, _masked_general,
                     _permute_rows, _fused_tail)
from .ops.tri import tri_inv_upper
from .types import (CtrType, LexLSError, ParametersLexLSI,
                    RegularizationType, TerminationStatus)

_INT_MAX = jnp.iinfo(jnp.int32).max


class Carried(NamedTuple):
    """Carried factorization of the previous solve's final working set.

    ``rinv``  (B, p, K, K) — per level, R^{-1} in pivot order (rows and
    columns at or beyond the level's rank are zero);
    ``pos``   (B, n) int32 — final virtual column positions (pos[c] is
    the pivot slot of physical column c; slots are globally numbered in
    factorization order);
    ``ranks`` (B, p) int32 — per-level realized ranks."""

    rinv: jax.Array
    pos: jax.Array
    ranks: jax.Array


def kmax_of(struct: Structure) -> int:
    n = struct.n_var
    return max(1, max((min(d, n) for d in struct.lexlse_dims), default=1))


def default_cert_tol(dtype) -> float:
    """Dtype-aware carried-frame certificate tolerance.

    ``cert_tol`` IS the accepted-carry x-accuracy contract (the trailing
    acceptance check floors at ``8·cert·colnorm``), so the default must
    track the dtype's achievable accuracy: 1e-3 suits f32 (eps·κ ≈ 1e-5
    on the north-star problems), but at f64 the reference meets 1e-12-ish
    tolerances in every configuration (``typedefs.h:118-124``) — an f64
    carry accepted at 1e-3 shows up as ~1e-3 residual error (the round-4
    red suite).  Two Newton–Schulz passes contract 1e-3 drift to ~1e-12,
    so f64 carries still pass at 1e-9 and stay on the fast path."""
    return 1e-3 if jnp.finfo(dtype).bits <= 32 else 1e-9


def bootstrap_carried(factors: Tuple[jax.Array, jax.Array, jax.Array]) -> Carried:
    """Build the carried state from the fused kernel's final-factor
    export (``solve_core_fused(..., return_factors=True)``): invert the
    per-level triangular R blocks by Newton–Schulz doubling (exact in
    ceil(log2 K) matmul rounds, :func:`lexls_tpu.ops.tri.tri_inv_upper`)."""
    rpad, pos, ranks = factors
    K = rpad.shape[-1]
    jm = jnp.arange(K, dtype=jnp.int32)
    live = jm[None, None, :] < ranks[..., None]               # (B, p, K)
    live2 = live[..., :, None] & live[..., None, :]
    eye = jnp.eye(K, dtype=rpad.dtype)
    r_safe = jnp.where(live2, jnp.triu(rpad), eye)
    rinv = tri_inv_upper(r_safe) * live2.astype(rpad.dtype)
    return Carried(rinv=rinv, pos=pos, ranks=ranks)


def carried_from_lexqr(f, struct: Structure) -> Carried:
    """Carried state from a BATCHED :class:`lexls_tpu.lexlse.LexQR`
    (``jax.vmap`` of a factorize function): extract the per-level R
    blocks from the physicalized LOD (column q holds pivot slot q) and
    invert them.  Used by the regularized cold bootstrap, where the
    first exact iteration runs on the XLA tier instead of the kernel."""
    dims = struct.lexlse_dims
    n = struct.n_var
    B = f.lod.shape[0]
    K = kmax_of(struct)
    dtype = f.lod.dtype
    iota_k = jnp.arange(K, dtype=jnp.int32)
    iota_q = jnp.arange(n, dtype=jnp.int32)
    rpads = []
    fr = 0
    for k, dim in enumerate(dims):
        if dim == 0:
            rpads.append(jnp.zeros((B, K, K), dtype))
            continue
        Kl = min(dim, n)
        fc = f.first_col[:, k]
        hot_s = ((iota_q[None, None, :] == fc[:, None, None]
                  + iota_k[None, :, None])
                 & (iota_k[None, :, None] < f.ranks[:, k][:, None, None])
                 ).astype(dtype)                                # (B, K, n)
        rows = f.lod[:, fr:fr + Kl, :n]                          # (B, Kl, n)
        rp = jnp.einsum("bdq,bkq->bdk", rows, hot_s,
                        precision=lax.Precision.HIGHEST)         # (B, Kl, K)
        if Kl < K:
            rp = jnp.concatenate(
                [rp, jnp.zeros((B, K - Kl, K), dtype)], axis=1)
        rpads.append(rp)
        fr += dim
    rpad = jnp.stack(rpads, axis=1)                              # (B, p, K, K)
    pos = jax.vmap(
        lambda pm: jnp.zeros((n,), jnp.int32).at[pm].set(
            jnp.arange(n, dtype=jnp.int32)))(f.perm)
    return bootstrap_carried((rpad, pos, f.ranks))


def _orthonormalize_z(G: jax.Array, live2, passes: int, u=None, s1=None,
                      us=None):
    """Z (upper triangular) with (MZ)ᵀ(MZ) = I given G = MᵀM — Cholesky
    free, with an orthogonality certificate.

    The round-3 CholeskyQR formulation was correct but slow on TPU:
    ``jnp.linalg.cholesky`` of the batched (B, K, K) Grams lowers to a
    serial column loop (~5 ms per pass at B·p = 1536, K = 30 — measured
    80% of the tracker body, ``tools/trk_profile.py``).  This version is
    nothing but elementwise ops, a cumsum, and batched matmuls:

    * **analytic rank-1 pre-step** — between active-set iterations the
      Gram of the changed level is G = I ± uuᵀ + O(drift) with u the
      activated/removed row in the carried frame.  The Cholesky factor
      of I ± uuᵀ and its inverse have closed forms: with
      t_j = 1 ± Σ_{i≤j} u_i² (prefix sums) and t₀ the shifted prefix,
      chol = diag(√(t/t₀)) + tril(u wᵀ, −1), w = ±u/√(t·t₀), and
      Z₁ = cholᵀ⁻¹ = diag(√(t₀/t)) − (±1)·triu(u wᵀ, 1).  A downdate
      that destroys rank drives some t_j ≤ 0, the sqrt produces NaN,
      and the certificate fails — the exact-tier fallback takes over.
    * **first-order triangular passes** — for the remaining E = Gz − I
      (drift-sized), chol(I+E) ≈ I + tril(E,−1) + diag(E)/2, so
      Zᵢ = I − (triu(E,1) + diag(E)/2) contracts ‖E‖ quadratically per
      pass while staying upper triangular.  Two passes take 1e-3 drift
      to ~1e-9; an E too large to contract (an unannounced structural
      change, e.g. a simple-bounds flip) blows the certificate up and
      falls back, exactly like rank loss.

    Z triangular throughout keeps diag(R) = 1/diag(Z_total) the prefix
    pivot norms for the acceptance test.  Returns ``(Z, cert)`` with
    cert = max|ZᵀGZ − I| (B,).

    ``us`` (optional, supersedes ``u``/``s1``): a list of ``(u, s)``
    rank-1 terms applied SEQUENTIALLY — G = I + Σ sᵢuᵢuᵢᵀ + O(drift).
    Each uᵢ is given in the ORIGINAL carried frame; the accumulated Zᵀ
    transforms it into the current frame before its closed-form
    absorption (Z₁ᵀ(I + s₁u₁u₁ᵀ + s₂u₂u₂ᵀ)Z₁ = I + s₂u₂'u₂'ᵀ with
    u₂' = Z₁ᵀu₂).  Zero terms are exact no-ops.  This is how a
    working-set change's effect on LOWER levels is absorbed: the
    changed pivot's Gauss elimination is a rank-1 row update of every
    level below, whose carried-frame Gram perturbation
    s(gvᵀ + vgᵀ) − βvvᵀ splits into three signed rank-1s
    ((g±v)/√2 and √β·v)."""
    K = G.shape[-1]
    eye = jnp.eye(K, dtype=G.dtype)
    Gz = jnp.where(live2 > 0, G, eye)
    if us is None:
        us = [] if u is None else [(u, s1)]
    if us:
        hp = lax.Precision.HIGHEST
        Z = None
        for u_i, s_i in us:
            if Z is not None:
                # express in the current (partially absorbed) frame
                u_i = jnp.einsum("...ij,...i->...j", Z, u_i, precision=hp)
            uu = u_i * u_i
            t = 1.0 + s_i * jnp.cumsum(uu, axis=-1)            # (B, K)
            t0 = jnp.concatenate(
                [jnp.ones_like(t[..., :1]), t[..., :-1]], axis=-1)
            # NaN on t <= 0 (rank loss) — wanted: the cert fails
            dinv = jnp.sqrt(t0 / t)
            w = u_i / jnp.sqrt(jnp.abs(t * t0)
                               + jnp.finfo(G.dtype).tiny) \
                * jnp.sign(t * t0)
            Zi = (eye * dinv[..., None, :]
                  - s_i[..., None] * jnp.triu(
                      u_i[..., :, None] * w[..., None, :], k=1))
            Zi = Zi * live2 + eye * (1.0 - live2)
            Z = Zi if Z is None else (Z @ Zi) * live2 + eye * (1.0 - live2)
        Gz = jnp.swapaxes(Z, -1, -2) @ Gz @ Z
        Gz = jnp.where(live2 > 0, Gz, eye)
    else:
        Z = jnp.broadcast_to(eye, G.shape)
    for _ in range(max(1, passes)):
        E = Gz - eye
        Zi = eye - (jnp.triu(E, k=1) + 0.5 * E * eye)
        Z = (Z @ Zi) * live2
        Gz = jnp.swapaxes(Zi, -1, -2) @ Gz @ Zi
        Gz = jnp.where(live2 > 0, Gz, eye)
    # the certificate is only consumed after the final pass — computing
    # it per pass cost (passes-1) wasted |.|/max reduces per level per
    # trip (the trip is op-issue bound)
    cert = jnp.max(jnp.abs(Gz - eye), axis=(-2, -1))
    return Z, cert


def _pack_tree(tree, fdtype):
    """Flatten a pytree of (B, ...) arrays into ONE (B, F) buffer of
    ``fdtype`` plus the static spec to invert it.  One batched permute
    of the buffer then moves the whole tree (the pyramid's per-leaf
    one-hot matmuls were ~90 ops per level — op-issue bound, measured
    to erase the compaction win).  Integer/bool leaves round-trip
    exactly (all carried ints are far below 2**24; float leaves are
    already ``fdtype``)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    cols, spec = [], []
    for leaf in leaves:
        flat = leaf.reshape(leaf.shape[0], -1)
        spec.append((leaf.shape[1:], leaf.dtype, flat.shape[1]))
        cols.append(flat.astype(fdtype))
    return jnp.concatenate(cols, axis=1), (treedef, tuple(spec))


def _unpack_tree(buf, meta):
    treedef, spec = meta
    leaves, ofs = [], 0
    B = buf.shape[0]
    for shape, dtype, w in spec:
        piece = lax.slice_in_dim(buf, ofs, ofs + w, axis=1)
        ofs += w
        if jnp.issubdtype(dtype, jnp.integer) or dtype == bool:
            piece = jnp.round(piece).astype(dtype)
        else:
            piece = piece.astype(dtype)
        leaves.append(piece.reshape((B,) + shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _lvl_map_of(struct: Structure):
    """Static level-of-row map over the general (post-bounds) rows."""
    offsets, ofs = [], 0
    for d in struct.lexlse_dims:
        offsets.append(ofs)
        ofs += d
    lvl_map_np = np.zeros((max(struct.m - struct.d0, 1),), np.int32)
    for k, (fr, dim) in enumerate(zip(offsets, struct.lexlse_dims)):
        lvl_map_np[fr:fr + dim] = k
    return jnp.asarray(lvl_map_np, jnp.float32)


def _delete_last_pivot(pos, ranks, row_hot_g, struct: Structure):
    """Carried-state bookkeeping for a committed REMOVAL: drop the
    removed row's level's LAST pivot.

    Removing a row from a full-row-rank level drops its rank; keeping
    the stale pivot makes the next trip's closed-form Gram downdate
    singular by construction (t <= 0 -> NaN cert -> kernel fall).
    Carrying rank-1 makes the downdate operate on the reduced pivot
    prefix (generically well-conditioned; the orthogonal corner case
    still falls via the cert).  If the removal did NOT drop the true
    rank (a deficient level), the greedy extension re-adds the best
    pivot next trip.  Deleting the LAST slot keeps ``pos`` consistent
    with a single list-deletion renumber: shift every later position
    down, send the deleted pivot's column to position n-1 (freed by
    the shift).

    ``row_hot_g`` (B, m-d0) float one-hot of the removed general row
    (all-zero rows = no removal, returned unchanged)."""
    p = len(struct.lexlse_dims)
    n = struct.n_var
    lvl_map = _lvl_map_of(struct)
    is_gen = jnp.sum(row_hot_g, axis=1) > 0
    lv = jnp.round(jnp.einsum("bm,m->b", row_hot_g, lvl_map)
                   ).astype(jnp.int32)
    onehot_lv = (jnp.arange(p, dtype=jnp.int32)[None, :]
                 == lv[:, None])                                # (B, p)
    rank_lv = jnp.sum(jnp.where(onehot_lv, ranks, 0), axis=1,
                      dtype=jnp.int32)
    can_del = is_gen & (rank_lv > 0)
    fcs = jnp.cumsum(ranks, axis=1, dtype=jnp.int32) - ranks
    fc_lv = jnp.sum(jnp.where(onehot_lv, fcs, 0), axis=1,
                    dtype=jnp.int32)
    del_slot = fc_lv + rank_lv - 1
    ranks = ranks - (onehot_lv & can_del[:, None]).astype(jnp.int32)
    sel_del = (pos == del_slot[:, None]) & can_del[:, None]
    shift = (pos > del_slot[:, None]) & can_del[:, None]
    pos = jnp.where(sel_del, n - 1, pos - shift.astype(jnp.int32))
    return pos, ranks


def _chol_solve_masked(D, d, act):
    """Batched SPD solve on the active coordinates (identity-extended),
    Cholesky + two triangular solves (mirrors
    ``regularization._masked_chol_solve``)."""
    nn = D.shape[-1]
    eye = jnp.eye(nn, dtype=D.dtype)
    act2 = act[..., :, None] & act[..., None, :]
    Dm = jnp.where(act2, D, eye)
    dm = jnp.where(act, d, 0.0)
    L = jnp.linalg.cholesky(Dm)
    z = lax.linalg.triangular_solve(L, dm[..., None], left_side=True,
                                    lower=True)
    y = lax.linalg.triangular_solve(L, z, left_side=True, lower=True,
                                    transpose_a=True)[..., 0]
    return y * act


def _cgls_tikhonov_batched(A1, Sm, s_vec, c_k, factor, act, iters,
                           tol=1e-12):
    """Batched CGLS on the stacked damped system
    ``min ||A1 y − c||² + f²||Sm y − s||² + f²||y||²`` over the active
    coordinates (``regularization._tikhonov_cg`` ≙ ``lexlse.h:2256-2279``,
    hand-batched over the leading axis).

    Krylov-frame invariance: the iterates touch the data only through
    ``A_augᵀA_aug`` products and scalar norms, all invariant under an
    orthonormal change of the row frame — so CG in the tracker's
    NS-orthonormalized frame produces the same y* sequence (up to
    roundoff) as the reference staircase frame, and the tracked tier's
    TIKHONOV_CG rhs matches the XLA tier's.
    """
    hp = lax.Precision.HIGHEST
    dtype = A1.dtype
    tol = jnp.asarray(tol, dtype)

    def matvec(y):
        return (jnp.einsum("bkn,bn->bk", A1, y, precision=hp),
                factor * jnp.einsum("brn,bn->br", Sm, y, precision=hp),
                factor * y)

    def rmatvec(r1, r2, r3):
        return (jnp.einsum("bkn,bk->bn", A1, r1, precision=hp)
                + factor * jnp.einsum("brn,br->bn", Sm, r2, precision=hp)
                + factor * r3) * act

    def sq(*parts):
        return sum(jnp.sum(q * q, axis=1) for q in parts)       # (B,)

    x = jnp.zeros_like(act)
    r1, r2, r3 = c_k, factor * s_vec, jnp.zeros_like(act)
    s = rmatvec(r1, r2, r3)
    p = s
    gamma = sq(s)

    def body(i, carry):
        x, r1, r2, r3, p, gamma = carry
        live = jnp.sqrt(gamma) > tol
        q1, q2, q3 = matvec(p)
        qq = sq(q1, q2, q3)
        alpha = jnp.where((qq > 0) & live, gamma / qq, 0.0)     # (B,)
        x = x + alpha[:, None] * p
        r1 = r1 - alpha[:, None] * q1
        r2 = r2 - alpha[:, None] * q2
        r3 = r3 - alpha[:, None] * q3
        s = rmatvec(r1, r2, r3)
        gamma_new = sq(s)
        beta = jnp.where(gamma > 0, gamma_new / gamma, 0.0)
        p = jnp.where(live[:, None], s + beta[:, None] * p, p)
        gamma = jnp.where(live, gamma_new, gamma)
        return (x, r1, r2, r3, p, gamma)

    x, *_ = lax.fori_loop(0, iters, body, (x, r1, r2, r3, p, gamma))
    return x * act


def _factorize_carried(Ag, bg, rinv, pos, ranks, struct: Structure,
                       params: ParametersLexLSI, *, ns_iters: int,
                       cert_tol: float, ext_steps: int,
                       reg_factors=None, chg=None):
    """Re-factorize the masked staircase with the carried pivot order,
    absorbing rank GROWTH by greedy pivot extension.

    All operations are batched matmuls / reductions — the MXU
    replacement for the serial pivoted panel (``lexlse.h:182-268``).

    Per level: re-orthonormalize the carried pivot block (M = B̃_P
    R⁻¹_old, Newton–Schulz inverse square root), then run up to
    ``ext_steps`` greedy extension steps — exactly the reference's pivot
    rule (max trailing column norm ≥ tol, smallest position on ties,
    ``lexlse.h:205-217``) — appending the new pivot analytically to Q /
    R⁻¹ / W.  Acceptance (per instance) requires: the NS convergence
    certificate, the pivot set's independence bound
    ``||R⁻¹||_F² ≤ 1/tol`` (certifies λmin(Gram) ≥ tol / K — slightly
    conservative: borderline instances fall back to the exact kernel),
    and no trailing column norm ≥ tol remaining after extension.

    Returns ``(ok, stash, fcs, pos, ranks, rinv_out)`` — stash holds per
    level ``(hot, Q, W, rinv_new, Lp)``; pos/ranks/rinv_out reflect the
    extensions.

    ``chg`` (optional) = ``(a_row, row_hot, lv, sgn, c_rm, w_rm)``: the
    single constraint row whose activation state changed since the
    carried factorization — its (fixed-eliminated) coefficients (B, n),
    its one-hot over the general rows (B, mg), its level (B, 1) int32
    (−1 none), the Gram sign (B, 1) float (+1 activated, −1 removed),
    and — for removals — the change's Gauss elimination column over the
    general rows (B, mg) and its W row (B, n+1), saved by the
    committing trip.

    The changed level's re-orthonormalization absorbs the rank-1 Gram
    spike analytically (:func:`_orthonormalize_z`).  Levels BELOW the
    change see the Gauss elimination change by EXACTLY rank one: with 5
    old pivots and a 6th appearing, the per-column elimination
    coefficients y_c (square exact solves) change along the kernel
    direction k̂ of the OLD rows' 5×6 system, and k̂ = R⁻¹·z with
    z = Q[r, :] the changed ROW's Q-frame coordinates — so
    Δ(elimination) = (Lp·z)(W[slot, :])ᵀ / z_slot, all available from
    the factorization that held the pivot (in-trip for an activation's
    extension pivot; saved at the committing trip for a removal).  The
    resulting carried-frame Gram perturbation of each lower level,
    s(gvᵀ + vgᵀ) − βvvᵀ (g = Mᵀc, v = (w·hotᵀ)·rinv, β = cᵀc, s = −1
    activation / +1 removal), is absorbed as three sequential
    closed-form rank-1s with geometric-mean balancing.  Without the
    below-level absorption EVERY working-set change fell back to the
    exact kernel (round-4 TPU diagnosis, tools/trk_stats.py: per-level
    cert bits strictly below the changed level)."""
    dims = struct.lexlse_dims
    p = len(dims)
    n = struct.n_var
    B = Ag.shape[0]
    dtype = Ag.dtype
    K = rinv.shape[-1]
    tol_ld = params.tol_linear_dependence
    big = jnp.iinfo(jnp.int32).max

    # `rest` carries only the not-yet-processed rows: rows above the
    # current level are never re-read, so re-concatenating the full
    # (B, mg, n+1) block per level would be pure HBM traffic
    rest = jnp.concatenate([Ag, bg[:, :, None]], axis=2)      # (B, mg, n+1)
    iota_k = jnp.arange(K, dtype=jnp.int32)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    ok = jnp.ones((B,), bool)
    # diagnosis bitmask (returned for tools/trk_stats.py): which
    # acceptance rule rejected, per level — bits (3k, 3k+1, 3k+2) =
    # level k's cert / pivot-norm / trailing-column
    why = jnp.zeros((B,), jnp.int32)

    offsets = []
    ofs = 0
    for d in dims:
        offsets.append(ofs)
        ofs += d

    stash = []
    rinv_out = []
    fcs_list = []
    fc_k = jnp.zeros((B,), jnp.int32)
    ranks_out = []
    hp = lax.Precision.HIGHEST
    eye = jnp.eye(K, dtype=dtype)
    if chg is not None:
        # the changed pivot's elimination column (global general-row
        # frame) and W row: seeded from the removal carry; overwritten
        # in-trip at the activation's level by the extension pivot
        c_glob, w_cur = chg[4], chg[5]
    # accumulated nullspace basis for the regularizers (physical frame on
    # BOTH axes: rows = eliminated variables, columns = variables; the
    # identity block of Z_k is implicit — ``lexlse.h:2592-2625``)
    nsb = jnp.zeros((B, n, n + 1), dtype) if reg_factors is not None else None
    for k, (fr, dim) in enumerate(zip(offsets, dims)):
        fcs_list.append(fc_k)
        if dim == 0:
            stash.append(None)
            rinv_out.append(jnp.zeros((B, K, K), dtype))
            ranks_out.append(jnp.zeros((B,), jnp.int32))
            continue
        rank_k = ranks[:, k]                                   # (B,)
        live = iota_k[None, :] < rank_k[:, None]               # (B, K)
        live2 = live[:, :, None] & live[:, None, :]
        # one-hot slot -> column map of this level's carried pivots
        hot = ((pos[:, None, :] == fc_k[:, None, None] + iota_k[None, :, None])
               & live[:, :, None]).astype(dtype)               # (B, K, n)

        lvl = rest[:, :dim, :]                                 # (B, dim, n+1)
        rest = rest[:, dim:, :]
        P0 = jnp.einsum("bdn,bkn->bdk", lvl[:, :, :n], hot, precision=hp)
        rinv_k = rinv[:, k]
        M = jnp.matmul(P0, rinv_k, precision=hp)               # (B, dim, K)
        G = jnp.einsum("bdi,bdj->bij", M, M, precision=hp)
        Gt = jnp.where(live2, G, eye)
        if chg is not None:
            a_row, row_hot, lv, sgn = chg[:4]
            is_lvl = (lv == k).astype(dtype)                   # (B, 1)
            aP = jnp.einsum("bn,bkn->bk", a_row, hot, precision=hp)
            # mask by the carried live slots: after a pivot deletion the
            # stale rinv column inside the old live range would leak a
            # spurious u entry at the dead slot
            livef = live.astype(dtype)
            u_k = (jnp.einsum("bk,bkj->bj", aP, rinv_k, precision=hp)
                   * is_lvl * livef)                           # (B, K)
            s1_k = sgn * is_lvl
            # --- below-level absorption: the changed pivot's Gauss
            # elimination is a rank-1 row update of this level when the
            # change happened ABOVE it (c_glob is zero otherwise —
            # self-gating: an activation's column covers only rows
            # below its level, a removal's carried column likewise).
            # Level 0 has nothing above it: its group is structurally
            # zero, skip it statically.
            us = [(u_k, s1_k)]
            if k > 0:
                c_k = lax.slice_in_dim(c_glob, fr, fr + dim, axis=1)
                w_hot = jnp.einsum("bc,bkc->bk", w_cur[:, :n], hot,
                                   precision=hp)
                v_b = jnp.einsum("bk,bkj->bj", w_hot, rinv_k,
                                 precision=hp) * livef         # (B, K)
                g_b = jnp.einsum("bdk,bd->bk", M, c_k,
                                 precision=hp) * livef         # (B, K)
                beta = jnp.sum(c_k * c_k, axis=1, keepdims=True)
                # geometric-mean balancing keeps the intermediate rank-1
                # factors at the true perturbation scale sqrt(|g||v|) so
                # a large-|g|, small-|v| update cannot spuriously NaN
                # the sequential downdate
                tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
                ng = jnp.linalg.norm(g_b, axis=1, keepdims=True)
                nv = jnp.linalg.norm(v_b, axis=1, keepdims=True)
                alpha = jnp.sqrt((nv + tiny) / (ng + tiny))
                sb = -sgn             # −1 activation, +1 removal
                r2 = jnp.asarray(np.sqrt(0.5), dtype)
                one = jnp.ones_like(sb)
                us += [((alpha * g_b + sb * v_b / alpha) * r2, one),
                       ((alpha * g_b - sb * v_b / alpha) * r2, -one),
                       (jnp.sqrt(beta) * v_b, -one)]
        else:
            us = None
        Z, cert = _orthonormalize_z(Gt, live2.astype(dtype), ns_iters,
                                    us=us)
        cert_ok = cert < cert_tol
        ok = ok & cert_ok
        why = why | jnp.where(cert_ok, 0, 1 << (3 * k))
        # certified λ-noise floor of this level's carried frame: the
        # own-level residual Q c − b̃ carries ~cert·‖b̃‖ of frame error
        # (cert bottoms out at eps·κ(G) — the evaluation error of ZᵀGZ
        # itself) plus plain roundoff.  λ entries below it are noise on
        # structurally-zero residuals (e.g. a full-rank level) and would
        # otherwise falsely mark rows CORRECT_SIGN in the removal sweep
        # (tol_correct_sign_lambda is calibrated to the exact tiers'
        # noise, ``typedefs.h:118-124``).
        eps_d = jnp.asarray(jnp.finfo(dtype).eps, dtype)
        bmax = jnp.max(jnp.abs(lvl[:, :, n]), axis=1)          # (B,)
        lam_floor = (8.0 * cert + 64.0 * eps_d) * bmax         # (B,)
        # ONE matmul for [Q; rinv_new] = [M; rinv_k] @ Z — row-wise
        # identical products, and the trip is op-issue bound (~40 us
        # per batched matmul at B=384 regardless of size here)
        MR = jnp.matmul(jnp.concatenate([M, rinv_k], axis=1), Z,
                        precision=hp)                          # (B, dim+K, K)
        Q = MR[:, :dim]                                        # (B, dim, K)
        rinv_new = MR[:, dim:]
        W = jnp.einsum("bdk,bdc->bkc", Q, lvl, precision=hp)   # (B, K, n+1)

        # greedy extension: absorb rank growth (a newly activated
        # independent row) with the reference's own pivot rule
        rank_pre = rank_k
        colnorm0 = jnp.sum(lvl[:, :, :n] * lvl[:, :, :n], axis=1)
        # the downdated-norm cancellation noise floor (see acceptance
        # check (b) below) also gates the extension trigger
        ceps = 64.0 * jnp.finfo(dtype).eps
        tol_eff = jnp.maximum(tol_ld, ceps * colnorm0)          # (B, n)
        for _ in range(ext_steps):
            cn = colnorm0 - jnp.sum(W[:, :, :n] * W[:, :, :n], axis=1)
            end_k = fc_k + rank_k
            beyond = pos >= end_k[:, None]
            cn_b = jnp.where(beyond & (cn >= tol_eff), cn, -1.0)
            mx = jnp.max(cn_b, axis=1)
            grow = (mx > 0.0) & (rank_k < min(dim, K))
            # smallest position among the max-norm candidates
            cand = beyond & (cn_b == mx[:, None])
            qmin = jnp.min(jnp.where(cand, pos, big), axis=1)
            sel = cand & (pos == qmin[:, None])                # (B, n) one-hot
            self_f = sel.astype(dtype)
            a_c = jnp.einsum("bdn,bn->bd", lvl[:, :, :n], self_f,
                             precision=hp)                     # (B, dim)
            w_c = jnp.einsum("bkn,bn->bk", W[:, :, :n], self_f,
                             precision=hp)                     # (B, K)
            resid = a_c - jnp.einsum("bdk,bk->bd", Q, w_c, precision=hp)
            rho2 = jnp.sum(resid * resid, axis=1)
            grow = grow & (rho2 >= tol_ld)
            rho = jnp.sqrt(jnp.maximum(rho2, 1e-30))
            q_new = resid / rho[:, None]
            slot = iota_k[None, :] == rank_k[:, None]          # (B, K)
            growf = grow.astype(dtype)[:, None]
            # Q gains column q_new at slot `rank_k`
            Q = Q + (growf[:, :, None] * q_new[:, :, None]
                     * slot[:, None, :].astype(dtype))
            # R gains column [w_c; rho]: Rinv column = [-Rinv w_c/rho; 1/rho]
            rcol = -jnp.einsum("bij,bj->bi", rinv_new, w_c,
                               precision=hp) / rho[:, None]
            rcol = rcol + slot.astype(dtype) / rho[:, None]
            rinv_new = rinv_new + (growf[:, :, None] * rcol[:, :, None]
                                   * slot[:, None, :].astype(dtype))
            # W gains row q_new^T lvl at slot `rank_k`
            w_new = jnp.einsum("bd,bdc->bc", q_new, lvl, precision=hp)
            W = W + (growf[:, :, None] * slot[:, :, None]
                     * w_new[:, None, :])
            # positions: insert `sel` at slot end_k (list-insertion
            # renumbering; sel's old position is vacated)
            shift = (pos >= end_k[:, None]) & (pos < qmin[:, None]) & grow[:, None]
            pos = jnp.where(sel & grow[:, None], end_k[:, None],
                            pos + shift.astype(jnp.int32))
            hot = hot + (growf[:, :, None] * slot[:, :, None]
                         * self_f[:, None, :])
            rank_k = rank_k + grow.astype(jnp.int32)

        # ---- Newton inverse-refinement of rinv against the freshly
        # measured R.  ``rinv_new = rinv_old Z`` compounds evaluation
        # error MULTIPLICATIVELY across committed trips (the cold solve
        # commits ~194: its exported carry failed the next warm solve's
        # cert for the whole batch, tools/trk_stats.py).  W is
        # re-projected from the data every trip, so R = W·hotT is fresh;
        # one Newton step X' = X(2I − RX) squares the carried error —
        # the per-solve error becomes stationary at the evaluation
        # floor (~eps·κ) instead of linear in total committed trips.
        R_meas = jnp.einsum("bic,bjc->bij", W[:, :, :n], hot,
                            precision=hp)
        live_now2 = ((iota_k[None, :] < rank_k[:, None])[:, :, None]
                     & (iota_k[None, :] < rank_k[:, None])[:, None, :])
        R_tri = jnp.where(live_now2, jnp.triu(R_meas), eye)
        rinv_stab = jnp.where(live_now2, rinv_new, eye)
        rinv_new = jnp.matmul(
            rinv_stab, 2.0 * eye - jnp.matmul(R_tri, rinv_stab,
                                              precision=hp),
            precision=hp) * live_now2.astype(dtype)

        # acceptance: the greedy panel's own rules, evaluated on the
        # carried factorization.
        # (a) Every pivot's prefix-downdated norm stays above the
        #     dependence tolerance (with 4x slack so pivots that greedy
        #     accepted at exactly tol do not flap under drift): with the
        #     CholeskyQR orthonormalization Rinv is upper-TRIANGULAR
        #     throughout (bootstrap is triangular, Z and the extension
        #     append are triangular), so diag(R) = 1/diag(Rinv) IS the
        #     prefix norm (``lexlse.h:214-217``'s quantity).
        rdiag_inv = jnp.diagonal(rinv_new, axis1=1, axis2=2)    # (B, K)
        live_now = iota_k[None, :] < rank_k[:, None]
        piv_norm2 = jnp.where(live_now,
                              1.0 / jnp.maximum(rdiag_inv * rdiag_inv,
                                                1e-30),
                              jnp.inf)
        piv_ok = jnp.min(piv_norm2, axis=1) >= 0.25 * tol_ld
        ok = ok & piv_ok
        why = why | jnp.where(piv_ok, 0, 2 << (3 * k))
        # (b) No trailing column above the tolerance remains (no missed
        #     rank) — floored at the dtype's cancellation noise: the
        #     norm downdate colnorm - sum(W^2) carries ~eps*colnorm of
        #     noise (the greedy panel's own downdated norms share this
        #     floor at float32; ``lexlse.h:260-266``).
        #     This check doubles as a FRAME-QUALITY filter: a skewed
        #     carried frame (cert marginally under cert_tol) leaks
        #     ~cert·colnorm into every trailing residual, and rejecting
        #     on it is what guarantees accepted-carry x accuracy (the
        #     trajectory test's 1e-8 contract at f64).  Do NOT guard it
        #     by rank fullness — only by the dtype's cancellation floor
        #     (64 eps: measured healthy-carry noise peaks ~40 eps·colnorm
        #     at f32, trip ~23 of the stationary test).
        #     The check floor must include the FRAME's certified error:
        #     cn carries ~cert·colnorm of noise (Q orthonormal only to
        #     cert), so comparing against a tol_ld below that noise
        #     rejects every healthy carry (at the reference's f64
        #     default tol_ld=1e-12, trip-1 drift-only carries measured
        #     cn noise ~1e-10 and fell 100%).  The EXTENSION trigger
        #     above keeps the un-floored greedy threshold: a rank the
        #     frame can resolve is still added exactly where greedy
        #     would add it; one the frame cannot resolve is below the
        #     certification floor for acceptance too.
        cn = colnorm0 - jnp.sum(W[:, :, :n] * W[:, :, :n], axis=1)
        beyond = pos >= (fc_k + rank_k)[:, None]
        tol_chk = jnp.maximum(tol_eff, 8.0 * cert[:, None] * colnorm0)
        trail_ok = jnp.logical_not(
            jnp.any(beyond & (cn >= tol_chk), axis=1))
        ok = ok & trail_ok
        why = why | jnp.where(trail_ok, 0, 4 << (3 * k))

        # the multiplier identity needs the UNregularized R-frame rhs and
        # the deflated level rhs (factorization residual = Q c - b)
        c_orig = W[:, :, n]
        b_lvl = lvl[:, :, n]

        # ---- per-level Tikhonov damping (``regularize_tikhonov_1``,
        # ``lexlse.h:1700-1763``): replace the R-frame rhs head by
        # [R, T] y* with y* the damped least-squares solution over the
        # remaining variables, coupled through the accumulated nullspace.
        # The damped problem is basis-invariant (A1' A1 and the
        # projector are the same for any orthonormal Q of the pivot
        # block), so the non-triangular NS-orthogonalized frame computes
        # the same y* as the reference's staircase.
        if reg_factors is not None:
            factor = reg_factors[k]
            mu = factor * factor
            act = (pos >= fc_k[:, None]).astype(dtype)          # (B, n)
            elim = (pos < fc_k[:, None]).astype(dtype)
            A1 = W[:, :, :n] * act[:, None, :]
            Sm = nsb[:, :, :n] * elim[:, :, None] * act[:, None, :]
            s_vec = nsb[:, :, n] * elim
            if params.regularization_type == RegularizationType.TIKHONOV_CG:
                # fixed-trip CGLS instead of the direct Cholesky — the
                # reference's cg_tikhonov (``lexlse.h:2367-2430``); the
                # truncated-CG y* differs from the direct solve, so
                # matching the XLA tier requires running the same
                # iteration (frame-invariant, see _cgls_tikhonov_batched)
                rows_live_f = (iota_k[None, :]
                               < rank_k[:, None]).astype(dtype)
                y_reg = _cgls_tikhonov_batched(
                    A1, Sm, s_vec, c_orig * rows_live_f, factor, act,
                    params.max_number_of_CG_iterations)
            else:
                D = (jnp.einsum("bki,bkj->bij", A1, A1, precision=hp)
                     + mu * jnp.einsum("bri,brj->bij", Sm, Sm, precision=hp)
                     + mu * jnp.eye(n, dtype=dtype))
                d_vec = (jnp.einsum("bkn,bk->bn", A1, c_orig, precision=hp)
                         + mu * jnp.einsum("brn,br->bn", Sm, s_vec,
                                           precision=hp))
                y_reg = _chol_solve_masked(D, d_vec, act > 0)
            c_new = jnp.einsum("bkn,bn->bk", A1, y_reg, precision=hp)
            do_reg = (factor != 0.0) & (rank_k > 0)
            rows_live = iota_k[None, :] < rank_k[:, None]
            c_reg = jnp.where(do_reg[:, None] & rows_live, c_new, c_orig)
            W = jnp.concatenate([W[:, :, :n], c_reg[:, :, None]], axis=2)

            # nullspace accumulation with the REGULARIZED rhs
            # (``lexlse.h:2592-2625``), physical frame: new rows at the
            # pivot columns hold [S_prev_R + I] R^{-1}; trailing columns
            # and the rhs get the Gauss-style update
            end_col = (fc_k + rank_k)[:, None]
            SR = jnp.einsum("brn,bkn->brk", nsb[:, :, :n] * elim[:, :, None],
                            hot, precision=hp)
            hot_t = jnp.swapaxes(hot, 1, 2)                     # (B, n, K)
            left = jnp.matmul(SR + hot_t, rinv_new, precision=hp)
            trail_p1 = jnp.concatenate(
                [(pos >= end_col).astype(dtype),
                 jnp.ones((B, 1), dtype)], axis=1)              # (B, n+1)
            Up = W * rows_live[:, :, None].astype(dtype) * trail_p1[:, None, :]
            ns_upd = nsb - jnp.matmul(left, Up, precision=hp) * trail_p1[:, None, :]
            left_scat = jnp.einsum("brk,bkn->brn", left, hot, precision=hp)
            pivcol = ((pos >= fc_k[:, None]) & (pos < end_col)).astype(dtype)
            ns_upd = jnp.concatenate(
                [jnp.where(pivcol[:, None, :] > 0, left_scat,
                           ns_upd[:, :, :n]), ns_upd[:, :, n:]], axis=2)
            nsb = jnp.where((rank_k > 0)[:, None, None], ns_upd, nsb)

        # Gauss elimination of all lower-priority rows
        # (``lexlse.h:431-471``): L = B_P R^{-1}; applying the full
        # R-frame rows W cancels the pivot columns exactly
        below_p = jnp.einsum("bmn,bkn->bmk", rest[:, :, :n], hot,
                             precision=hp)
        Lp = jnp.matmul(below_p, rinv_new, precision=hp)
        if rest.shape[1]:
            rest = rest - jnp.matmul(Lp, W, precision=hp)

        if chg is not None and rest.shape[1]:
            # an activation whose extension added a pivot HERE: save the
            # exact rank-1 elimination change for the levels below.
            # z = Q[r, :] (the activated row's Q-frame coordinates);
            # Δ(elimination) = (Lp·z)(W[slot, :])ᵀ / z_slot — see the
            # docstring's kernel-direction derivation.  Using only the
            # new pivot's own Lp column (z ≈ ρ·e_slot) is wrong whenever
            # the new row correlates with the old pivots (measured 0.086
            # identity residual on an exact synthetic).
            act_here = ((lv[:, 0] == k) & (sgn[:, 0] > 0)
                        & (rank_k > rank_pre))
            maskf = act_here.astype(dtype)[:, None]
            sel_new = (iota_k[None, :] == rank_pre[:, None]).astype(dtype)
            row1h = lax.slice_in_dim(row_hot, fr, fr + dim, axis=1)
            z_row = jnp.einsum("bd,bdk->bk", row1h.astype(dtype), Q,
                               precision=hp)                    # (B, K)
            zs = jnp.sum(z_row * sel_new, axis=1, keepdims=True)
            inv_zs = jnp.where(jnp.abs(zs) > 1e-12, 1.0 / zs, 0.0)
            c_col = jnp.einsum("bmk,bk->bm", Lp, z_row,
                               precision=hp) * inv_zs
            w_row = jnp.einsum("bkc,bk->bc", W, sel_new, precision=hp)
            tail_c = lax.slice_in_dim(c_glob, fr + dim, c_glob.shape[1],
                                      axis=1)
            c_glob = jnp.concatenate(
                [lax.slice_in_dim(c_glob, 0, fr + dim, axis=1),
                 jnp.where(maskf > 0, c_col, tail_c)], axis=1)
            w_cur = jnp.where(maskf > 0, w_row, w_cur)

        stash.append((hot, Q, W, rinv_new, Lp, c_orig, b_lvl, lam_floor))
        rinv_out.append(rinv_new)
        ranks_out.append(rank_k)
        fc_k = fc_k + rank_k

    fcs = jnp.stack(fcs_list, axis=1)                          # (B, p)
    ranks_new = jnp.stack(ranks_out, axis=1)
    rinv_new_all = jnp.stack(rinv_out, axis=1)
    del iota_n
    return ok, stash, fcs, pos, ranks_new, rinv_new_all, why


def _hot_solve(stash, fcs, pos, fixed_mask, fixed_val, struct: Structure):
    """Basic solve through the carried staircase (bottom level up,
    ``lexlse.h:1015-1045``); free variables are zero."""
    p = len(struct.lexlse_dims)
    n = struct.n_var
    hp = lax.Precision.HIGHEST
    B = pos.shape[0]
    dtype = fixed_val.dtype
    x_var = jnp.zeros((B, n), dtype)
    for k in range(p - 1, -1, -1):
        if stash[k] is None:
            continue
        hot, _, W, rinv_new = stash[k][:4]
        trail = (pos >= fcs[:, k][:, None]).astype(dtype)      # (B, n)
        rhs = W[:, :, n] - jnp.einsum(
            "bkn,bn->bk", W[:, :, :n] * trail[:, None, :], x_var,
            precision=hp)
        y = jnp.einsum("bij,bj->bi", rinv_new, rhs, precision=hp)
        x_var = x_var + jnp.einsum("bk,bkn->bn", y, hot, precision=hp)
    return jnp.where(fixed_mask, fixed_val, x_var)


def _hot_lambda(stash, struct: Structure, dims_offsets, B, dtype):
    """All objectives' multipliers from the carried factorization.

    Factorization-residual identity: for objective k the multiplier of
    level k's own constraints is Q c − b̃ on the level's rows — the
    residual the reference reconstructs by Householder replay of the
    beyond-rank rhs tail (``ObjectiveSensitivity``, ``lexlse.h:611-762``;
    regularization only rewrites the sub-rank head of the R-frame rhs,
    ``lexlse.h:316-410``, so the UNregularized c feeds this identity).
    Higher-objective multipliers back-propagate through Q_k = B̃_P R^{-1}
    and the Gauss L-factors, mirroring the fused kernel's transposed
    sweep."""
    p = len(struct.lexlse_dims)
    d0 = struct.d0
    mg = struct.m - d0
    hp = lax.Precision.HIGHEST
    K = stash[next(i for i in range(p) if stash[i] is not None)][1].shape[-1] \
        if any(s is not None for s in stash) else 1

    zc = [jnp.zeros((B, p, K), dtype) for _ in range(p)]
    lam_parts = [None] * p
    jvec = jnp.arange(p, dtype=jnp.int32)[None, :, None]
    for k in range(p - 1, -1, -1):
        fr, dim = dims_offsets[k], struct.lexlse_dims[k]
        if stash[k] is None:
            lam_parts[k] = jnp.zeros((B, p, dim), dtype)
            continue
        hot, Q, W, rinv_new, Lp, c_orig, b_lvl, lam_floor = stash[k]
        seg_gt = jnp.einsum("bpk,bdk->bpd", zc[k], Q, precision=hp)
        seg_kk = jnp.einsum("bdk,bk->bd", Q, c_orig, precision=hp) - b_lvl
        # certified noise floor of the carried frame (see
        # ``_factorize_carried``): entries below it are residual noise of
        # an (numerically) exactly-solved level, structurally zero in the
        # exact tiers' Householder replay — keeping them would falsely
        # mark rows CORRECT_SIGN against tol_correct_sign_lambda
        seg_kk = jnp.where(jnp.abs(seg_kk) <= lam_floor[:, None],
                           0.0, seg_kk)
        seg = jnp.where(jvec == k, seg_kk[:, None, :], seg_gt)
        seg = jnp.where(jvec >= k, seg, 0.0)
        lam_parts[k] = seg
        for j in range(k):
            if stash[j] is None:
                continue
            off = fr - (dims_offsets[j] + struct.lexlse_dims[j])
            sl = stash[j][4][:, off: off + dim, :]
            zc[j] = zc[j] - jnp.einsum("bpd,bdk->bpk", seg, sl, precision=hp)
    return jnp.concatenate(lam_parts, axis=2)                  # (B, p, mg)


def _select_removal(lam_all, ct, st, Agm, fixed_mask, struct: Structure,
                    params: ParametersLexLSI):
    """Batched removal selection (``findActiveCtr2Remove``,
    ``lexlsi.h:1048-1139``) — the reference's predicated objective sweep
    VECTORIZED over objectives (one batched pass instead of p serial
    ones; the trip is op-issue bound, ``docs/performance.md``).

    The sweep's only cross-objective coupling is the CORRECT_SIGN
    marking: a row marked at objective i is excluded from consideration
    at objectives > i.  Marking is idempotent and — before the first
    wrong-sign hit, the only region that affects the selection — is
    independent of prior marks, so the serially-updated `sense` reduces
    to an exclusive OR-scan of the per-objective mark sets:
    ``marked_before_j = OR_{i<j} (eligible_i & active & a_i > tol_c)``.
    The selected objective is the first with any wrong-sign row; the
    row choice within it (insertion stamp / most-negative-with-priority)
    is unchanged."""
    p = len(struct.lexlse_dims)
    d0 = struct.d0
    m = struct.m
    dtype = lam_all.dtype
    iota_m = jnp.arange(m, dtype=jnp.int32)[None, :]
    tol_correct = params.tol_correct_sign_lambda
    tol_wrong = params.tol_wrong_sign_lambda
    hp = lax.Precision.HIGHEST

    if d0:
        vm = jnp.zeros((d0, struct.n_var), dtype).at[
            jnp.arange(d0), jnp.asarray(struct.var_idx_np)].set(1.0)
        lam_fixed = -jnp.einsum("bmn,bpm->bpn", Agm, lam_all, precision=hp)
        lam_fixed = lam_fixed * fixed_mask[:, None, :].astype(dtype)
        vals0 = jnp.einsum("dn,bpn->bpd", vm, lam_fixed, precision=hp)
        vals = jnp.concatenate([vals0, lam_all], axis=2)       # (B, p, m)
    else:
        vals = lam_all
    elig = jnp.asarray(np.stack(
        [np.asarray(struct.sweep_eligible(j)) for j in range(p)]))[None]
    active0 = ((ct == int(CtrType.ACTIVE_LB))
               | (ct == int(CtrType.ACTIVE_UB)))[:, None, :]
    a = jnp.where((ct == int(CtrType.ACTIVE_LB))[:, None, :], -vals, vals)
    mark = elig & active0 & (a > tol_correct)
    marked_before = (jnp.cumsum(mark, axis=1, dtype=jnp.int32)
                     - mark.astype(jnp.int32)) > 0
    wrong = (elig & active0 & jnp.logical_not(marked_before)
             & (a < -tol_wrong))                               # (B, p, m)
    found_j = jnp.any(wrong, axis=2)                           # (B, p)
    found = jnp.any(found_j, axis=1)
    hot_j = (jnp.arange(p, dtype=jnp.int32)[None, :]
             == jnp.argmax(found_j, axis=1)[:, None])[:, :, None]
    wrong_s = jnp.any(wrong & hot_j, axis=1)                   # (B, m)
    if params.deactivate_first_wrong_sign:
        key = jnp.where(wrong_s, st, _INT_MAX)
        kmin = jnp.min(key, axis=1, keepdims=True)
        first = wrong_s & (st == kmin)
    else:
        a_s = jnp.sum(jnp.where(wrong & hot_j, a, 0.0), axis=1)
        amask = jnp.where(wrong_s, a_s, jnp.asarray(jnp.inf, dtype))
        amin = jnp.min(amask, axis=1, keepdims=True)
        tie = wrong_s & (a_s == amin)
        prio_all = jnp.asarray(np.stack(
            [np.asarray(struct.sweep_priority(j), np.int32)
             for j in range(p)]))[None]                        # (1, p, m)
        prio_s = jnp.sum(jnp.where(hot_j, prio_all, 0), axis=1,
                         dtype=jnp.int32)
        pmin = jnp.min(jnp.where(tie, prio_s, _INT_MAX), axis=1,
                       keepdims=True)
        first = tie & (prio_s == pmin)
    row = jnp.min(jnp.where(first, iota_m, _INT_MAX), axis=1
                  ).astype(jnp.int32)
    sel_row = jnp.where(found, row, -1)
    return found, sel_row



@functools.partial(
    jax.jit,
    static_argnames=("struct", "params", "tile", "interpret",
                     "vmem_limit_mb", "compact", "tile_b", "panel_unroll",
                     "compact_rounds", "ns_iters", "cert_tol", "ext_steps",
                     "loop_cap", "shrink", "handover_slab", "trip1_noext",
                     "debug_fall"),
)
def solve_core_tracked(
    A, lb, ub, ctr_type0, stamp0, next_stamp0, x0, v0,
    carried: Carried,
    struct: Structure, params: ParametersLexLSI,
    tile: int = 64, interpret: bool = False, vmem_limit_mb: int = 0,
    compact: int = 0, tile_b: int = 0, panel_unroll: int = 1,
    compact_rounds: int = 1,
    ns_iters: int = 2, cert_tol: float = None, ext_steps: int = 1,
    reg=None, loop_cap: int = 0, shrink: tuple = (),
    handover_slab: int = 0, trip1_noext: bool = False,
    debug_fall: bool = False,
):
    """Batched warm solve with the WHOLE active-set loop on the MXU.

    Every iteration re-factorizes through the carried pivot order
    (:func:`_factorize_carried` — batched matmuls, greedy extension for
    rank growth) and applies one reference active-set step; an instance
    leaves the loop when it terminates, exhausts the budget, or fails
    verification (rank loss / ill-conditioned carry), in which case it
    falls back into the fused Pallas kernel CONTINUING from its current
    state (per-instance ``it0`` handover).  Same configuration envelope
    as :func:`lexls_tpu.lexlsi.solve_core_fused` (no regularization /
    cycling / log / trace).

    ``carried`` comes from :func:`bootstrap_carried` of a previous
    solve's exported factors, or from this function's own second return
    value.  Returns ``(state, carried')``.

    Regularization: plain TIKHONOV is supported (pass the per-level
    ``reg`` factors with ``params.regularization_type == TIKHONOV``) —
    the damped per-level solve runs as a batched masked Cholesky inside
    the tracker loop, and fallback instances continue on the exact XLA
    tier (the fused kernel has no regularization).

    ``loop_cap`` > 0 bounds the full-batch tracker loop to that many
    trips; still-alive instances then finish in the fused kernel (whose
    per-TILE early exit prices stragglers better than a full-batch trip
    — the batch pays E[max iterations] trips otherwise, a heavy tail:
    warm mean 1.34 but max ~5 at B=384 on the north-star bench).

    ``shrink`` (static tuple of strictly decreasing slab sizes < B)
    runs the loop as a pyramid: one full-width trip, then compact the
    alive stragglers to a leading slab of each size (one-hot MXU
    permutes) and trip only the slab — see :func:`_tracked_tail`.
    Results are slab-size independent (overflow falls into the fused
    kernel).
    """
    _check_tracked_config(params, reg, "solve_core_tracked")
    if cert_tol is None:
        cert_tol = default_cert_tol(A.dtype)
    with jax.default_matmul_precision("float32"):
        s0 = jax.vmap(
            lambda a, l, u, c, st, ns, x, v: _initial_state(
                a, l, u, c, st, ns, x, v, struct, params, None,
                True, False)
        )(A, lb, ub, ctr_type0, stamp0, next_stamp0, x0, v0)
    return _tracked_tail(
        A, s0, carried, struct=struct, params=params, tile=tile,
        interpret=interpret, vmem_limit_mb=vmem_limit_mb, compact=compact,
        tile_b=tile_b, panel_unroll=panel_unroll,
        compact_rounds=compact_rounds, ns_iters=ns_iters,
        cert_tol=cert_tol, ext_steps=ext_steps, loop_cap=loop_cap,
        shrink=shrink, handover_slab=handover_slab,
        trip1_noext=trip1_noext, debug_fall=debug_fall,
        reg=None if params.regularization_type == RegularizationType.NONE
        else reg)


def _check_tracked_config(params: ParametersLexLSI, reg, name: str):
    if params.regularization_type not in (
            RegularizationType.NONE, RegularizationType.TIKHONOV,
            RegularizationType.TIKHONOV_CG):
        raise LexLSError(
            f"{name}: only NONE/TIKHONOV/TIKHONOV_CG regularization "
            "supported")
    if params.regularization_type in (RegularizationType.TIKHONOV,
                                      RegularizationType.TIKHONOV_CG):
        if reg is None:
            raise LexLSError(f"{name}: TIKHONOV needs reg factors")
        if params.variable_regularization_factor != 0.0:
            raise LexLSError(
                f"{name}: variable regularization factor unsupported")
    if (params.cycling_handling_enabled or params.log_working_set_enabled
            or params.trace_enabled or params.use_phase1_v0):
        raise LexLSError(
            f"{name}: cycling/log/trace/use_phase1_v0 unsupported")


def _xla_tail(A, s, reg, struct: Structure, params: ParametersLexLSI):
    """Exact-tier batched continuation from a mid-solve state: the
    vmapped reference iteration (``_verify_working_set``) under a
    ``while_loop``, with converged instances frozen by predication.
    Serves as the tracker's fallback when the fused kernel cannot (the
    regularized configurations)."""
    from .lexlsi import _verify_working_set

    unknown = int(TerminationStatus.UNKNOWN)
    max_fact = params.max_number_of_factorizations

    def alive_of(s):
        return ((s.status == unknown)
                & ((s.it == 0) | (s.n_fact < max_fact)))

    def body(s):
        s_next = jax.vmap(
            lambda si, ai: _verify_working_set(si, ai, struct, params, reg)
        )(s, A)
        alive = alive_of(s)
        return jax.tree_util.tree_map(
            lambda a_new, a_old: jnp.where(
                alive.reshape((-1,) + (1,) * (a_new.ndim - 1)),
                a_new, a_old),
            s_next, s)

    s = lax.while_loop(lambda s: jnp.any(alive_of(s)), body, s)
    return dataclasses.replace(
        s, status=jnp.where(
            s.status == unknown,
            int(TerminationStatus.MAX_NUMBER_OF_FACTORIZATIONS_EXCEEDED),
            s.status))


def _tracked_tail(A, s0, carried: Carried, *, struct, params, tile,
                  interpret, vmem_limit_mb, compact, tile_b, panel_unroll,
                  compact_rounds, ns_iters, cert_tol, ext_steps, reg=None,
                  chg0=None, loop_cap: int = 0, shrink: tuple = (),
                  handover_slab: int = 0, trip1_noext: bool = False,
                  debug_fall: bool = False):
    """The tracker while-loop + kernel handover, from an already-built
    batched state (phase 1 done, or a mid-solve state from a capped
    kernel phase — the cold-start driver).

    ``chg0`` = optional ``(chg_hot (B, m) float, chg_sign (B, 1) float)``
    identifying the one constraint row whose activation state differs
    between the carried factorization and ``s0``'s working set (the
    cold-start kernel handover); zeros mean "carry matches exactly".
    Limitation: chg0 carries no ``chg_c``/``chg_w`` (the committing-trip
    Lp/W of the change do not exist at a bootstrap), so a bootstrap
    REMOVAL's below-level elimination change cannot be absorbed
    analytically — such instances typically fail the certificate at
    trip 1 and finish in the kernel (safe, slow path only).
    ``loop_cap`` > 0 bounds the tracker loop to that many trips
    (with ``shrink`` set, the full-width trip plus the slab trips count
    against the cap: slab sizes beyond ``loop_cap - 1`` are dropped) — the
    remaining alive instances fall into the fused kernel, whose per-TILE
    early exit prices stragglers far better than this full-batch loop
    (the handover argsort already clusters them into the leading
    tiles).

    ``shrink`` (static, strictly decreasing slab sizes < B) runs the
    loop as a PYRAMID instead of a fixed-width while: one trip at full
    B (every warm solve needs at least one), then for each size compact
    the still-alive instances to the front (one-hot MXU permutes — a
    row-gather is ~10 us/row on TPU) and run one trip on that leading
    slab only, finishing with the unbounded while on the smallest slab.
    A full-width loop pays E[max iterations over B] trips (warm mean
    1.34 but max ~5: the tail runs the whole batch); the pyramid pays
    full width exactly once.  Alive instances that do not fit a slab
    (more stragglers than the static size) are marked ``fall`` and
    finish in the fused kernel — slab sizing affects only speed, never
    results."""
    B, m, n = A.shape
    p = len(struct.lexlse_dims)
    d0 = struct.d0
    dtype = A.dtype
    max_fact = params.max_number_of_factorizations
    offsets = []
    ofs = 0
    for d in struct.lexlse_dims:
        offsets.append(ofs)
        ofs += d
    iota_m = jnp.arange(m, dtype=jnp.int32)[None, :]
    unknown = int(TerminationStatus.UNKNOWN)
    lvl_map = _lvl_map_of(struct)

    with jax.default_matmul_precision("float32"):

        def alive_of(s, fall):
            return ((s.status == unknown) & jnp.logical_not(fall)
                    & ((s.it == 0) | (s.n_fact < max_fact)))

        def cond(carry):
            s, fall, trip = carry[0], carry[4], carry[9]
            any_alive = jnp.any(alive_of(s, fall))
            if loop_cap:
                return any_alive & (trip < loop_cap)
            return any_alive

        def make_body(A_s, nochg=False):
            """The tracker trip over a (leading) slab: ``A_s`` fixes the
            slab's batch width; the same math runs at every pyramid
            level (per-instance reductions only — results are
            independent of slab width).

            ``nochg=True`` statically drops the change-absorption inputs
            from the factorization (``chg=None`` — no rank-1 Gram
            updates, no below-level absorption einsums): valid for the
            FIRST trip of a warm solve, whose carry comes from the
            previous solve's committed final state, so no working-set
            change is pending by construction (``chg0 is None``).  The
            commit bookkeeping (saving this trip's change for the next
            trip) is unaffected."""
            Bs = A_s.shape[0]

            def body(carry):
                return _body_impl(carry, A_s, Bs, nochg)
            return body

        def _body_impl(carry, A, B, nochg=False):
            if debug_fall:
                (s, rinv_c, pos_c, ranks_c, fall, chg_hot, chg_sign,
                 chg_c, chg_w, trip, fall_trip, fall_why) = carry
            else:
                (s, rinv_c, pos_c, ranks_c, fall, chg_hot, chg_sign,
                 chg_c, chg_w, trip) = carry
            chg_sign_in = chg_sign
            alive = alive_of(s, fall)

            Ag, bg, fixed_mask, fixed_val = jax.vmap(
                lambda a, l, u, c: _masked_general(a, l, u, c, struct)
            )(A, s.lb, s.ub, s.ctr_type)
            # fixed-variable elimination (``lexlse.h:132-156``): zero the
            # fixed COLUMNS and fold their values into the rhs — done by
            # the factorize functions on the other tiers, here explicitly
            Agz = jnp.where(fixed_mask[:, None, :], 0.0, Ag)
            bgz = bg - jnp.einsum("bmn,bn->bm", Ag, fixed_val,
                                  precision=lax.Precision.HIGHEST)
            # the changed row's raw coefficients (for a removal the row
            # is zero in Agz — read it from A with fixed columns zeroed),
            # its level, and its Gram sign; simple-bounds changes
            # (rows < d0) get lv = −1 / sgn = 0: no analytic absorption,
            # the certificate decides
            if nochg:
                chg_arg = None
            else:
                hot_g = lax.slice_in_dim(chg_hot, d0, m, axis=1)  # (B, mg)
                has_g = jnp.sum(hot_g, axis=1, keepdims=True)     # (B, 1)
                a_row = jnp.einsum(
                    "bm,bmn->bn", hot_g,
                    jnp.where(fixed_mask[:, None, :], 0.0,
                              A[:, d0:, :]), precision=lax.Precision.HIGHEST)
                lv = jnp.where(
                    has_g > 0,
                    jnp.round(jnp.einsum("bm,m->b", hot_g, lvl_map)
                              )[:, None].astype(jnp.int32), -1)
                sgn = chg_sign * has_g
                chg_arg = (a_row, hot_g, lv, sgn, chg_c, chg_w)
            # ``trip1_noext``: a nochg trip has no working-set change by
            # construction, so the greedy-extension block would only
            # absorb DRIFT-induced rank growth — rare on warm workloads
            # — at ~12 ops/level on the op-issue-bound trip.  With it
            # skipped, such instances fail the trailing-column check
            # and finish in the exact kernel (correct by fallback).
            ext_k = 0 if (nochg and trip1_noext) else ext_steps
            ok, stash, fcs, pos_n, ranks_n, rinv_n, why = _factorize_carried(
                Agz, bgz, rinv_c, pos_c, ranks_c, struct, params,
                ns_iters=ns_iters, cert_tol=cert_tol, ext_steps=ext_k,
                reg_factors=reg, chg=chg_arg)

            x_star = _hot_solve(stash, fcs, pos_n, fixed_mask, fixed_val,
                                struct)
            dx = x_star - s.x
            Adx, dv = jax.vmap(
                lambda a, l, u, c, ax, v_, d: _form_step(a, l, u, c, ax,
                                                         v_, d)
            )(A, s.lb, s.ub, s.ctr_type, s.Ax, s.v, dx)
            alpha, brow, btype = jax.vmap(
                lambda c, ax, adx, v_, dv_, l, u: _check_blocking(
                    c, ax, adx, v_, dv_, l, u,
                    jnp.asarray(params.tol_feasibility, dtype), dtype)
            )(s.ctr_type, s.Ax, Adx, s.v, dv, s.lb, s.ub)
            blocking = brow >= 0

            lam_all = _hot_lambda(stash, struct, offsets, B, dtype)
            found_rm, rrow = _select_removal(
                lam_all, s.ctr_type, s.stamp, Ag, fixed_mask, struct, params)
            want_sweep = jnp.logical_not(blocking)
            do_remove = want_sweep & found_rm
            solved = want_sweep & jnp.logical_not(found_rm)

            # --- working-set update + step (``lexlsi.h:1144-1265``),
            # committed only for alive instances with an accepted carry
            commit = alive & ok
            cm2 = commit[:, None]
            brow_hot = iota_m == brow[:, None]
            rrow_hot = iota_m == rrow[:, None]
            blk2 = blocking[:, None] & cm2
            rm2 = do_remove[:, None] & cm2
            ctr_type = jnp.where(blk2 & brow_hot, btype[:, None],
                                 jnp.where(rm2 & rrow_hot,
                                           int(CtrType.INACTIVE),
                                           s.ctr_type))
            stamp = jnp.where(blk2 & brow_hot, s.next_stamp[:, None],
                              jnp.where(rm2 & rrow_hot, -1, s.stamp))
            next_stamp = s.next_stamp + (blocking & commit).astype(jnp.int32)
            # gate by SELECTION, never by multiplication: a rejected carry
            # (ok=False) legitimately carries NaNs out of the Cholesky —
            # 0.0 * NaN = NaN would poison the state the fallback resumes
            take = ((alpha > 0.0) & commit)[:, None]
            x = jnp.where(take, s.x + alpha[:, None] * dx, s.x)
            v = jnp.where(take, s.v + alpha[:, None] * dv, s.v)
            Ax = jnp.where(take, s.Ax + alpha[:, None] * Adx, s.Ax)
            cm = commit[:, None]
            dx_c = jnp.where(cm, dx, s.dx)
            dv_c = jnp.where(cm, dv, s.dv)
            Adx_c = jnp.where(cm, Adx, s.Adx)

            status = jnp.where(commit & solved,
                               int(TerminationStatus.PROBLEM_SOLVED),
                               s.status)
            s_new = dataclasses.replace(
                s, x=x, v=v, dx=dx_c, dv=dv_c, Ax=Ax, Adx=Adx_c,
                ctr_type=ctr_type, stamp=stamp, next_stamp=next_stamp,
                it=s.it + commit.astype(jnp.int32),
                n_act=s.n_act + (blocking & commit).astype(jnp.int32),
                n_deact=s.n_deact + (do_remove & commit).astype(jnp.int32),
                n_fact=s.n_fact + (commit & (s.it > 0)).astype(jnp.int32),
                status=status)

            # --- removal: delete the level's LAST carried pivot (see
            # :func:`_delete_last_pivot`) so the next trip's closed-form
            # downdate operates on the reduced pivot prefix instead of
            # going singular (tools/trk_stats.py measured every removal
            # falling back to the kernel before this)
            rm_commit = do_remove & commit
            rm_hot_g = (rrow_hot[:, d0:].astype(jnp.float32)
                        * rm_commit[:, None])
            # the deleted pivot's elimination change (from THIS trip's
            # factors, pre-deletion) — the next trip's below levels
            # absorb its disappearing Gauss elimination.  Same exact
            # rank-1 identification as the activation save: z = Q[r, :]
            # of the REMOVED row, Δ = (Lp·z)(W[slot, :])ᵀ / z_slot.
            K_ = rinv_n.shape[-1]
            iota_kk = jnp.arange(K_, dtype=jnp.int32)
            lv_rm = jnp.round(jnp.einsum(
                "bm,m->b", rm_hot_g, lvl_map)).astype(jnp.int32)
            is_rm = jnp.sum(rm_hot_g, axis=1) > 0
            chg_c_n = jnp.zeros_like(chg_c)
            chg_w_n = jnp.zeros_like(chg_w)
            hp_ = lax.Precision.HIGHEST
            for j, (fr_j, dim_j) in enumerate(
                    zip(offsets, struct.lexlse_dims)):
                if stash[j] is None or fr_j + dim_j >= chg_c.shape[1]:
                    continue
                Q_j, W_j, Lp_j = stash[j][1], stash[j][2], stash[j][4]
                mask_j = (is_rm & (lv_rm == j)).astype(dtype)[:, None]
                sel_j = (iota_kk[None, :]
                         == (ranks_n[:, j] - 1)[:, None]).astype(dtype)
                row1h_j = lax.slice_in_dim(rm_hot_g, fr_j, fr_j + dim_j,
                                           axis=1).astype(dtype)
                z_j = jnp.einsum("bd,bdk->bk", row1h_j, Q_j,
                                 precision=hp_)
                zs_j = jnp.sum(z_j * sel_j, axis=1, keepdims=True)
                inv_j = jnp.where(jnp.abs(zs_j) > 1e-12, 1.0 / zs_j, 0.0)
                c_j = (jnp.einsum("bmk,bk->bm", Lp_j, z_j, precision=hp_)
                       * inv_j * mask_j)
                w_j = jnp.einsum("bkc,bk->bc", W_j, sel_j,
                                 precision=hp_) * mask_j
                chg_c_n = chg_c_n.at[:, fr_j + dim_j:].add(c_j)
                chg_w_n = chg_w_n + w_j
            pos_n, ranks_n = _delete_last_pivot(pos_n, ranks_n,
                                                rm_hot_g, struct)

            cmr = commit.reshape((-1, 1, 1, 1))
            rinv_c = jnp.where(cmr, rinv_n, rinv_c)
            pos_c = jnp.where(commit[:, None], pos_n, pos_c)
            ranks_c = jnp.where(commit[:, None], ranks_n, ranks_c)
            fall = fall | (alive & jnp.logical_not(ok))
            # the working-set delta this iteration applied — next trip's
            # factorization absorbs it analytically
            chg_hot_n = ((blk2 & brow_hot) | (rm2 & rrow_hot)).astype(
                jnp.float32)
            chg_sign_n = (blk2.astype(jnp.float32)
                          - rm2.astype(jnp.float32))
            chg_hot = jnp.where(cm2, chg_hot_n, jnp.zeros_like(chg_hot))
            chg_sign = jnp.where(cm2, chg_sign_n,
                                 jnp.zeros_like(chg_sign))
            chg_c = jnp.where(cm2, chg_c_n, jnp.zeros_like(chg_c))
            chg_w = jnp.where(cm2, chg_w_n, jnp.zeros_like(chg_w))
            if debug_fall:
                new_fall = alive & jnp.logical_not(ok)
                fall_trip = jnp.where(new_fall, trip + 1, fall_trip)
                # encode the op the failing trip tried to absorb in the
                # trip field's last digit: chg_sign_in is +1 for an
                # activation, -1 for a removal, 0 drift-only
                op_code = jnp.round(chg_sign_in[:, 0]).astype(jnp.int32)
                fall_trip = jnp.where(new_fall,
                                      fall_trip * 10 + (op_code + 1),
                                      fall_trip)
                fall_why = jnp.where(new_fall, why, fall_why)
                return (s_new, rinv_c, pos_c, ranks_c, fall, chg_hot,
                        chg_sign, chg_c, chg_w, trip + 1, fall_trip,
                        fall_why)
            return (s_new, rinv_c, pos_c, ranks_c, fall, chg_hot,
                    chg_sign, chg_c, chg_w, trip + 1)

        fall0 = jnp.zeros((B,), bool)
        if chg0 is None:
            chg_hot0 = jnp.zeros((B, m), jnp.float32)
            chg_sign0 = jnp.zeros((B, 1), jnp.float32)
        else:
            chg_hot0, chg_sign0 = chg0
        chg_c0 = jnp.zeros((B, max(m - d0, 1)), dtype)
        chg_w0 = jnp.zeros((B, n + 1), dtype)
        carry0 = (s0, carried.rinv, carried.pos, carried.ranks, fall0,
                  chg_hot0, chg_sign0, chg_c0, chg_w0,
                  jnp.zeros((), jnp.int32))
        if debug_fall:
            if shrink:
                raise LexLSError("debug_fall with shrink unsupported")
            carry0 = carry0 + (jnp.zeros((B,), jnp.int32),
                               jnp.zeros((B,), jnp.int32))
        if shrink:
            sizes = tuple(int(z) for z in shrink)
            if any(z <= 0 for z in sizes) or \
                    any(a <= b for a, b in zip((B,) + sizes, sizes)):
                raise LexLSError(
                    f"shrink sizes must be strictly decreasing and < B: "
                    f"{sizes} (B={B})")
            if loop_cap:
                # honor the documented trip bound: the full-width trip
                # is trip 1, so at most loop_cap-1 slab trips may run
                # (the final while_loop's cond enforces the rest)
                sizes = sizes[:max(0, loop_cap - 1)]
            # trip 1 at full width (every warm solve factorizes at
            # least once; a warm carry has no pending change, so the
            # absorption machinery drops out statically — make_body
            # nochg), then compact-and-shrink one trip per slab size.
            # All slab moves happen on ONE packed (B, F) buffer — the
            # per-leaf permute version cost ~90 matmul ops per level
            # (op-issue bound) and erased the compaction win.  The tail
            # leaves (state sans chg) are packed as a PREFIX so the
            # parked tail is one slice + matmul and stays packed until
            # the unwind.
            carry = make_body(A, nochg=chg0 is None)(carry0)
            stack = []
            A_cur = A
            fdt = A.dtype
            hp = lax.Precision.HIGHEST
            for sz in sizes:
                (s_c, rinv_c, pos_c, ranks_c, fall_c, chg_hot_c,
                 chg_sign_c, chg_c_c, chg_w_c, trip_c) = carry
                Bc = A_cur.shape[0]
                alive = alive_of(s_c, fall_c)
                order = jnp.argsort(jnp.logical_not(alive))
                iota_b = jnp.arange(Bc, dtype=jnp.int32)
                hot = (order[:, None] == iota_b[None, :]).astype(
                    jnp.float32)                                # (Bc, Bc)
                hot_h, hot_t = hot[:sz], hot[sz:]
                tree5 = (s_c, rinv_c, pos_c, ranks_c, fall_c)
                buf, meta = _pack_tree(
                    (tree5, chg_hot_c, chg_sign_c, chg_c_c, chg_w_c), fdt)
                n5 = len(jax.tree_util.tree_leaves(tree5))
                spec = meta[1]
                w5 = sum(spec[i][2] for i in range(n5))
                # fall must be the last prefix column (the overflow OR
                # below writes it in packed form)
                assert spec[n5 - 1][1:] == (jnp.bool_, 1)
                head5, chg_hot_h, chg_sign_h, chg_c_h, chg_w_h = \
                    _unpack_tree(_permute_rows(buf, hot_h), meta)
                buf_t = _permute_rows(
                    lax.slice_in_dim(buf, 0, w5, axis=1), hot_t)
                # overflow: a straggler that did not fit the slab
                # finishes in the fused kernel (correctness is
                # slab-size independent) — OR it into the packed tail's
                # fall column
                ov_t = jnp.dot(hot_t.astype(fdt), alive.astype(fdt),
                               precision=hp)
                buf_t = buf_t.at[:, w5 - 1].max(ov_t)
                stack.append((hot, buf_t))
                A_cur = _permute_rows(A_cur, hot_h)
                head_carry = head5 + (chg_hot_h, chg_sign_h,
                                      chg_c_h, chg_w_h, trip_c)
                # a slab trip with no alive instance is pure waste (the
                # warm-solve common case after trip 1-2) — real branch,
                # this function is never vmapped and the body is pure
                # XLA (no pallas), so lax.cond skips it entirely
                carry = lax.cond(jnp.any(alive), make_body(A_cur),
                                 lambda c: c, head_carry)
            # unbounded finish on the smallest slab (loop_cap still
            # bounds total trips if set)
            carry = lax.while_loop(cond, make_body(A_cur), carry)
            s, rinv_c, pos_c, ranks_c, fall = carry[:5]
            if loop_cap:
                fall = fall | alive_of(s, fall)
            # unwind in packed form: re-attach each level's parked tail
            # and invert the compaction permutation (hot is orthogonal:
            # inverse = hotT); one concat + one matmul per level, one
            # unpack at the top
            buf_head, meta5 = _pack_tree(
                (s, rinv_c, pos_c, ranks_c, fall), fdt)
            for hot, buf_t in reversed(stack):
                buf_full = jnp.concatenate([buf_head, buf_t], axis=0)
                buf_head = _permute_rows(buf_full, hot.T)
            s, rinv_c, pos_c, ranks_c, fall = _unpack_tree(
                buf_head, meta5)
        else:
            # peel trip 1: a warm carry has no pending working-set
            # change (chg0 is None), so its absorption machinery drops
            # out statically; the while_loop continues with the general
            # body from trip 2 (the peel preserves trip counting — the
            # body increments `trip`, and cond still bounds loop_cap)
            carry1 = make_body(A, nochg=chg0 is None)(carry0)
            out = lax.while_loop(cond, make_body(A), carry1)
            s, rinv_c, pos_c, ranks_c, fall = out[:5]
            fall_dbg = out[10:] if debug_fall else None
            if loop_cap:
                # capped out while still alive: finish in the fused kernel
                fall = fall | alive_of(s, fall)

        # --- fallback handover: fallen instances continue from their
        # current state.  Without regularization the fused Pallas kernel
        # continues (everyone else is parked: their kernel outputs are
        # discarded below; status is not a kernel input, so parking goes
        # through the factorization budget).  With regularization the
        # kernel is unavailable — the exact XLA tier continues instead
        # (its per-instance predication needs no parking), and the
        # carried factors of fallen instances are invalidated (ranks 0:
        # they re-enter the tracker as an immediate fallback next solve).
        resolved = s.status != unknown
        carried_t = Carried(rinv=rinv_c, pos=pos_c, ranks=ranks_c)

        def merge(st_k, carried_k):
            """Tracker-resolved instances keep the tracker result;
            kernel phases restart n_act/n_deact at zero, so counters sum
            (parked instances contribute zero kernel counts)."""
            res = resolved
            final = jax.tree_util.tree_map(
                lambda a_t, a_k: jnp.where(
                    res.reshape((-1,) + (1,) * (a_t.ndim - 1)), a_t, a_k),
                s, st_k)
            if reg is None:
                final = dataclasses.replace(
                    final,
                    n_act=s.n_act + jnp.where(res, 0, st_k.n_act),
                    n_deact=s.n_deact + jnp.where(res, 0, st_k.n_deact),
                )
            # (the XLA tail increments s's own counters, nothing to add)
            carried_new = jax.tree_util.tree_map(
                lambda a_t, a_k: jnp.where(
                    res.reshape((-1,) + (1,) * (a_t.ndim - 1)), a_t, a_k),
                carried_t, carried_k)
            return final, carried_new

        if reg is None:
            def kernel_on(hot_h):
                """Run the fused kernel on the ``hot_h``-selected slab
                (S, B) — S = B reproduces the full-width handover —
                then scatter results/factors back to full width with
                the transpose (exact: 0/1 weights at HIGHEST).  The
                tri-inv bootstrap runs at slab width (the point of the
                slab: the permute matmuls, the kernel grid, and the
                bootstrap all shrink from B to S rows)."""
                it0 = s.it
                s_in = dataclasses.replace(
                    s, n_fact=jnp.where(resolved, max_fact, s.n_fact))
                g = lambda arr: _permute_rows(arr, hot_h)
                s_perm = jax.tree_util.tree_map(g, s_in)
                st_k, factors_k = _fused_tail(
                    g(A), s_perm, g(it0), struct=struct, params=params,
                    tile=tile, interpret=interpret,
                    vmem_limit_mb=vmem_limit_mb, compact=compact,
                    tile_b=tile_b, panel_unroll=panel_unroll,
                    compact_rounds=compact_rounds, return_factors=True)
                car_k = bootstrap_carried(factors_k)        # slab width
                hot_t = hot_h.T
                gi = lambda arr: _permute_rows(arr, hot_t)
                st_k = jax.tree_util.tree_map(gi, st_k)
                car_k = jax.tree_util.tree_map(gi, car_k)
                # rows outside the slab scatter to zero — merge() only
                # reads kernel values where ~resolved, and the slab
                # branch is entered only when every unresolved instance
                # fits the slab
                return merge(st_k, car_k)

            def do_handover(_):
                order = jnp.argsort(resolved)               # unresolved first
                iota_b = jnp.arange(B, dtype=jnp.int32)
                hot_b = (order[:, None] == iota_b[None, :]).astype(
                    jnp.float32)
                S = handover_slab
                if S <= 0 or S >= B:
                    return kernel_on(hot_b)
                # slab handover: the straggler count is data-dependent;
                # overflow (> S unresolved — rare by sizing) takes the
                # full-width branch.  Real runtime branch (this driver
                # is never vmapped); results are slab-size independent.
                n_unres = jnp.sum(jnp.logical_not(resolved))
                if interpret:
                    # pallas interpret mode inside lax.cond is not
                    # supported on CPU: run both branches, select — the
                    # CPU parity path for the slab logic
                    slab = kernel_on(hot_b[:S])
                    full = kernel_on(hot_b)
                    pred = n_unres <= S
                    return jax.tree_util.tree_map(
                        lambda a_s, a_f: jnp.where(pred, a_s, a_f),
                        slab, full)
                return lax.cond(
                    n_unres <= S,
                    lambda _: kernel_on(hot_b[:S]),
                    lambda _: kernel_on(hot_b), None)

            def skip_handover(_):
                return s, carried_t

            # _tracked_tail is a batch driver, never vmapped: the cond
            # is a REAL runtime branch (not a select), so when every
            # instance resolved in the tracker — the common warm-solve
            # case — the permutes, the Pallas kernel round-trip, and
            # the tri-inv bootstrap are all skipped (~1.24 ms at B=384,
            # tools/trk_profile.py).  interpret=True (CPU tests) keeps
            # the unconditional path: pallas interpret mode inside a
            # lax.cond branch is not supported on the CPU backend.
            if interpret:
                final, carried_new = do_handover(None)
            else:
                final, carried_new = lax.cond(
                    jnp.logical_not(jnp.all(resolved)),
                    do_handover, skip_handover, None)
        else:
            st_k = _xla_tail(A, s, reg, struct, params)
            carried_k = Carried(
                rinv=jnp.zeros_like(carried.rinv),
                pos=jnp.broadcast_to(
                    jnp.arange(n, dtype=jnp.int32), (B, n)),
                ranks=jnp.zeros((B, p), jnp.int32))
            final, carried_new = merge(st_k, carried_k)
        if debug_fall:
            # diagnosis only (tools/trk_stats.py): which instances took
            # the kernel/XLA fallback this solve, at which trip, and
            # which acceptance rule rejected (bit0 cert / bit1
            # pivot-norm / bit2 trailing-column)
            return final, carried_new, (fall,) + tuple(fall_dbg)
        return final, carried_new


@functools.partial(
    jax.jit,
    static_argnames=("struct", "params", "x_guess_specified",
                     "v0_specified", "tile", "interpret", "vmem_limit_mb",
                     "compact", "tile_b", "panel_unroll", "compact_rounds",
                     "ns_iters", "cert_tol", "ext_steps", "debug_fall"),
)
def solve_core_cold_tracked(
    A, lb, ub, ctr_type0, stamp0, next_stamp0, x0, v0,
    struct: Structure, params: ParametersLexLSI,
    x_guess_specified: bool = False, v0_specified: bool = False,
    tile: int = 64, interpret: bool = False, vmem_limit_mb: int = 0,
    compact: int = 0, tile_b: int = 0, panel_unroll: int = 1,
    compact_rounds: int = 1,
    ns_iters: int = 2, cert_tol: float = None, ext_steps: int = 1,
    reg=None, debug_fall: bool = False,
):
    """Cold-start batched solve through the tracker loop.

    No carried state exists at a cold start, so ONE exact kernel
    iteration runs first (``iter_cap=1``) — it factorizes the initial
    working set with the greedy pivoted panel and exports the factors —
    then the tracker loop (:func:`_tracked_tail`) continues every
    remaining active-set iteration as batched MXU matmuls, with
    per-instance kernel fallback on rank loss.  Same restrictions as
    :func:`solve_core_tracked`.  Returns ``(state, carried')``.

    This is the cold-solve accelerator (BASELINE config 2: ~80-200
    iterations per solve, each a full refactorization in the reference,
    ``lexlse.h:117``): all but the first iteration leave the serial
    pivot chain entirely.
    """
    _check_tracked_config(params, reg, "solve_core_cold_tracked")
    if cert_tol is None:
        cert_tol = default_cert_tol(A.dtype)
    reg_mode = params.regularization_type != RegularizationType.NONE
    from .ops.fused import fused_active_set

    p = len(struct.lexlse_dims)
    prio = tuple(tuple(int(q) for q in struct.sweep_priority(j))
                 for j in range(p))
    elig = tuple(tuple(bool(e) for e in struct.sweep_eligible(j))
                 for j in range(p))
    var_idx = struct.var_idx if struct.simple_bounds else ()

    with jax.default_matmul_precision("float32"):
        s = jax.vmap(
            lambda a, l, u, c, st, ns, x, v: _initial_state(
                a, l, u, c, st, ns, x, v, struct, params, None,
                x_guess_specified, v0_specified)
        )(A, lb, ub, ctr_type0, stamp0, next_stamp0, x0, v0)

        if reg_mode:
            # regularized bootstrap: one exact-tier iteration (the
            # kernel has no regularization) + carried factors from the
            # vmapped fast factorization of the initial working set
            from .lexlsi import (_factorize, _masked_general as _mg,
                                 _verify_with_f)

            def one_iter(si, ai):
                Ag_i, bg_i, fm_i, fv_i = _mg(ai, si.lb, si.ub,
                                             si.ctr_type, struct)
                f = _factorize(ai, si.lb, si.ub, si.ctr_type, struct,
                               params, reg)
                return _verify_with_f(si, ai, Ag_i, f, struct, params), f

            s1, f_b = jax.vmap(one_iter)(s, A)
            carried0 = carried_from_lexqr(f_b, struct)
        else:
            kw = dict(
                dims=struct.lexlse_dims, d0=struct.d0, var_idx=var_idx,
                tol_ld=params.tol_linear_dependence,
                tol_feas=params.tol_feasibility,
                tol_wrong=params.tol_wrong_sign_lambda,
                tol_correct=params.tol_correct_sign_lambda,
                max_fact=params.max_number_of_factorizations,
                deact_first=params.deactivate_first_wrong_sign,
                prio=prio, elig=elig, tile=tile, interpret=interpret,
                vmem_limit_mb=vmem_limit_mb, panel_unroll=panel_unroll)
            outs = fused_active_set(
                A, s.lb, s.ub, s.ctr_type, s.stamp, s.next_stamp, s.x, s.v,
                s.Ax, s.n_fact, iter_cap=1, **kw)
            (x, v, dx, dv, Ax, Adx, ct, stamp, ns2, it, na, nd, nf,
             status, rpadf, posf, ranksf) = outs[:17]
            s1 = dataclasses.replace(
                s, x=x, v=v, dx=dx, dv=dv, Ax=Ax, Adx=Adx, ctr_type=ct,
                stamp=stamp, next_stamp=ns2[:, 0], it=it[:, 0],
                n_act=na[:, 0], n_deact=nd[:, 0], n_fact=nf[:, 0],
                status=status[:, 0])
            carried0 = bootstrap_carried((rpadf, posf, ranksf))

        # The bootstrap factors describe the INITIAL working set, but
        # the bootstrap iteration itself may have committed one change
        # (activation or removal) into s1.  Hand it to the tracker as
        # chg0 so trip 1 absorbs it analytically — without this every
        # cold solve's trip 1 failed the cert and the WHOLE solve ran
        # in the fallback (tools/trk_stats.py: 384/384 falls).  A
        # removal additionally needs the carried pivot deletion.
        act_lb, act_ub = int(CtrType.ACTIVE_LB), int(CtrType.ACTIVE_UB)
        was_act = (s.ctr_type == act_lb) | (s.ctr_type == act_ub)
        now_act = (s1.ctr_type == act_lb) | (s1.ctr_type == act_ub)
        changed = was_act != now_act
        chg_hot0 = changed.astype(jnp.float32)
        n_chg = jnp.sum(chg_hot0, axis=1, keepdims=True)
        sgn0 = (jnp.sum((now_act & changed).astype(jnp.float32), axis=1,
                        keepdims=True)
                - jnp.sum((was_act & changed).astype(jnp.float32),
                          axis=1, keepdims=True))
        # iter_cap=1 commits at most one change; guard anyway (zeros =
        # "carry matches exactly" => the certificate decides)
        chg_hot0 = jnp.where(n_chg <= 1.0, chg_hot0, 0.0)
        chg_sign0 = jnp.where(n_chg <= 1.0, sgn0, 0.0)
        rm_hot_g = (chg_hot0[:, struct.d0:]
                    * (chg_sign0 < 0).astype(jnp.float32))
        pos0, ranks0 = _delete_last_pivot(carried0.pos, carried0.ranks,
                                          rm_hot_g, struct)
        carried0 = Carried(rinv=carried0.rinv, pos=pos0, ranks=ranks0)
    return _tracked_tail(
        A, s1, carried0, struct=struct, params=params, tile=tile,
        interpret=interpret, vmem_limit_mb=vmem_limit_mb, compact=compact,
        tile_b=tile_b, panel_unroll=panel_unroll,
        compact_rounds=compact_rounds, ns_iters=ns_iters,
        cert_tol=cert_tol, ext_steps=ext_steps,
        reg=reg if reg_mode else None, debug_fall=debug_fall,
        chg0=(chg_hot0, chg_sign0))
