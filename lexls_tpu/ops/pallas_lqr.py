"""Pallas TPU kernel for the l-QR level-panel factorization.

The hot op of the whole framework is the per-level column-pivoted
Householder panel factorization (reference ``lexlse.h:182-268``): a
sequential pivot loop whose every step selects a pivot column by
(virtually permuted) column norms, forms one reflection, and applies a
rank-1 update to the level block.  This kernel runs the *entire* pivot
loop of one level for a tile of TB batch instances inside VMEM — one
kernel launch per level instead of ~dim XLA loop iterations, with the
block, column norms and permutation state never leaving the chip.

Batch tiling is the vectorization axis: every op works on (TB, dim, n)
tiles so the VPU's (8, 128) lanes are filled by instances x rows; all
per-instance divergence (pivot choice, rank, early stop) is realized by
masks — there is no dynamic-lane indexing anywhere (one-hot contractions
replace gathers).  Mosaic constraints shape the code: state lives in
VMEM refs (the ``fori_loop`` carries nothing), per-instance scalars are
(TB, 1) arrays, and contractions are multiply+reduce (no batch-dim dot).

The same step function runs as the pure-jnp fallback (CPU / interpret
mode), so the kernel and the reference XLA path are the same code.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import ParametersLexLSE, RegularizationType

_INT_MAX = jnp.iinfo(jnp.int32).max


# ---------------------------------------------------------------------------
# The panel pivot step (shared by kernel and fallback), batched over TB
# ---------------------------------------------------------------------------


def _panel_step_core(counter, block, col_norms, pos, col_at, ci, stopped,
                     rank_row, hh, *, fr, dim, n, tol,
                     defer_downdate: bool = False, lean: bool = False):
    """One pivot step on a (TB, dim, n+1) level block (virtual perm).

    Pure value-level math (mirrors reference ``lexlse.h:199-268`` /
    lexlse.factorize_fast).  ``ci`` (col_index) and ``stopped`` are
    (TB, 1) int32; every selection is a one-hot contraction.

    ``lean=True`` skips the ``col_at`` / ``rank_row`` bookkeeping (their
    inputs are ignored and returned unchanged): the fused whole-solve
    kernel tracks the permutation through ``pos`` alone, and dropping
    the inverse-map maintenance removes ~4 ops from the serial chain.
    The pivot choice and all numerics are bit-identical."""
    TB = block.shape[0]
    dtype = block.dtype
    phys = lax.broadcasted_iota(jnp.int32, (TB, n), 1)
    qpos = phys
    rows = lax.broadcasted_iota(jnp.int32, (TB, dim), 1)

    # --- pivot selection: max column norm among remaining positions,
    # ties to the smallest position (one-hot, no argmax)
    remaining = pos >= ci
    masked = jnp.where(remaining, col_norms, -jnp.ones((), dtype))
    mx = jnp.max(masked, axis=1, keepdims=True)
    cand = remaining & (masked == mx)
    qmin = jnp.min(jnp.where(cand, pos, _INT_MAX), axis=1, keepdims=True)
    piv_hot = (cand & (pos == qmin)).astype(dtype)  # (TB, n) one-hot

    # stability recomputation over the remaining rows (``lexlse.h:208``)
    colv = jnp.sum(block[:, :, :n] * piv_hot[:, None, :], axis=2)  # (TB, dim)
    row_live = rows >= counter
    max_val = jnp.sum(jnp.where(row_live, colv * colv, 0), axis=1,
                      keepdims=True)  # (TB, 1)
    col_norms = jnp.where(piv_hot > 0, max_val, col_norms)

    ok = max_val >= tol
    accept = ok & (stopped == 0) & (ci < n)  # (TB, 1)
    stopped = jnp.where(ok, stopped, jnp.ones_like(stopped))
    acc = accept.astype(dtype)

    # --- virtual swap: position of piv <-> position col_index
    q2 = qmin
    if lean:
        # the column currently at position ci is identified through pos
        # directly; col_at (the inverse map) is not maintained
        pos = jnp.where(accept & (pos == ci), q2,
                        jnp.where(accept & (piv_hot > 0), ci, pos))
    else:
        c1 = jnp.sum(jnp.where(qpos == ci, col_at, 0), axis=1,
                     keepdims=True).astype(jnp.int32)
        piv_id = jnp.sum(jnp.where(piv_hot > 0, phys, 0), axis=1,
                         keepdims=True).astype(jnp.int32)
        pos = jnp.where(accept & (phys == c1), q2,
                        jnp.where(accept & (piv_hot > 0), ci, pos))
        col_at = jnp.where(accept & (qpos == ci), piv_id,
                           jnp.where(accept & (qpos == q2), c1, col_at))

    # --- Householder reflection of the remaining rows
    seg = jnp.where(row_live, colv, 0)
    row_hot = (rows == counter).astype(dtype)
    c0 = jnp.sum(seg * row_hot, axis=1, keepdims=True)  # (TB, 1)
    s_tail = jnp.sum(jnp.where(rows > counter, seg * seg, 0), axis=1,
                     keepdims=True)
    nonzero_tail = s_tail > 0
    beta = jnp.sqrt(c0 * c0 + s_tail)
    beta = jnp.where(c0 >= 0, -beta, beta)
    beta = jnp.where(nonzero_tail, beta, c0)
    denom = jnp.where(nonzero_tail, c0 - beta, jnp.ones((), dtype))
    tau = jnp.where(nonzero_tail, (beta - c0) / beta, 0)  # (TB, 1)
    essential = seg / denom
    u = jnp.where(rows == counter, jnp.ones((), dtype),
                  jnp.where(rows > counter, essential, 0))  # (TB, dim)

    w = jnp.sum(u[:, :, None] * block, axis=1)  # (TB, n+1)
    # float mask (concatenating bool mask registers trips Mosaic)
    trailing = jnp.concatenate(
        [(pos > ci).astype(dtype), jnp.ones((TB, 1), dtype)], axis=1)
    wmask = w * trailing

    # pivot column: beta at the diagonal, essentials below
    newcol = jnp.where(rows == counter, beta,
                       jnp.where(rows > counter, essential, colv))
    newcol = jnp.where(accept, newcol, colv)
    hot_p1 = jnp.concatenate([piv_hot, jnp.zeros((TB, 1), dtype)], axis=1)
    # single fused pass: pivot-column lanes take newcol, every other lane
    # takes the reflection update (wmask is 0 on the pivot column, so the
    # two writes never overlap — this is the same arithmetic per lane as
    # updating then overwriting, in one sweep over the block)
    block = jnp.where(
        hot_p1[:, None, :] > 0, newcol[:, :, None],
        block - (tau * acc)[:, :, None] * u[:, :, None] * wmask[:, None, :])

    hh = jnp.where((rows == counter) & accept, tau, hh)
    if not lean:
        rank_row = jnp.where(accept & (qpos == ci), fr + counter, rank_row)

    # --- downdate of column norms (deferrable: a kernel caller can read
    # the updated pivot row back from its VMEM ref with a dynamic slice,
    # which is cheaper than this full-block one-hot contraction)
    if not defer_downdate:
        pivot_row = jnp.sum(block[:, :, :n] * row_hot[:, :, None], axis=1)
        dd = jnp.where(pos > ci, pivot_row * pivot_row, 0)
        col_norms = jnp.where(accept, col_norms - dd, col_norms)

    ci = ci + accept.astype(jnp.int32)
    # u_live: this step's reflection vector, zeroed when the step is dead
    # (tau == 0 or rejected) — exactly column `counter` of the WY factor V
    # (lexlse._wy_raw masks); consumers that don't need it drop it.
    u_live = u * (accept & (tau != 0)).astype(dtype)
    return block, col_norms, pos, col_at, ci, stopped, rank_row, hh, u_live


def _panel_loop(block, pos, col_at, col_index, rank_row, *, fr, dim, n, tol):
    """Run the full pivot loop of one level (batched, value-level XLA)."""
    dtype = block.dtype
    TB = block.shape[0]
    col_norms = jnp.sum(block[:, :, :n] * block[:, :, :n], axis=1)
    hh = jnp.zeros((TB, dim), dtype)
    stopped = jnp.zeros((TB, 1), jnp.int32)
    ci = col_index[:, None]

    def step(counter, carry):
        return _panel_step_core(counter, *carry, fr=fr, dim=dim, n=n,
                                tol=tol)[:8]

    carry = (block, col_norms, pos, col_at, ci, stopped, rank_row, hh)
    carry = lax.fori_loop(0, dim, step, carry)
    (block, _, pos, col_at, ci, _, rank_row, hh) = carry
    return block, pos, col_at, ci[:, 0], rank_row, hh


# ---------------------------------------------------------------------------
# Pallas kernel wrapper
# ---------------------------------------------------------------------------


def panel_factorize(
    block, pos, col_at, col_index, rank_row,
    *, fr: int, tol: float, tile: int = 64, use_pallas: bool = True,
    interpret: bool = False,
):
    """Level-panel factorization (batched).

    block (B, dim, n+1), pos/col_at/rank_row (B, n) int32,
    col_index (B,) int32.  Returns the updated tuple + hh (B, dim).
    ``use_pallas=False`` runs the identical math as plain XLA.
    """
    B, dim, np1 = block.shape
    n = np1 - 1
    if not use_pallas:
        return _panel_loop(block, pos, col_at, col_index, rank_row,
                           fr=fr, dim=dim, n=n, tol=tol)

    tile = min(tile, B)
    assert B % tile == 0, (B, tile)

    def kernel(block_in, pos_in, col_at_in, ci_in, rr_in,
               block_o, pos_o, col_at_o, ci_o, rr_o, hh_o,
               cn_ref, stop_ref):
        # state lives in the output refs / scratch; the loop carries nothing
        block_o[:] = block_in[:]
        pos_o[:] = pos_in[:]
        col_at_o[:] = col_at_in[:]
        ci_o[:] = ci_in[:]
        rr_o[:] = rr_in[:]
        hh_o[:] = jnp.zeros_like(hh_o)
        cn_ref[:] = jnp.sum(block_in[:, :, :n] * block_in[:, :, :n], axis=1)
        stop_ref[:] = jnp.zeros_like(stop_ref)

        def body(counter, _):
            out = _panel_step_core(
                counter, block_o[:], cn_ref[:], pos_o[:], col_at_o[:],
                ci_o[:], stop_ref[:], rr_o[:], hh_o[:],
                fr=fr, dim=dim, n=n, tol=tol)
            block_o[:] = out[0]
            cn_ref[:] = out[1]
            pos_o[:] = out[2]
            col_at_o[:] = out[3]
            ci_o[:] = out[4]
            stop_ref[:] = out[5]
            rr_o[:] = out[6]
            hh_o[:] = out[7]
            return 0

        lax.fori_loop(0, dim, body, 0)

    grid = (B // tile,)
    bspec = lambda *shape: pl.BlockSpec(  # noqa: E731
        (tile,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec(dim, np1), bspec(n), bspec(n), bspec(1), bspec(n)],
        out_specs=(bspec(dim, np1), bspec(n), bspec(n), bspec(1), bspec(n),
                   bspec(dim)),
        out_shape=(
            jax.ShapeDtypeStruct((B, dim, np1), block.dtype),
            jax.ShapeDtypeStruct((B, n), jnp.int32),
            jax.ShapeDtypeStruct((B, n), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, n), jnp.int32),
            jax.ShapeDtypeStruct((B, dim), block.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, n), block.dtype),   # column norms
            pltpu.VMEM((tile, 1), jnp.int32),     # stopped flags
        ],
        interpret=interpret,
    )(block, pos, col_at, col_index[:, None], rank_row)
    block, pos, col_at, ci, rank_row, hh = out
    return block, pos, col_at, ci[:, 0], rank_row, hh


# ---------------------------------------------------------------------------
# Batched factorization driver (panel kernel + XLA inter-level steps)
# ---------------------------------------------------------------------------


def _gauss_level(lod, pos, col_at, first_col, col_index, rank,
                 *, fr, dim, K, n):
    """Per-instance Gauss elimination of lower-priority rows (virtual
    layout); identical to the block in lexlse.factorize_fast."""
    from .tri import solve_triu_right

    dtype = lod.dtype
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
    rel = jnp.clip(pos - first_col, 0, K - 1)
    L_full = Lm.take(rel, axis=1)
    store = jnp.concatenate(
        [(pos >= first_col) & (pos < col_index), jnp.zeros((1,), bool)])
    L_full = jnp.concatenate(
        [L_full, jnp.zeros((L_full.shape[0], 1), dtype)], axis=1)
    new_below = jnp.where(store[None, :], L_full, new_below)
    return lod.at[below_fr:, :].set(new_below)


def factorize_fast_batched(
    A: jax.Array,
    b: jax.Array,
    dims: Tuple[int, ...],
    params: ParametersLexLSE = ParametersLexLSE(),
    fixed_mask: Optional[jax.Array] = None,
    fixed_val: Optional[jax.Array] = None,
    *, use_pallas: bool = True, tile: int = 64, interpret: bool = False,
):
    """Batched l-QR: the level panels run as Pallas kernels, the
    inter-level Gauss elimination and final physicalization as XLA.

    ``A`` is (B, m, n), ``b`` (B, m).  Returns a batched
    :class:`lexls_tpu.lexlse.LexQR` (leading B on all array fields),
    numerically identical to ``vmap(lexlse.factorize_fast)``.
    """
    from .. import lexlse

    if params.regularization_type != RegularizationType.NONE:
        raise ValueError("factorize_fast_batched does not support regularization")
    B, m, n = A.shape
    dtype = A.dtype
    offsets = []
    ofs = 0
    for d in dims:
        offsets.append(ofs)
        ofs += d
    assert ofs == m

    if fixed_mask is None:
        fixed_mask = jnp.zeros((B, n), bool)
        fixed_val = jnp.zeros((B, n), dtype)
    fixed_val = jnp.where(fixed_mask, fixed_val, jnp.zeros((), dtype))
    A_work = jnp.where(fixed_mask[:, None, :], jnp.zeros((), dtype), A)
    rhs = b - jnp.einsum("bmn,bn->bm", A, fixed_val)
    lod = jnp.concatenate([A_work, rhs[:, :, None]], axis=2)

    hh = jnp.zeros((B, m), dtype)
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (B, n))
    col_at = pos
    rank_row = jnp.zeros((B, n), jnp.int32)
    col_index = jnp.zeros((B,), jnp.int32)
    tol = float(params.tol_linear_dependence)

    ranks = []
    first_cols = []

    for obj, (fr, dim) in enumerate(zip(offsets, dims)):
        first_col = col_index
        first_cols.append(first_col)
        if dim == 0:
            ranks.append(jnp.zeros((B,), jnp.int32))
            continue
        K = min(dim, n)

        block = lod[:, fr : fr + dim, :]
        block, pos, col_at, col_index, rank_row, hh_lvl = panel_factorize(
            block, pos, col_at, col_index, rank_row,
            fr=fr, tol=tol, tile=tile, use_pallas=use_pallas,
            interpret=interpret)
        lod = lod.at[:, fr : fr + dim, :].set(block)
        hh = lax.dynamic_update_slice_in_dim(hh, hh_lvl, fr, axis=1)

        rank = col_index - first_col
        ranks.append(rank)

        if obj < len(dims) - 1:
            lod = jax.vmap(
                functools.partial(_gauss_level, fr=fr, dim=dim, K=K, n=n)
            )(lod, pos, col_at, first_col, col_index, rank)

    # physicalize
    lod_phys = jax.vmap(
        lambda L, ca: jnp.concatenate([L[:, :n].take(ca, axis=1), L[:, n:]], axis=1)
    )(lod, col_at)

    return lexlse.LexQR(
        lod=lod_phys, hh=hh, perm=col_at, rank_row=rank_row,
        ranks=jnp.stack(ranks, axis=1),
        first_col=jnp.stack(first_cols, axis=1),
        total_rank=col_index, fixed_mask=fixed_mask, fixed_val=fixed_val,
        null_space=jnp.zeros((B, n, n + 1), dtype),
        X_mu=jnp.zeros((B, 0, 0), dtype), residual_mu=jnp.zeros((B, 0), dtype),
        reg_factors=jnp.zeros((B, 0), dtype),
        dims=tuple(dims), n_var=n,
    )
