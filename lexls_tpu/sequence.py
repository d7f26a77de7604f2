"""Warm-started sequences of related problems (the IK-sequence loop).

The reference's design point is "sequences of inverse-kinematics
problems with few active-set changes" (``README.md:14``): the user
feeds the final active set (``getActiveCtr``) and solution of solve *k*
into ``api_activate``/``set_x0`` of solve *k+1* (checkpoint/resume ≙
warm start, SURVEY §5).  Here that loop runs **on device** as a
``lax.scan`` over problem instances — the warm-start state {x, final
activation types, stamps} is the scan carry, so a whole sequence runs
in one XLA computation without host round-trips.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .lexlsi import Structure, solve_core
from .types import CtrType, ParametersLexLSI


def _device_initial_activation(A, lb, ub, guess_type, struct: Structure):
    """On-device equivalent of :func:`lexls_tpu.lexlsi.initial_activation`:
    equality rows (lb == ub, nonzero normal; simple-bounds rows always)
    auto-activate first in row order, then the LB/UB guess rows in row
    order (EQ is not user-settable: a guessed row that became an equality
    is EQ, a guessed EQ row whose bounds split reverts to inactive)."""
    m = struct.m
    eq = jnp.abs(lb - ub) < 1e-15
    nonzero = jnp.sum(A * A, axis=1) > 0
    is_bound_row = jnp.zeros((m,), bool).at[: struct.d0].set(struct.simple_bounds)
    eq = eq & (nonzero | is_bound_row)

    guess_ok = (guess_type == int(CtrType.ACTIVE_LB)) | (
        guess_type == int(CtrType.ACTIVE_UB)
    )
    ctr = jnp.where(eq, int(CtrType.ACTIVE_EQ),
                    jnp.where(guess_ok, guess_type, int(CtrType.INACTIVE)))
    ctr = ctr.astype(jnp.int32)

    n_eq = jnp.sum(eq).astype(jnp.int32)
    eq_order = (jnp.cumsum(eq.astype(jnp.int32)) - 1).astype(jnp.int32)
    g = guess_ok & jnp.logical_not(eq)
    g_order = (jnp.cumsum(g.astype(jnp.int32)) - 1).astype(jnp.int32)
    stamp = jnp.where(eq, eq_order, jnp.where(g, n_eq + g_order, -1))
    next_stamp = n_eq + jnp.sum(g).astype(jnp.int32)
    return ctr, stamp, next_stamp


@functools.partial(jax.jit, static_argnames=("struct", "params"))
def solve_sequence(
    A_seq, lb_seq, ub_seq, reg,
    struct: Structure, params: ParametersLexLSI,
):
    """Solve a sequence of hierarchies with on-device warm starting.

    ``A_seq`` is (T, m, n); ``lb_seq``/``ub_seq`` are (T, m).  Step 0 is
    a cold solve; step t>0 starts from step t-1's solution and active
    set.  Returns stacked per-step (x (T, n), v (T, m), status (T,),
    iterations (T,), factorizations (T,), ctr_type (T, m)).
    """
    dtype = A_seq.dtype
    m, n = struct.m, struct.n_var

    # --- step 0: cold start
    c0, s0, n0 = _device_initial_activation(
        A_seq[0], lb_seq[0], ub_seq[0],
        jnp.zeros((m,), jnp.int32), struct)
    st0 = solve_core(
        A_seq[0], lb_seq[0], ub_seq[0], c0, s0, n0,
        jnp.zeros((n,), dtype), jnp.zeros((m,), dtype), reg,
        struct=struct, params=params,
        x_guess_specified=False, v0_specified=False,
    )

    def step(carry, inputs):
        x_prev, ctr_prev = carry
        A, lb, ub = inputs
        c, s, ns = _device_initial_activation(A, lb, ub, ctr_prev, struct)
        st = solve_core(
            A, lb, ub, c, s, ns, x_prev, jnp.zeros((m,), dtype), reg,
            struct=struct, params=params,
            x_guess_specified=True, v0_specified=False,
        )
        out = (st.x, st.v, st.status, st.it, st.n_fact, st.ctr_type)
        return (st.x, st.ctr_type), out

    (_, _), outs = lax.scan(
        step, (st0.x, st0.ctr_type),
        (A_seq[1:], lb_seq[1:], ub_seq[1:]),
    )

    cat = lambda a, b: jnp.concatenate([a[None], b], axis=0)  # noqa: E731
    return (
        cat(st0.x, outs[0]), cat(st0.v, outs[1]), cat(st0.status, outs[2]),
        cat(st0.it, outs[3]), cat(st0.n_fact, outs[4]), cat(st0.ctr_type, outs[5]),
    )


@functools.partial(jax.jit, static_argnames=("struct", "params"))
def solve_sequence_batched(
    A_seq, lb_seq, ub_seq, reg,
    struct: Structure, params: ParametersLexLSI,
):
    """``vmap`` of :func:`solve_sequence` over a leading batch axis:
    ``A_seq`` is (B, T, m, n).  This is the throughput benchmark shape —
    B independent IK sequences per chip, each warm-started internally."""
    return jax.vmap(
        lambda a, l, u: solve_sequence(a, l, u, reg, struct=struct, params=params)
    )(A_seq, lb_seq, ub_seq)


@functools.partial(jax.jit, static_argnames=("struct", "params", "use_pallas"))
def solve_sequence_batched_native(
    A_seq, lb_seq, ub_seq, reg,
    struct: Structure, params: ParametersLexLSI, use_pallas: bool = True,
):
    """Batched warm-started sequences through the natively-batched solver
    (:func:`lexls_tpu.lexlsi.solve_core_batched`, Pallas panel kernels).

    ``A_seq`` is (B, T, m, n).  Same outputs as
    :func:`solve_sequence_batched` (each stacked (B, T, ...))."""
    from .lexlsi import solve_core_batched

    B, T = A_seq.shape[:2]
    dtype = A_seq.dtype
    m, n = struct.m, struct.n_var

    act = jax.vmap(
        lambda a, l, u, g: _device_initial_activation(a, l, u, g, struct))

    c0, s0, n0 = act(A_seq[:, 0], lb_seq[:, 0], ub_seq[:, 0],
                     jnp.zeros((B, m), jnp.int32))
    st0 = solve_core_batched(
        A_seq[:, 0], lb_seq[:, 0], ub_seq[:, 0], c0, s0, n0,
        jnp.zeros((B, n), dtype), jnp.zeros((B, m), dtype), reg,
        struct=struct, params=params,
        x_guess_specified=False, v0_specified=False, use_pallas=use_pallas)

    def step(carry, inputs):
        x_prev, ct_prev = carry
        A, lb, ub = inputs
        c, s, ns = act(A, lb, ub, ct_prev)
        st = solve_core_batched(
            A, lb, ub, c, s, ns, x_prev, jnp.zeros((B, m), dtype), reg,
            struct=struct, params=params,
            x_guess_specified=True, v0_specified=False, use_pallas=use_pallas)
        out = (st.x, st.v, st.status, st.it, st.n_fact, st.ctr_type)
        return (st.x, st.ctr_type), out

    xs_in = (jnp.swapaxes(A_seq[:, 1:], 0, 1),
             jnp.swapaxes(lb_seq[:, 1:], 0, 1),
             jnp.swapaxes(ub_seq[:, 1:], 0, 1))
    (_, _), outs = lax.scan(step, (st0.x, st0.ctr_type), xs_in)

    def cat(a, b):  # b is (T-1, B, ...) -> (B, T, ...)
        return jnp.concatenate([a[:, None], jnp.swapaxes(b, 0, 1)], axis=1)

    return (
        cat(st0.x, outs[0]), cat(st0.v, outs[1]), cat(st0.status, outs[2]),
        cat(st0.it, outs[3]), cat(st0.n_fact, outs[4]), cat(st0.ctr_type, outs[5]),
    )


@functools.partial(jax.jit, static_argnames=(
    "struct", "params", "tile", "interpret", "vmem_limit_mb", "compact",
    "tile_b", "compact_rounds", "tracked", "ns_iters", "cert_tol",
    "loop_cap", "shrink", "handover_slab", "trip1_noext"))
def solve_sequence_batched_fused(
    A_seq, lb_seq, ub_seq, reg,
    struct: Structure, params: ParametersLexLSI,
    tile: int = 64, interpret: bool = False, vmem_limit_mb: int = 100,
    compact: int = 1, tile_b: int = 0, compact_rounds: int = 1,
    tracked: bool = False,
    ns_iters: int = 2, cert_tol: float = None, loop_cap: int = 0,
    shrink: tuple = (), handover_slab: int = 0,
    trip1_noext: bool = False,
):
    """Batched warm-started sequences through the fused whole-solve
    Pallas kernel (the throughput tier the bench measures), as a library
    API: ``A_seq`` is (B, T, m, n), step 0 solves cold, steps t>0 warm
    start from step t-1's {x, active set}.

    ``tracked=True`` additionally carries the final factorization across
    steps and runs iteration 0 of each warm solve on the MXU with the
    carried pivot order (:mod:`lexls_tpu.tracker`), falling back to the
    kernel per instance — exceeds the reference's capability (no
    factorization reuse, ``README.md:14``); x/v parity is preserved,
    trajectories may differ on rejected carries.  The tracker knobs
    ``ns_iters``/``cert_tol``/``loop_cap``/``shrink`` are forwarded to
    :func:`lexls_tpu.tracker.solve_core_tracked`; ``cert_tol=None``
    resolves dtype-aware (1e-3 at f32, 1e-9 at f64 — the accepted-carry
    accuracy contract, :func:`lexls_tpu.tracker.default_cert_tol`).
    Measured-best throughput config on the north-star workload (TPU
    v5e, round-5 CLEAN sequential re-measurement, docs/performance.md):
    ``loop_cap=1, ns_iters=2, trip1_noext=True`` — one extension-free
    tracker trip, kernel tail (55.5K solves/s at B=384 vs 37.6K for
    the unbounded default).  ``trip1_noext`` skips the greedy-extension
    block on the no-change trip; drift-induced rank growth then
    finishes in the exact kernel instead of being absorbed (identical
    results, fewer sequential ops — conservative default False here).

    Same outputs as :func:`solve_sequence_batched` (each (B, T, ...)).
    """
    from .lexlsi import solve_core_fused
    from . import tracker as trk

    B, T = A_seq.shape[:2]
    dtype = A_seq.dtype
    m, n = struct.m, struct.n_var
    kw = dict(struct=struct, params=params, tile=tile, interpret=interpret,
              vmem_limit_mb=vmem_limit_mb, compact=compact, tile_b=tile_b,
              compact_rounds=compact_rounds)
    tkw = dict(kw, ns_iters=ns_iters, cert_tol=cert_tol)

    act = jax.vmap(
        lambda a, l, u, g: _device_initial_activation(a, l, u, g, struct))

    c0, s0, n0 = act(A_seq[:, 0], lb_seq[:, 0], ub_seq[:, 0],
                     jnp.zeros((B, m), jnp.int32))
    if tracked:
        # cold start through the tracker loop as well: one exact kernel
        # iteration, then batched-matmul iterations
        st0, carried0 = trk.solve_core_cold_tracked(
            A_seq[:, 0], lb_seq[:, 0], ub_seq[:, 0], c0, s0, n0,
            jnp.zeros((B, n), dtype), jnp.zeros((B, m), dtype),
            x_guess_specified=False, v0_specified=False, **tkw)
    else:
        st0, factors0 = solve_core_fused(
            A_seq[:, 0], lb_seq[:, 0], ub_seq[:, 0], c0, s0, n0,
            jnp.zeros((B, n), dtype), jnp.zeros((B, m), dtype), reg,
            x_guess_specified=False, v0_specified=False,
            return_factors=True, **kw)
        carried0 = trk.bootstrap_carried(factors0)

    def step(carry, inputs):
        x_prev, ct_prev, carried = carry
        A, lb, ub = inputs
        c, s, ns = act(A, lb, ub, ct_prev)
        if tracked:
            st, carried = trk.solve_core_tracked(
                A, lb, ub, c, s, ns, x_prev, jnp.zeros((B, m), dtype),
                carried=carried, loop_cap=loop_cap, shrink=shrink,
                handover_slab=handover_slab, trip1_noext=trip1_noext,
                **tkw)
        else:
            st = solve_core_fused(
                A, lb, ub, c, s, ns, x_prev, jnp.zeros((B, m), dtype), reg,
                x_guess_specified=True, v0_specified=False, **kw)
        out = (st.x, st.v, st.status, st.it, st.n_fact, st.ctr_type)
        return (st.x, st.ctr_type, carried), out

    xs_in = (jnp.swapaxes(A_seq[:, 1:], 0, 1),
             jnp.swapaxes(lb_seq[:, 1:], 0, 1),
             jnp.swapaxes(ub_seq[:, 1:], 0, 1))
    _, outs = lax.scan(step, (st0.x, st0.ctr_type, carried0), xs_in)

    def cat(a, b):  # b is (T-1, B, ...) -> (B, T, ...)
        return jnp.concatenate([a[:, None], jnp.swapaxes(b, 0, 1)], axis=1)

    return (
        cat(st0.x, outs[0]), cat(st0.v, outs[1]), cat(st0.status, outs[2]),
        cat(st0.it, outs[3]), cat(st0.n_fact, outs[4]), cat(st0.ctr_type, outs[5]),
    )


def make_sharded_sequence_solver(
    mesh,
    struct: Structure,
    params: ParametersLexLSI,
    mode: str = "xla",
    **fused_kw,
):
    """Warm-started sequences sharded over a device mesh: the full
    composition of BASELINE config 4 (IK sequence) with config 5 (pod
    batch).  The sequence-batch axis of ``A_seq`` (B, T, m, n) is
    sharded over every mesh axis; each chip scans its local sequences
    (``solve_sequence_batched`` for ``mode="xla"``,
    :func:`solve_sequence_batched_fused` for ``mode="fused"`` /
    ``"tracked"`` — the throughput tiers), and only the summary metrics
    cross chips (``psum``/``pmax`` over ICI/DCN).

    Returns ``fn(A_seq, lb_seq, ub_seq, reg) -> (outs, metrics)`` with
    ``outs`` the 6-tuple of (B, T, ...) arrays of
    :func:`solve_sequence_batched` and ``metrics = {"solved",
    "max_iterations", "sum_iterations"}`` aggregated over every solve of
    every sequence on every chip.
    """
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)
    spec = P(axes if len(axes) > 1 else axes[0])

    def local(A_seq, lb_seq, ub_seq, reg):
        if mode == "xla":
            outs = solve_sequence_batched(
                A_seq, lb_seq, ub_seq, reg, struct=struct, params=params)
        elif mode in ("fused", "tracked"):
            outs = solve_sequence_batched_fused(
                A_seq, lb_seq, ub_seq, reg, struct=struct, params=params,
                tracked=(mode == "tracked"), **fused_kw)
        else:
            raise ValueError(
                f"unknown mode {mode!r} (use 'xla', 'fused' or 'tracked')")
        status, it = outs[2], outs[3]
        solved = jax.lax.psum(jnp.sum(status == 0).astype(jnp.int32), axes)
        max_it = jax.lax.pmax(jnp.max(it), axes)
        sum_it = jax.lax.psum(jnp.sum(it).astype(jnp.int32), axes)
        return outs, {"solved": solved, "max_iterations": max_it,
                      "sum_iterations": sum_it}

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=((spec,) * 6,
                   {"solved": P(), "max_iterations": P(),
                    "sum_iterations": P()}),
        check_vma=False,
    )
    return jax.jit(sharded)
