"""Batched and mesh-sharded solving.

Design (SURVEY §2.4, §7.1): one ``vmap`` of the whole-solver
``while_loop`` gives batched solving with per-instance convergence —
converged instances no-op via predication until every instance's
termination condition holds, so batch cost is the max iteration count
over the batch.  ``shard_map`` over a ``Mesh`` axis shards the batch
across chips (ICI/DCN); the only cross-chip communication is the metric
reduction (max iterations / solved count), via ``psum``/``pmax``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..lexlsi import LexLSIState, Structure, initial_activation, solve_core
from ..types import InequalityHierarchy, ParametersLexLSI


def batched_initial_arrays(prob: InequalityHierarchy, batch: int, dtype=jnp.float64):
    """Initial (ctr_type, stamp, next_stamp, x0, v0) broadcast to a batch.

    The per-instance activation state is identical at cold start (EQ rows
    auto-activate); callers replace these with carried state for warm
    starts."""
    ctr0, stamp0, next0 = initial_activation(prob)
    return (
        jnp.broadcast_to(jnp.asarray(ctr0), (batch,) + ctr0.shape),
        jnp.broadcast_to(jnp.asarray(stamp0), (batch,) + stamp0.shape),
        jnp.broadcast_to(jnp.asarray(next0), (batch,)),
        jnp.zeros((batch, prob.n_var), dtype),
        jnp.zeros((batch, prob.n_ctr), dtype),
    )


@functools.partial(
    jax.jit,
    static_argnames=("struct", "params", "x_guess_specified", "v0_specified"),
)
def solve_batched(
    A, lb, ub, ctr_type0, stamp0, next_stamp0, x0, v0, reg,
    struct: Structure, params: ParametersLexLSI,
    x_guess_specified: bool = False, v0_specified: bool = False,
) -> LexLSIState:
    """``vmap`` of the whole solver over the leading batch axis.

    All array arguments carry a leading batch dimension except ``reg``
    (per-level regularization, shared)."""
    return jax.vmap(
        lambda a, l, u, c, s, ns, x, v: solve_core(
            a, l, u, c, s, ns, x, v, reg,
            struct=struct, params=params,
            x_guess_specified=x_guess_specified, v0_specified=v0_specified,
        )
    )(A, lb, ub, ctr_type0, stamp0, next_stamp0, x0, v0)


def _local_solver(struct, params, x_guess_specified, v0_specified,
                  mode, fused_kw):
    """Per-shard solve function shared by the 1-axis and 2-axis mesh
    builders: ``mode="xla"`` runs the vmapped general-tier solver,
    ``mode="fused"`` the whole-solve Pallas kernel, ``mode="tracked"``
    the carried-factorization tracker loop (batched MXU matmuls with a
    per-instance kernel fallback) — the round-3 throughput tier.
    BASELINE configs 4/5 ship the fast tiers through this path."""
    if mode == "fused":
        from ..lexlsi import solve_core_fused

        def run(A, lb, ub, c0, s0, n0, x0, v0, reg):
            return solve_core_fused(
                A, lb, ub, c0, s0, n0, x0, v0, reg,
                struct=struct, params=params,
                x_guess_specified=x_guess_specified,
                v0_specified=v0_specified, **fused_kw)
    elif mode == "tracked":
        from .. import tracker as trk

        def run(A, lb, ub, c0, s0, n0, x0, v0, reg):
            st, _ = trk.solve_core_cold_tracked(
                A, lb, ub, c0, s0, n0, x0, v0,
                struct=struct, params=params,
                x_guess_specified=x_guess_specified,
                v0_specified=v0_specified, reg=reg, **fused_kw)
            return st
    elif mode == "xla":
        def run(A, lb, ub, c0, s0, n0, x0, v0, reg):
            return solve_batched(
                A, lb, ub, c0, s0, n0, x0, v0, reg,
                struct=struct, params=params,
                x_guess_specified=x_guess_specified,
                v0_specified=v0_specified)
    else:
        raise ValueError(f"unknown mode {mode!r} (use 'xla' or 'fused')")
    return run


def make_sharded_solver(
    mesh: Mesh,
    struct: Structure,
    params: ParametersLexLSI,
    axis: str = "batch",
    x_guess_specified: bool = False,
    v0_specified: bool = False,
    mode: str = "xla",
    **fused_kw,
):
    """Build a jitted multi-chip solver over ``mesh``.

    The batch axis of every per-instance array is sharded over ``axis``;
    each chip runs the batched solver on its local shard (zero cross-chip
    communication in the solve itself), then global summary metrics are
    reduced over ICI with ``psum``/``pmax``.  ``mode="fused"`` runs the
    whole-solve Pallas kernel per shard (extra keyword arguments — tile,
    compact, vmem_limit_mb, interpret — are forwarded to
    :func:`lexls_tpu.lexlsi.solve_core_fused`); the per-shard batch must
    then be divisible by the kernel tile.

    Returns ``fn(A, lb, ub, ctr0, stamp0, next0, x0, v0, reg) ->
    (state, metrics)`` where ``metrics = {"solved": global count,
    "max_iterations": global max, "sum_iterations": global sum}``.
    """
    shard_map = jax.shard_map

    spec = P(axis)
    run = _local_solver(struct, params, x_guess_specified, v0_specified,
                        mode, fused_kw)

    def local_solve(A, lb, ub, c0, s0, n0, x0, v0, reg):
        st = run(A, lb, ub, c0, s0, n0, x0, v0, reg)
        solved = jax.lax.psum(jnp.sum(st.status == 0).astype(jnp.int32), axis)
        max_it = jax.lax.pmax(jnp.max(st.it), axis)
        sum_it = jax.lax.psum(jnp.sum(st.it).astype(jnp.int32), axis)
        return st, {"solved": solved, "max_iterations": max_it,
                    "sum_iterations": sum_it}

    sharded = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(spec,) * 8 + (P(),),
        out_specs=(
            jax.tree_util.tree_map(lambda _: spec, _state_structure(struct, params)),
            {"solved": P(), "max_iterations": P(), "sum_iterations": P()},
        ),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_host_mesh(n_hosts: int, chips_per_host: int,
                   devices: Optional[np.ndarray] = None) -> Mesh:
    """A 2-axis ("dcn", "ici") mesh for multi-host batch sharding.

    The batch axis is sharded over both axes (hosts outermost), so each
    chip owns B/(n_hosts*chips_per_host) instances; the solve itself
    communicates nothing, and the metric reductions ride ICI within a
    host before crossing DCN (XLA orders the collective accordingly when
    the axis tuple is ("dcn", "ici")).

    Multi-process recipe (a real pod slice, one process per host)::

        jax.distributed.initialize()   # coordinator from TPU metadata
        mesh = make_host_mesh(jax.process_count(),
                              jax.local_device_count())
        fn = make_sharded_solver_2d(mesh, struct, params)
        # feed per-process shards via jax.make_array_from_process_local_data

    In a multi-process run ``jax.devices()`` spans every host and
    ``mesh_utils.create_hybrid_device_mesh`` places the "dcn" axis
    across hosts (DCN) and "ici" within each (ICI ring); single-process
    callers (tests, the virtual-CPU dryrun) get the same logical layout
    from ``create_device_mesh`` over local devices.
    """
    from jax.experimental import mesh_utils

    n = n_hosts * chips_per_host
    if devices is not None:
        dev_grid = np.asarray(devices).reshape(n_hosts, chips_per_host)
    elif jax.process_count() > 1:
        try:
            dev_grid = mesh_utils.create_hybrid_device_mesh(
                (1, chips_per_host), (n_hosts, 1),
                devices=jax.devices()[:n])
        except ValueError:
            # CPU (and some TPU topologies) expose no slice_index —
            # group by owning process instead: rows = hosts, cols = the
            # process's local devices (the DCN boundary is the process)
            devs = sorted(jax.devices()[:n],
                          key=lambda d: (d.process_index, d.id))
            dev_grid = np.asarray(devs).reshape(n_hosts, chips_per_host)
    else:
        dev_grid = mesh_utils.create_device_mesh(
            (n_hosts, chips_per_host), devices=jax.devices()[:n],
            contiguous_submeshes=False)
    return Mesh(dev_grid, ("dcn", "ici"))


def make_sharded_solver_2d(
    mesh: Mesh,
    struct: Structure,
    params: ParametersLexLSI,
    x_guess_specified: bool = False,
    v0_specified: bool = False,
    mode: str = "xla",
    **fused_kw,
):
    """Multi-host variant of :func:`make_sharded_solver`: the batch axis
    is sharded over both mesh axes (("dcn", "ici") from
    :func:`make_host_mesh`); metrics reduce over both.  ``mode="fused"``
    runs the whole-solve Pallas kernel per shard."""
    shard_map = jax.shard_map
    axes = tuple(mesh.axis_names)
    spec = P(axes)
    run = _local_solver(struct, params, x_guess_specified, v0_specified,
                        mode, fused_kw)

    def local_solve(A, lb, ub, c0, s0, n0, x0, v0, reg):
        st = run(A, lb, ub, c0, s0, n0, x0, v0, reg)
        solved = jax.lax.psum(jnp.sum(st.status == 0).astype(jnp.int32), axes)
        max_it = jax.lax.pmax(jnp.max(st.it), axes)
        sum_it = jax.lax.psum(jnp.sum(st.it).astype(jnp.int32), axes)
        return st, {"solved": solved, "max_iterations": max_it,
                    "sum_iterations": sum_it}

    sharded = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(spec,) * 8 + (P(),),
        out_specs=(
            jax.tree_util.tree_map(lambda _: spec, _state_structure(struct, params)),
            {"solved": P(), "max_iterations": P(), "sum_iterations": P()},
        ),
        check_vma=False,
    )
    return jax.jit(sharded)


def _state_structure(struct: Structure, params: ParametersLexLSI):
    """A pytree with the same structure as LexLSIState (values unused —
    only the treedef matters for building out_specs)."""
    return LexLSIState(
        x=0, v=0, dx=0, dv=0, Ax=0, Adx=0,
        ctr_type=0, stamp=0, next_stamp=0, lb=0, ub=0,
        it=0, n_act=0, n_deact=0, n_fact=0, status=0,
        cyc_counter=0, cyc_prev_op=0, cyc_prev_row=0, cyc_prev_type=0,
        log_obj=0, log_ctr=0, log_type=0, log_value=0, log_rank=0,
        log_cycling=0, log_len=0, log_overflow=0,
        trace_x=0, trace_v=0, trace_dx=0, trace_dv=0, trace_alpha=0,
        trace_op=0, trace_row=0,
    )
