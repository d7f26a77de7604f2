"""Batch and multi-chip parallelism for lexls_tpu.

The reference is a single-threaded C++ library (SURVEY §2.4: no
parallelism of any kind exists there).  The TPU-native scaling story is
batch parallelism over independent hierarchy instances: ``vmap`` of the
whole solver per chip, ``shard_map`` over a device mesh for a pod slice,
with collectives used only for metric reductions (instances are
embarrassingly parallel).
"""

from .batch import (
    batched_initial_arrays,
    make_host_mesh,
    make_sharded_solver,
    make_sharded_solver_2d,
    solve_batched,
)

__all__ = [
    "batched_initial_arrays",
    "make_host_mesh",
    "make_sharded_solver",
    "make_sharded_solver_2d",
    "solve_batched",
]
