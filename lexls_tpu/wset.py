"""Working-set log replay (reference ``tests/implementation/wset/*.m``).

The working-set log records every activation/deactivation the solver
performed.  These tools reconstruct the working set as it stood at any
iteration and re-solve the equality subproblem with it pinned — the
reference's debugging workflow for inspecting active-set trajectories
(``wset_get.m`` / ``wset_solve.m``).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .lexlsi import Structure, initial_activation
from .types import CtrType, InequalityHierarchy


def replay_working_set(
    prob: InequalityHierarchy,
    working_set_log: List,
    upto: Optional[int] = None,
) -> np.ndarray:
    """Reconstruct the per-row activation types after the first ``upto``
    log entries (all entries if None), starting from the data-set-time
    state (equalities auto-active).  Log entries with
    ``ctr_type == INACTIVE`` are removals; others are additions."""
    struct = Structure.of(prob)
    ctr_type, _, _ = initial_activation(prob)
    ctr_type = ctr_type.copy()
    entries = working_set_log if upto is None else working_set_log[:upto]
    for e in entries:
        row = struct.first_row[e.obj_index] + e.ctr_index
        if e.ctr_type == int(CtrType.INACTIVE):
            ctr_type[row] = int(CtrType.INACTIVE)
        else:
            ctr_type[row] = e.ctr_type
    return ctr_type


def solve_with_working_set(
    prob: InequalityHierarchy,
    ctr_type: np.ndarray,
    params=None,
    dtype=None,
):
    """Solve the equality subproblem with the given working set pinned
    (``wset_solve.m``): every active row becomes an equality at its
    active bound; inactive rows are dropped (masked).  Returns (x, v)
    with v the signed violation of the *active* rows."""
    import jax.numpy as jnp

    from . import lexlse
    from .lexlsi import _factorize
    from .types import ParametersLexLSI

    params = params or ParametersLexLSI()
    struct = Structure.of(prob)
    if dtype is None:
        dtype = jnp.float64 if jnp.zeros(()).dtype == jnp.float64 else jnp.float32
    f = _factorize(
        jnp.asarray(prob.A, dtype), jnp.asarray(prob.lb, dtype),
        jnp.asarray(prob.ub, dtype), jnp.asarray(ctr_type.astype(np.int32)),
        struct, params, jnp.asarray(prob.regularization, dtype))
    x = np.asarray(lexlse.solve(f))
    Ax = prob.A @ x
    rhs = np.where(ctr_type == int(CtrType.ACTIVE_LB), prob.lb, prob.ub)
    active = ctr_type != int(CtrType.INACTIVE)
    v = np.where(active, Ax - rhs, 0.0)
    return x, v
