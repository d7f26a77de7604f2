"""Search for a deterministic cycling fixture (VERDICT r4 item 4).

The in-kernel cycling relaxation (`ops/fused.py`) needs an executed
parity test, but random hierarchies essentially never cycle at f64
(the round-4 test swept 60 seeds and skipped).  Cycling needs a
REMOVE(row, type) immediately followed by ADD(same row, same type)
(`cycling.h:32-65`), which requires engineered degeneracy.  This tool
batch-searches structured families — ONE compiled shape, thousands of
instances per solve — over:

  * near-duplicate constraint rows (degenerate vertices),
  * tied/tight bounds,
  * adversarial warm-start working sets (random ACTIVE_LB/UB guesses),

and prints exact reproduction recipes (family seed + index) for
instances whose XLA-tier solve reports cyc_counter > 0.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import lexls_tpu.lexlsi as jli  # noqa: E402
from lexls_tpu import types as T  # noqa: E402
from lexls_tpu.oracle import generate as gen  # noqa: E402
from lexls_tpu.parallel import solve_batched  # noqa: E402
from lexls_tpu.sequence import _device_initial_activation  # noqa: E402


def build_batch(rng, B, n, dims, dup_frac=0.6, tie_frac=0.6,
                rank_deficient=False, zero_bounds=False):
    """B structured-degenerate instances of one fixed shape."""
    m = sum(dims)
    As = np.empty((B, m, n))
    lbs = np.empty((B, m))
    ubs = np.empty((B, m))
    guesses = np.zeros((B, m), np.int32)
    for b in range(B):
        ranks = None
        if rank_deficient:
            ranks = [max(1, int(rng.integers(1, d + 1)) - 1) for d in dims]
        prob = gen.random_inequality_hierarchy(
            rng, n, list(dims), ranks=ranks, equality_fraction=0.15,
            tight_fraction=0.9)
        A, lb, ub = prob.A.copy(), prob.lb.copy(), prob.ub.copy()
        # near-duplicate rows: i -> j with tiny perturbation
        if rng.random() < dup_frac:
            i, j = rng.choice(m, size=2, replace=False)
            eps = 10.0 ** rng.integers(-12, -5)
            A[j] = A[i] * (1.0 + eps * rng.standard_normal())
            if rng.random() < 0.7:
                lb[j], ub[j] = lb[i], ub[i]
        # tied bounds: make an interval width ~0 (but not an equality)
        if rng.random() < tie_frac:
            k = rng.integers(m)
            w = 10.0 ** rng.integers(-12, -6)
            c = 0.5 * (lb[k] + ub[k])
            lb[k], ub[k] = c - w, c + w
        if zero_bounds:
            # degenerate vertex at the origin: a subset of rows gets a
            # bound EXACTLY 0 on one side (x lingers on it when x0 = 0)
            for k in np.nonzero(rng.random(m) < 0.5)[0]:
                if rng.random() < 0.5:
                    lb[k], ub[k] = 0.0, abs(ub[k])
                else:
                    lb[k], ub[k] = -abs(lb[k]), 0.0
        # adversarial warm guesses
        n_g = rng.integers(0, m + 1)
        rows = rng.choice(m, size=n_g, replace=False)
        for r in rows:
            guesses[b, r] = int(T.CtrType.ACTIVE_LB if rng.random() < 0.5
                                else T.CtrType.ACTIVE_UB)
        As[b], lbs[b], ubs[b] = A, lb, ub
    return As, lbs, ubs, guesses


def main():
    n, dims = 4, (2, 3)
    B = 512
    found = 0
    for fam_seed in range(12):
        for rank_def, zero_b in ((False, False), (True, False),
                                 (True, True), (False, True)):
            rng = np.random.default_rng(77000 + fam_seed)
            As, lbs, ubs, guesses = build_batch(
                rng, B, n, dims, rank_deficient=rank_def,
                zero_bounds=zero_b)
            prob0 = gen.random_inequality_hierarchy(
                np.random.default_rng(0), n, list(dims))
            struct = jli.Structure.of(prob0)
            for wrong_tol, deact_first in ((1e-4, False), (1e-4, True),
                                           (1e-12, False)):
                params = T.ParametersLexLSI(
                    max_number_of_factorizations=60,
                    cycling_handling_enabled=True,
                    log_working_set_enabled=True,
                    tol_wrong_sign_lambda=wrong_tol,
                    deactivate_first_wrong_sign=deact_first)
                act = jax.vmap(
                    lambda a, l, u, g: _device_initial_activation(
                        a, l, u, g, struct))
                c0, s0, n0 = act(jnp.asarray(As), jnp.asarray(lbs),
                                 jnp.asarray(ubs), jnp.asarray(guesses))
                st = solve_batched(
                    jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
                    c0, s0, n0, jnp.zeros((B, n)),
                    jnp.zeros((B, sum(dims))),
                    jnp.zeros((len(dims),)), struct=struct, params=params)
                cc = np.asarray(st.cyc_counter)
                hits = np.nonzero(cc > 0)[0]
                if len(hits):
                    found += len(hits)
                    print(f"fam_seed={fam_seed} rank_def={rank_def} "
                          f"zero_b={zero_b} wrong_tol={wrong_tol} "
                          f"deact_first={deact_first} hits={hits[:10]} "
                          f"counters={cc[hits[:10]]} "
                          f"status={np.asarray(st.status)[hits[:10]]}")
    print(f"done found={found}")


if __name__ == "__main__":
    main()
