"""Throughput benchmark: warm-started lexicographic hierarchy solves/s.

North-star config (BASELINE.json): 100-variable, 4-level inequality
hierarchies, warm-started IK-sequence style — batch of B independent
instances, each warm-started from the previous (perturbed) solve.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: 1e5 warm-started solves/s per chip (the reference publishes
no numbers; this is the driver's north star).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_SOLVES_PER_S = 1.0e5


def main():
    import lexls_tpu.lexlsi as jli
    from lexls_tpu.oracle import generate as gen
    from lexls_tpu.parallel import batched_initial_arrays, solve_batched
    from lexls_tpu.sequence import _device_initial_activation
    from lexls_tpu.types import ParametersLexLSI

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    dtype = jnp.float32

    # north-star problem shape; scale batch down on CPU so the benchmark
    # terminates quickly in local runs
    n_var, dims = 100, (30, 30, 30, 30)
    B = 1024 if on_tpu else 32
    reps = 5 if on_tpu else 2

    params = ParametersLexLSI(
        max_number_of_factorizations=32,
        tol_linear_dependence=1e-7,
        tol_wrong_sign_lambda=1e-4,
        tol_correct_sign_lambda=1e-6,
        tol_feasibility=1e-5,
    )

    rng = np.random.default_rng(0)
    prob = gen.random_inequality_hierarchy(
        rng, n_var, list(dims), equality_fraction=0.1, tight_fraction=0.3)
    struct = jli.Structure.of(prob)
    m = prob.n_ctr

    As = jnp.asarray(
        np.stack([prob.A + 1e-3 * rng.standard_normal(prob.A.shape)
                  for _ in range(B)]), dtype)
    lbs = jnp.broadcast_to(jnp.asarray(prob.lb, dtype), (B, m))
    ubs = jnp.broadcast_to(jnp.asarray(prob.ub, dtype), (B, m))
    reg = jnp.asarray(prob.regularization, dtype)

    # ---- cold solve (also jit warm-up)
    c0, s0, n0, x0, v0 = batched_initial_arrays(prob, B, dtype)
    cold = solve_batched(As, lbs, ubs, c0, s0, n0, x0, v0, reg,
                         struct=struct, params=params)
    jax.block_until_ready(cold.x)

    # ---- warm step: restart from previous {x, active set} on a perturbed A
    act_init = jax.jit(jax.vmap(
        lambda A, lb, ub, g: _device_initial_activation(A, lb, ub, g, struct)))

    def warm(As_t, x_prev, ct_prev):
        c, s, ns = act_init(As_t, lbs, ubs, ct_prev)
        return solve_batched(As_t, lbs, ubs, c, s, ns, x_prev, v0, reg,
                             struct=struct, params=params,
                             x_guess_specified=True)

    dAs = [jnp.asarray(
        np.stack([1e-3 * rng.standard_normal(prob.A.shape) for _ in range(B)]),
        dtype) for _ in range(reps)]

    # warm-up compile of the warm path
    st = warm(As + dAs[0], cold.x, cold.ctr_type)
    jax.block_until_ready(st.x)

    x, ct = cold.x, cold.ctr_type
    t0 = time.perf_counter()
    for r in range(reps):
        st = warm(As + dAs[r], x, ct)
        x, ct = st.x, st.ctr_type
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0

    solves = B * reps
    rate = solves / dt
    mean_it = float(jnp.mean(st.it))
    solved = int(jnp.sum(st.status == 0))

    print(json.dumps({
        "metric": "warm_start_solves_per_s",
        "value": round(rate, 2),
        "unit": "solves/s",
        "vs_baseline": round(rate / BASELINE_SOLVES_PER_S, 4),
    }))
    print(f"# device={dev.platform} B={B} reps={reps} n={n_var} dims={dims} "
          f"solved={solved}/{B} mean_warm_iters={mean_it:.2f} dt={dt:.3f}s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
