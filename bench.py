"""Throughput benchmark: warm-started lexicographic hierarchy solves/s.

North-star config (BASELINE.json): 100-variable, 4-level inequality
hierarchies, warm-started IK-sequence style — a batch of B independent
instances, each warm-started from the previous (perturbed) solve.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology
  * one cold solve with a large iteration budget (the cold active set of
    this problem family has ~100 active constraints and needs ~200
    active-set iterations) — excluded from timing;
  * timed phase: R repetitions of {perturb A by 1e-3, warm solve from
    the previous {x, active set}}; each rep is blocked on before the
    clock stops; median rep time is used;
  * warm solves run with a small iteration budget (warm iterations are
    1-3 at this perturbation size; a straggler in the batch costs every
    instance, so the budget caps the batch tail).

Baseline: 1e5 warm-started solves/s per chip (the reference publishes
no numbers; this is the driver's north star).
"""

import json
import os
import statistics
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

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

    n_var, dims = 100, (30, 30, 30, 30)
    B = int(os.environ.get("LEXLS_BENCH_B", 512 if on_tpu else 16))
    reps = int(os.environ.get("LEXLS_BENCH_REPS", 7 if on_tpu else 2))

    tols = dict(tol_linear_dependence=1e-7, tol_wrong_sign_lambda=1e-4,
                tol_correct_sign_lambda=1e-6, tol_feasibility=1e-5)
    params_cold = ParametersLexLSI(max_number_of_factorizations=250, **tols)
    params_warm = ParametersLexLSI(max_number_of_factorizations=8, **tols)

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

    # ---- cold solve (excluded from timing)
    c0, s0, n0, x0, v0 = batched_initial_arrays(prob, B, dtype)
    t0 = time.perf_counter()
    cold = solve_batched(As, lbs, ubs, c0, s0, n0, x0, v0, reg,
                         struct=struct, params=params_cold)
    jax.block_until_ready(cold.x)
    cold_s = time.perf_counter() - t0
    cold_solved = int(jnp.sum(cold.status == 0))

    # ---- warm step: restart from previous {x, active set} on perturbed A
    act_init = jax.jit(jax.vmap(
        lambda A, lb, ub, g: _device_initial_activation(A, lb, ub, g, struct)))

    def warm(As_t, x_prev, ct_prev):
        c, s, ns = act_init(As_t, lbs, ubs, ct_prev)
        return solve_batched(As_t, lbs, ubs, c, s, ns, x_prev, v0, reg,
                             struct=struct, params=params_warm,
                             x_guess_specified=True)

    dAs = [jnp.asarray(
        np.stack([1e-3 * rng.standard_normal(prob.A.shape) for _ in range(B)]),
        dtype) for _ in range(reps + 1)]

    # compile warm path (excluded from timing)
    st = warm(As + dAs[0], cold.x, cold.ctr_type)
    jax.block_until_ready(st.x)

    times = []
    solved = []
    iters = []
    x, ct = st.x, st.ctr_type
    for r in range(reps):
        t0 = time.perf_counter()
        st = warm(As + dAs[r + 1], x, ct)
        jax.block_until_ready(st.x)
        times.append(time.perf_counter() - t0)
        x, ct = st.x, st.ctr_type
        solved.append(int(jnp.sum(st.status == 0)))
        iters.append(float(jnp.mean(st.it)))

    dt = statistics.median(times)
    rate = B / dt

    print(json.dumps({
        "metric": "warm_start_solves_per_s",
        "value": round(rate, 2),
        "unit": "solves/s",
        "vs_baseline": round(rate / BASELINE_SOLVES_PER_S, 4),
    }))
    print(f"# device={dev.platform} B={B} reps={reps} n={n_var} dims={dims} "
          f"cold={cold_s:.1f}s cold_solved={cold_solved}/{B} "
          f"warm_solved={solved} warm_iters={[round(i,2) for i in iters]} "
          f"rep_times={[round(t,4) for t in times]}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
