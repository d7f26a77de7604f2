"""Throughput benchmark: warm-started lexicographic hierarchy solves/s.

North-star config (BASELINE.json): 100-variable, 4-level inequality
hierarchies, warm-started IK-sequence style.  Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.

Methodology (hardened against remote-TPU async/tunnel artifacts):
  * The timed workload is the on-device sequence driver
    (`lexls_tpu.sequence.solve_sequence_batched`): B independent
    sequences of T problems; step 0 solves cold, steps 1..T-1 warm-start
    from the previous step's {x, active set} on a drifting A (1e-3) —
    one XLA program per sequence length.
  * The timed function returns only device-reduced scalars, fetched
    with np.asarray — a tiny, T-independent transfer that forces
    completion (`block_until_ready` is not reliable through the
    remote-TPU tunnel, and fetching full outputs would make transfer
    time scale with T).
  * Per-warm-solve cost is the least-squares slope of median runtime
    over several sequence lengths — constant overhead (dispatch, arg
    upload, fetch, cold solve) cancels in the slope.

Baseline: 1e5 warm-started solves/s per chip (the reference publishes
no numbers; this is the driver's north star).
"""

import functools
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
    from lexls_tpu.sequence import solve_sequence_batched_native
    from lexls_tpu.types import ParametersLexLSI

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    dtype = jnp.float32

    n_var, dims = 100, (30, 30, 30, 30)
    B = int(os.environ.get("LEXLS_BENCH_B", 512 if on_tpu else 8))
    Ts = (2, 10) if on_tpu else (2, 4)
    reps = int(os.environ.get("LEXLS_BENCH_REPS", 5 if on_tpu else 1))
    # native = batched solver (+ Pallas panels unless nopallas); vmap =
    # per-instance solver under vmap
    mode = os.environ.get("LEXLS_BENCH_MODE", "native_nopallas")

    params = ParametersLexLSI(
        max_number_of_factorizations=250,
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
    T_max = max(Ts)

    base = np.stack([prob.A + 1e-3 * rng.standard_normal(prob.A.shape)
                     for _ in range(B)])
    drift = rng.standard_normal((T_max, prob.A.shape[0], prob.A.shape[1]))
    A_seq = jnp.asarray(
        base[:, None] + 1e-3 * np.cumsum(drift, axis=0)[None], dtype)
    lbs = jnp.broadcast_to(jnp.asarray(prob.lb, dtype), (B, T_max, m))
    ubs = jnp.broadcast_to(jnp.asarray(prob.ub, dtype), (B, T_max, m))
    reg = jnp.asarray(prob.regularization, dtype)

    from lexls_tpu.sequence import solve_sequence_batched

    @functools.partial(jax.jit, static_argnames=("T",))
    def run_summary(A_seq, lbs, ubs, reg, T):
        if mode == "vmap":
            seq = functools.partial(solve_sequence_batched,
                                    struct=struct, params=params)
        else:
            seq = functools.partial(solve_sequence_batched_native,
                                    struct=struct, params=params,
                                    use_pallas=(mode == "native"))
        xs, vs, statuses, its, nfs, cts = seq(
            A_seq[:, :T], lbs[:, :T], ubs[:, :T], reg)
        return (
            jnp.sum(xs[:, -1]),                                  # forces xs
            jnp.sum(statuses == 0).astype(jnp.int32),            # solved count
            jnp.sum(its[:, 1:]).astype(jnp.int32),               # warm iters
            jnp.max(its[:, 1:], initial=0).astype(jnp.int32),    # worst warm
            jnp.sum(its[:, 0]).astype(jnp.int32),                # cold iters
        )

    def fetch(out):
        return tuple(np.asarray(o) for o in out)

    # compile all lengths (excluded from timing)
    t0 = time.perf_counter()
    for T in Ts:
        fetch(run_summary(A_seq, lbs, ubs, reg, T=T))
    compile_s = time.perf_counter() - t0

    med = {}
    summaries = {}
    for T in Ts:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fetch(run_summary(A_seq, lbs, ubs, reg, T=T))
            ts.append(time.perf_counter() - t0)
        med[T] = statistics.median(ts)
        summaries[T] = out

    # least-squares slope of runtime vs number of warm solves
    xs_ = np.array([T - 1 for T in Ts], dtype=float)
    ys_ = np.array([med[T] for T in Ts])
    slope = float(np.polyfit(xs_, ys_, 1)[0])
    rate = B / max(slope, 1e-9)

    _, solved, warm_it_sum, worst_warm, cold_it_sum = summaries[max(Ts)]
    total = B * max(Ts)
    warm_count = B * (max(Ts) - 1)

    print(json.dumps({
        "metric": "warm_start_solves_per_s",
        "value": round(rate, 2),
        "unit": "solves/s",
        "vs_baseline": round(rate / BASELINE_SOLVES_PER_S, 4),
    }))
    print(f"# mode={mode} device={dev.platform} B={B} Ts={Ts} reps={reps} n={n_var} "
          f"dims={dims} medians={ {T: round(med[T],3) for T in Ts} } "
          f"slope={slope*1e3:.2f}ms/step compile={compile_s:.0f}s "
          f"solved={int(solved)}/{total} mean_warm_iters={warm_it_sum/warm_count:.2f} "
          f"worst_warm_iters={int(worst_warm)} mean_cold_iters={cold_it_sum/B:.1f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
