"""Secondary benchmarks (BASELINE configs beyond the headline metric).

``bench.py`` calls these after the headline metric and routes their JSON
lines to stderr, so every driver round records all configs:
  1. equality-only l-QR at the test_01.dat scale (88 vars, 4 general
     levels) — batched factorize + solve throughput;
  2. two-sided inequality active-set at the 88-variable scale (the
     test_numerical_error.dat workload shape; the file itself is absent
     from the reference snapshot) — cold solves;
  3. deep rank-deficient hierarchy (6 levels) with Tikhonov
     regularization — full active-set solve throughput (cold).
Config 4 (warm-started sequence) IS the headline; config 5 (sharded
multi-host batch) is exercised by __graft_entry__.dryrun_multichip and
the mesh tests.  Same hardened timing protocol as bench.py (scalar
fetch, scan-length slope).
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
from jax import lax  # noqa: E402


def _slope(run, args, Ns=(1, 9), reps=5):
    # serialize the timed phase against concurrent config campaigns
    # (same flock protocol as bench.py: exclusive for measurement,
    # SHARED around compile executions so peer compiles can never run
    # on-device during anyone's measurement)
    lock_path = os.environ.get("LEXLS_BENCH_LOCK")
    lk = None

    def _compile_run(N):
        if lock_path:
            import fcntl

            with open(lock_path, "w") as shk:
                fcntl.flock(shk, fcntl.LOCK_SH)
                return np.asarray(run(*args, N=N))
        return np.asarray(run(*args, N=N))

    for N in Ns:
        _compile_run(N)  # compile
    if lock_path:
        import fcntl

        lk = open(lock_path, "w")
        fcntl.flock(lk, fcntl.LOCK_EX)
    try:
        med = {}
        for N in Ns:
            np.asarray(run(*args, N=N))  # re-warm under lock
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(run(*args, N=N))
                ts.append(time.perf_counter() - t0)
            med[N] = statistics.median(ts)
    finally:
        if lk is not None:
            lk.close()
    return (med[max(Ns)] - med[min(Ns)]) / (max(Ns) - min(Ns))


def bench_equality():
    import lexls_tpu.lexlse as jle
    from lexls_tpu.oracle import generate as gen
    from lexls_tpu.types import ParametersLexLSE

    dtype = jnp.float32
    on_tpu = jax.devices()[0].platform == "tpu"
    B = 384 if on_tpu else 4
    n, dims = 88, (33, 3, 2, 97)  # test_01's general levels
    params = ParametersLexLSE(tol_linear_dependence=1e-7)

    rng = np.random.default_rng(0)
    A, b, _, _, _ = gen.random_equality_hierarchy(rng, n, list(dims))
    As = jnp.asarray(np.stack([A + 1e-3 * rng.standard_normal(A.shape)
                               for _ in range(B)]), dtype)
    bs = jnp.asarray(np.stack([b + 1e-3 * rng.standard_normal(b.shape)
                               for _ in range(B)]), dtype)

    @functools.partial(jax.jit, static_argnames=("N",))
    def run(As, bs, N):
        with jax.default_matmul_precision("float32"):
            def body(carry, _):
                Ac, acc = carry
                def one(Ai, bi):
                    f = jle.factorize_fast(Ai, bi, dims, params)
                    return jle.solve(f)
                xs = jax.vmap(one)(Ac, bs)
                return (Ac + 1e-9 * jnp.sum(xs), acc + jnp.sum(xs)), None
            (Ac, acc), _ = lax.scan(body, (As, jnp.zeros((), dtype)), None, length=N)
            return acc

    s = _slope(run, (As, bs))
    rate = B / max(s, 1e-9)
    print(json.dumps({
        "metric": "equality_lqr_solves_per_s",
        "value": round(rate, 2), "unit": "solves/s",
        "config": f"B={B} n={n} dims={dims} (test_01 scale)",
    }))


def bench_inequality_cold():
    """BASELINE config 2: two-sided inequalities, primal active-set, at
    the 88-variable scale of the (missing) test_numerical_error.dat."""
    import lexls_tpu.lexlsi as jli
    from lexls_tpu.oracle import generate as gen
    from lexls_tpu.types import ParametersLexLSI

    dtype = jnp.float32
    on_tpu = jax.devices()[0].platform == "tpu"
    # cold solves are iteration-bound: the batch pays ~max-iters full
    # trips whatever B is, so throughput scales with B until the trip
    # cost stops being latency-bound (see docs/performance.md)
    B = int(os.environ.get("LEXLS_BENCH_COLD_B", 1024 if on_tpu else 4))
    rng = np.random.default_rng(0)
    prob = gen.random_inequality_hierarchy(
        rng, 88, [44, 44], equality_fraction=0.05, tight_fraction=0.3)
    struct = jli.Structure.of(prob)
    m, n = prob.n_ctr, prob.n_var
    params = ParametersLexLSI(
        max_number_of_factorizations=150,
        tol_linear_dependence=1e-7, tol_wrong_sign_lambda=1e-4,
        tol_correct_sign_lambda=1e-6, tol_feasibility=1e-5)

    ct0, st0, ns0 = jli.initial_activation(prob)
    c0 = jnp.broadcast_to(jnp.asarray(ct0), (B, m))
    s0 = jnp.broadcast_to(jnp.asarray(st0), (B, m))
    n0 = jnp.broadcast_to(jnp.asarray(ns0), (B,))
    lbs = jnp.broadcast_to(jnp.asarray(prob.lb, dtype), (B, m))
    ubs = jnp.broadcast_to(jnp.asarray(prob.ub, dtype), (B, m))
    reg = jnp.asarray(prob.regularization, dtype)
    base = jnp.asarray(np.stack([prob.A + 1e-3 * rng.standard_normal(prob.A.shape)
                                 for _ in range(B)]), dtype)

    tile = 64 if on_tpu else B
    vmem = 100 if on_tpu else 0
    # "tracked" runs the cold solve through the tracker loop: ONE exact
    # kernel iteration, then every remaining active-set iteration as
    # batched MXU matmuls (lexls_tpu/tracker.py)
    mode = os.environ.get("LEXLS_BENCH_COLD_MODE", "tracked")

    @functools.partial(jax.jit, static_argnames=("N",))
    def run(base, N):
        def body(carry, _):
            Ac, acc = carry
            if mode == "tracked":
                from lexls_tpu import tracker as trk

                st, _ = trk.solve_core_cold_tracked(
                    Ac, lbs, ubs, c0, s0, n0, jnp.zeros((B, n), dtype),
                    jnp.zeros((B, m), dtype), struct=struct, params=params,
                    tile=tile, interpret=not on_tpu, vmem_limit_mb=vmem)
            else:
                st = jli.solve_core_fused(
                    Ac, lbs, ubs, c0, s0, n0, jnp.zeros((B, n), dtype),
                    jnp.zeros((B, m), dtype), reg, struct=struct,
                    params=params, x_guess_specified=False,
                    v0_specified=False, tile=tile,
                    interpret=not on_tpu, vmem_limit_mb=vmem)
            return (Ac + 1e-9 * jnp.sum(st.x), acc + jnp.sum(st.it)), None
        (Ac, acc), _ = lax.scan(body, (base, jnp.zeros((), dtype)), None, length=N)
        return acc

    s = _slope(run, (base,), Ns=(1, 3), reps=3)
    rate = B / max(s, 1e-9)
    print(json.dumps({
        "metric": "inequality_cold_solves_per_s",
        "value": round(rate, 2), "unit": "solves/s",
        "config": f"B={B} n=88 dims=(44,44) two-sided cold {mode}",
    }))


def bench_deep_regularized():
    import lexls_tpu.lexlsi as jli
    from lexls_tpu.oracle import generate as gen
    from lexls_tpu.parallel import solve_batched
    from lexls_tpu.types import ParametersLexLSI, RegularizationType

    dtype = jnp.float32
    on_tpu = jax.devices()[0].platform == "tpu"
    B = 1024 if on_tpu else 4
    rng = np.random.default_rng(0)
    prob = gen.random_inequality_hierarchy(
        rng, 24, [6, 5, 5, 4, 4, 4], ranks=[4, 3, 3, 2, 2, 2],
        equality_fraction=0.1)
    prob.regularization = np.full(6, 0.05)
    struct = jli.Structure.of(prob)
    m, n = prob.n_ctr, prob.n_var
    params = ParametersLexLSI(
        regularization_type=RegularizationType.TIKHONOV,
        max_number_of_factorizations=64,
        tol_linear_dependence=1e-7, tol_wrong_sign_lambda=1e-4,
        tol_correct_sign_lambda=1e-6, tol_feasibility=1e-5)

    ct0, st0, ns0 = jli.initial_activation(prob)
    c0 = jnp.broadcast_to(jnp.asarray(ct0), (B, m))
    s0 = jnp.broadcast_to(jnp.asarray(st0), (B, m))
    n0 = jnp.broadcast_to(jnp.asarray(ns0), (B,))
    lbs = jnp.broadcast_to(jnp.asarray(prob.lb, dtype), (B, m))
    ubs = jnp.broadcast_to(jnp.asarray(prob.ub, dtype), (B, m))
    reg = jnp.asarray(prob.regularization, dtype)
    base = jnp.asarray(np.stack([prob.A + 1e-3 * rng.standard_normal(prob.A.shape)
                                 for _ in range(B)]), dtype)

    # "tracked": the regularized tracker loop (batched-matmul iterations
    # + masked-Cholesky damping, XLA-tier fallback)
    mode = os.environ.get("LEXLS_BENCH_REG_MODE", "tracked")
    tile = 64 if on_tpu else B
    vmem = 100 if on_tpu else 0

    @functools.partial(jax.jit, static_argnames=("N",))
    def run(base, N):
        def body(carry, _):
            Ac, acc = carry
            if mode == "tracked":
                from lexls_tpu import tracker as trk

                st, _ = trk.solve_core_cold_tracked(
                    Ac, lbs, ubs, c0, s0, n0, jnp.zeros((B, n), dtype),
                    jnp.zeros((B, m), dtype), struct=struct, params=params,
                    tile=tile, interpret=not on_tpu, vmem_limit_mb=vmem,
                    reg=reg)
            else:
                st = solve_batched(Ac, lbs, ubs, c0, s0, n0,
                                   jnp.zeros((B, n), dtype),
                                   jnp.zeros((B, m), dtype),
                                   reg, struct=struct, params=params)
            return (Ac + 1e-9 * jnp.sum(st.x), acc + jnp.sum(st.status)), None
        (Ac, acc), _ = lax.scan(body, (base, jnp.zeros((), dtype)), None, length=N)
        return acc

    s = _slope(run, (base,), Ns=(1, 4), reps=3)
    rate = B / max(s, 1e-9)
    print(json.dumps({
        "metric": "deep_regularized_cold_solves_per_s",
        "value": round(rate, 2), "unit": "solves/s",
        "config": f"B={B} n=24 levels=6 rank-deficient tikhonov {mode}",
    }))


def run_all():
    # LEXLS_BENCH_ONLY="2" (comma-separated config numbers) restricts
    # the run — used by config campaigns to re-measure one config
    only = {z.strip() for z in
            os.environ.get("LEXLS_BENCH_ONLY", "1,2,3").split(",")}
    if "1" in only:
        bench_equality()
    if "2" in only:
        bench_inequality_cold()
    if "3" in only:
        bench_deep_regularized()


if __name__ == "__main__":
    run_all()
