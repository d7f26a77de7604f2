"""Throughput benchmark: warm-started lexicographic hierarchy solves/s.

North-star config (BASELINE.json): 100-variable, 4-level inequality
hierarchies, warm-started IK-sequence style.  Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.

Methodology (hardened against remote-TPU async/tunnel artifacts):
  * The timed workload is an on-device `lax.scan` over T problems:
    step 0 solves cold, steps 1..T-1 warm-start from the previous step's
    {x, active set} on a drifting A (1e-3 per step).  The problem
    matrices are generated on device per step (base + drift) so batch
    size is not limited by a materialized (B, T, m, n) tensor.
  * The timed function returns only device-reduced scalars, fetched
    with np.asarray — a tiny, T-independent transfer that forces
    completion (`block_until_ready` is not reliable through the
    remote-TPU tunnel).
  * Per-warm-solve cost is the slope of median runtime over two
    sequence lengths — constant overhead (dispatch, upload, fetch, the
    cold solve) cancels in the slope.

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
from jax import lax  # noqa: E402

BASELINE_SOLVES_PER_S = 1.0e5


def main():
    import lexls_tpu.lexlsi as jli
    from lexls_tpu.oracle import generate as gen
    from lexls_tpu.parallel import solve_batched
    from lexls_tpu.sequence import _device_initial_activation
    from lexls_tpu.types import ParametersLexLSI

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    dtype = jnp.float32

    n_var, dims = 100, (30, 30, 30, 30)
    B = int(os.environ.get("LEXLS_BENCH_B", 384 if on_tpu else 8))
    Ts = (2, 14) if on_tpu else (2, 4)
    reps = int(os.environ.get("LEXLS_BENCH_REPS", 7 if on_tpu else 1))
    # fused  = whole-solve Pallas kernel (active-set loop in VMEM)
    # native = natively-batched solver (+ Pallas panel kernels)
    # vmap   = vmapped per-instance solver (XLA)
    mode = os.environ.get("LEXLS_BENCH_MODE", "fused")
    tile = int(os.environ.get("LEXLS_BENCH_TILE", 64))
    # Mosaic's default scoped-VMEM budget is ~16 MB; v5e has far more
    # physical VMEM, and the fused kernel at tile=32 wants ~30 MB
    vmem_mb = int(os.environ.get("LEXLS_BENCH_VMEM_MB", 100))
    # iteration compaction: pause after N iterations, cluster stragglers
    compact = int(os.environ.get("LEXLS_BENCH_COMPACT", 1))
    # straggler-phase tile (0 = same as tile)
    tile_b = int(os.environ.get("LEXLS_BENCH_TILE_B", 0))
    # pivot steps unrolled per panel-loop trip (bit-identical math)
    panel_unroll = int(os.environ.get("LEXLS_BENCH_PANEL_UNROLL", 1))
    # capped compaction rounds before the unbounded finish phase
    compact_rounds = int(os.environ.get("LEXLS_BENCH_COMPACT_ROUNDS", 1))

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

    base = jnp.asarray(
        np.stack([prob.A + 1e-3 * rng.standard_normal(prob.A.shape)
                  for _ in range(B)]), dtype)
    drifts = jnp.asarray(
        1e-3 * np.cumsum(rng.standard_normal((T_max,) + prob.A.shape), axis=0),
        dtype)
    lbs = jnp.broadcast_to(jnp.asarray(prob.lb, dtype), (B, m))
    ubs = jnp.broadcast_to(jnp.asarray(prob.ub, dtype), (B, m))
    reg = jnp.asarray(prob.regularization, dtype)
    v0 = jnp.zeros((B, m), dtype)

    act = jax.vmap(
        lambda a, l, u, g: _device_initial_activation(a, l, u, g, struct))

    def solve_b(A, c, s, ns, x, xg):
        if mode == "fused":
            return jli.solve_core_fused(
                A, lbs, ubs, c, s, ns, x, v0, reg, struct=struct,
                params=params, x_guess_specified=xg, v0_specified=False,
                tile=tile, interpret=not on_tpu, vmem_limit_mb=vmem_mb,
                compact=compact, tile_b=tile_b, panel_unroll=panel_unroll,
                compact_rounds=compact_rounds)
        if mode == "native":
            return jli.solve_core_batched(
                A, lbs, ubs, c, s, ns, x, v0, reg, struct=struct,
                params=params, x_guess_specified=xg, v0_specified=False,
                use_pallas=True)
        return solve_batched(
            A, lbs, ubs, c, s, ns, x, v0, reg, struct=struct, params=params,
            x_guess_specified=xg)

    @functools.partial(jax.jit, static_argnames=("T",))
    def run_summary(base, drifts, T):
        A0 = base + drifts[0]
        c0, s0, n0 = act(A0, lbs, ubs, jnp.zeros((B, m), jnp.int32))
        st0 = solve_b(A0, c0, s0, n0, jnp.zeros((B, n_var), dtype), False)

        def step(carry, drift_t):
            x, ct = carry
            A = base + drift_t
            c, s, ns = act(A, lbs, ubs, ct)
            st = solve_b(A, c, s, ns, x, True)
            return (st.x, st.ctr_type), (st.status, st.it)

        (x, ct), (statuses, its) = lax.scan(
            step, (st0.x, st0.ctr_type), drifts[1:T])
        return (
            jnp.sum(x),
            (jnp.sum(statuses == 0) + jnp.sum(st0.status == 0)).astype(jnp.int32),
            jnp.sum(its).astype(jnp.int32),
            jnp.max(its, initial=0).astype(jnp.int32),
            jnp.sum(st0.it).astype(jnp.int32),
        )

    def fetch(out):
        return tuple(np.asarray(o) for o in out)

    t0 = time.perf_counter()
    for T in Ts:
        fetch(run_summary(base, drifts, T=T))
    compile_s = time.perf_counter() - t0

    med = {}
    summaries = {}
    for T in Ts:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fetch(run_summary(base, drifts, T=T))
            ts.append(time.perf_counter() - t0)
        med[T] = statistics.median(ts)
        summaries[T] = out

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
    from lexls_tpu.perf import mfu_report

    mfu = mfu_report(rate, n_var, dims, warm_it_sum / warm_count)
    print(f"# mode={mode} device={dev.platform} B={B} Ts={Ts} reps={reps} "
          f"tile={tile} compact={compact}x{compact_rounds} tile_b={tile_b} "
          f"unroll={panel_unroll} "
          f"n={n_var} dims={dims} medians={ {T: round(med[T],3) for T in Ts} } "
          f"slope={slope*1e3:.2f}ms/step compile={compile_s:.0f}s "
          f"solved={int(solved)}/{total} mean_warm_iters={warm_it_sum/warm_count:.2f} "
          f"worst_warm_iters={int(worst_warm)} mean_cold_iters={cold_it_sum/B:.1f}",
          file=sys.stderr)
    print(f"# roofline: {mfu['flops_per_solve']/1e6:.2f} MFLOP/solve "
          f"{mfu['flops_per_s']/1e9:.1f} GFLOP/s "
          f"mfu={mfu['mfu_vs_bf16_peak']*100:.2f}%-of-bf16-peak "
          f"{mfu['mfu_vs_f32_vpu']*100:.1f}%-of-f32-VPU "
          f"hbm_min={mfu['hbm_fraction']*100:.2f}%", file=sys.stderr)

    # secondary BASELINE configs (1: equality l-QR, 2: inequality cold,
    # 3: deep regularized) — JSON lines to stderr so the driver-captured
    # stdout stays a single headline record
    if os.environ.get("LEXLS_BENCH_SECONDARY", "1") != "0":
        import contextlib

        import bench_extra

        with contextlib.redirect_stdout(sys.stderr):
            bench_extra.run_all()


if __name__ == "__main__":
    main()
