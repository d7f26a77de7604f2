"""Per-trip alive/fall statistics of the tracker on the bench workload.

Reports, for each of a few warm steps at the north-star shapes: how many
instances are still alive after each tracker trip, and how many instances
fell back (cert rejection).  This sizes the pyramid slabs
(``solve_core_tracked(shrink=...)``) and decides whether a
``lax.cond``-gated handover (skip the fused-kernel phase when nothing
fell) pays: the skip fires iff P(zero falls per batch) is high.

Run: python tools/trk_stats.py [B] [steps]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import lexls_tpu.lexlsi as jli  # noqa: E402
from lexls_tpu import tracker as trk  # noqa: E402
from lexls_tpu.oracle import generate as gen  # noqa: E402
from lexls_tpu.sequence import _device_initial_activation  # noqa: E402
from lexls_tpu.types import ParametersLexLSI, TerminationStatus  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 384
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
MAX_TRIPS = 8
dtype = jnp.float32


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    n_var, dims = 100, (30, 30, 30, 30)
    params = ParametersLexLSI(
        max_number_of_factorizations=250, tol_linear_dependence=1e-7,
        tol_wrong_sign_lambda=1e-4, tol_correct_sign_lambda=1e-6,
        tol_feasibility=1e-5)
    rng = np.random.default_rng(0)
    prob = gen.random_inequality_hierarchy(
        rng, n_var, list(dims), equality_fraction=0.1, tight_fraction=0.3)
    struct = jli.Structure.of(prob)
    m = prob.n_ctr
    base = jnp.asarray(
        np.stack([prob.A + 1e-3 * rng.standard_normal(prob.A.shape)
                  for _ in range(B)]), dtype)
    drifts = jnp.asarray(
        1e-3 * np.cumsum(rng.standard_normal((STEPS + 1,) + prob.A.shape),
                         axis=0), dtype)
    lb = jnp.broadcast_to(jnp.asarray(prob.lb, dtype), (B, m))
    ub = jnp.broadcast_to(jnp.asarray(prob.ub, dtype), (B, m))
    v0 = jnp.zeros((B, m), dtype)
    ct0 = jnp.zeros((B, m), jnp.int32)
    st0 = jnp.zeros((B, m), jnp.int32)
    ns0 = jnp.zeros((B,), jnp.int32)

    print(f"cold solve (B={B})...", flush=True)
    st, car = trk.solve_core_cold_tracked(
        base + drifts[0], lb, ub, ct0, st0, ns0,
        jnp.zeros((B, n_var), dtype), v0, struct=struct, params=params,
        tile=64, vmem_limit_mb=100, interpret=not on_tpu)
    st = jax.block_until_ready(st)
    print("cold solved:", int(np.sum(np.asarray(st.status) == 0)), "/", B,
          flush=True)

    act = jax.vmap(
        lambda a, l, u, g: _device_initial_activation(a, l, u, g, struct))
    unknown = int(TerminationStatus.UNKNOWN)

    # one uncapped run per step returns per-instance `it` (= trips used
    # while alive; the kernel continues the counter after a fall) and
    # the debug fall mask (cert rejections — loop_cap/shrink are off)
    x_prev, ct_prev = st.x, st.ctr_type
    car_prev = car
    print("step | it hist (1,2,3,4,5+) | mean | max | falls | "
          "fall@trip {trip: n} | why {bits: n} | n_deact", flush=True)
    for t in range(1, STEPS + 1):
        A = base + drifts[t]
        c, s_, ns = act(A, lb, ub, ct_prev)
        stt, car_new, (fall, fall_trip, fall_why) = trk.solve_core_tracked(
            A, lb, ub, c, s_, ns, x_prev, v0, carried=car_prev,
            struct=struct, params=params, tile=64,
            interpret=not on_tpu, vmem_limit_mb=100, debug_fall=True,
            ns_iters=int(os.environ.get("TRK_NS", "2")),
            trip1_noext=os.environ.get("TRK_NOEXT", "0") == "1")
        stt = jax.block_until_ready(stt)
        its = np.asarray(stt.it)
        fall = np.asarray(fall)
        ftrip = np.asarray(fall_trip)[fall]
        fwhy = np.asarray(fall_why)[fall]
        falls = int(np.sum(fall))
        hist = [int(np.sum(its == k)) for k in (1, 2, 3, 4)]
        hist.append(int(np.sum(its >= 5)))
        trip_h = {int(k): int(v) for k, v in
                  zip(*np.unique(ftrip, return_counts=True))}
        why_h = {int(k): int(v) for k, v in
                 zip(*np.unique(fwhy, return_counts=True))}
        print(f"{t:4d} | {hist} | {its.mean():.3f} | {its.max()} | "
              f"{falls} | {trip_h} | {why_h} | "
              f"{int(np.sum(np.asarray(stt.n_deact)))}", flush=True)
        x_prev, ct_prev, car_prev = stt.x, stt.ctr_type, car_new


if __name__ == "__main__":
    main()
