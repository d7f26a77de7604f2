"""Decompose the per-warm-step cost of the fused bench into
loop iterations vs everything else (phase-1 init, call boundary).

Replicates bench.py's scan exactly, with three kernel variants:
  full — the real solve (= the bench);
  off  — kernel runs ZERO loop iterations ("off" ablate token): the
         slope is phase-1 + pallas in/out copies + scan stitching;
  prep — no kernel call at all: phase-1 + scan stitching only.

slope(full) - slope(off)  = active-set loop cost per step
slope(off)  - slope(prep) = pallas call boundary cost per step
slope(prep)               = XLA phase-1 / activation-repair cost per step

Usage: python tools/overhead_fused.py [B] [tile]
"""

import functools
import os
import statistics
import sys
import time

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lexls_tpu.lexlsi as jli  # noqa: E402
from lexls_tpu.oracle import generate as gen  # noqa: E402
from lexls_tpu.ops.fused import fused_active_set  # noqa: E402
from lexls_tpu.sequence import _device_initial_activation  # noqa: E402
from lexls_tpu.types import ParametersLexLSI  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 384
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 64
Ts = (2, 14)
REPS = 5

n_var, dims = 100, (30, 30, 30, 30)
params = ParametersLexLSI(
    max_number_of_factorizations=250,
    tol_linear_dependence=1e-7,
    tol_wrong_sign_lambda=1e-4,
    tol_correct_sign_lambda=1e-6,
    tol_feasibility=1e-5,
)
dtype = jnp.float32

rng = np.random.default_rng(0)
prob = gen.random_inequality_hierarchy(
    rng, n_var, list(dims), equality_fraction=0.1, tight_fraction=0.3)
struct = jli.Structure.of(prob)
m = prob.n_ctr

base = jnp.asarray(
    np.stack([prob.A + 1e-3 * rng.standard_normal(prob.A.shape)
              for _ in range(B)]), dtype)
drifts = jnp.asarray(
    1e-3 * np.cumsum(rng.standard_normal((max(Ts),) + prob.A.shape), axis=0),
    dtype)
lbs = jnp.broadcast_to(jnp.asarray(prob.lb, dtype), (B, m))
ubs = jnp.broadcast_to(jnp.asarray(prob.ub, dtype), (B, m))
reg = jnp.asarray(prob.regularization, dtype)
v0 = jnp.zeros((B, m), dtype)

act = jax.vmap(
    lambda a, l, u, g: _device_initial_activation(a, l, u, g, struct))

p = len(struct.lexlse_dims)
prio = tuple(tuple(int(q) for q in struct.sweep_priority(j)) for j in range(p))
elig = tuple(tuple(bool(e) for e in struct.sweep_eligible(j)) for j in range(p))
kw = dict(
    dims=struct.lexlse_dims, d0=struct.d0,
    var_idx=struct.var_idx if struct.simple_bounds else (),
    tol_ld=params.tol_linear_dependence, tol_feas=params.tol_feasibility,
    tol_wrong=params.tol_wrong_sign_lambda,
    tol_correct=params.tol_correct_sign_lambda,
    max_fact=params.max_number_of_factorizations,
    deact_first=params.deactivate_first_wrong_sign,
    prio=prio, elig=elig, tile=TILE, vmem_limit_mb=100)


def solve_b(A, c, s, ns, x, xg, mode):
    with jax.default_matmul_precision("float32"):
        st = jax.vmap(
            lambda a, l, u, cc, stt, nss, xx, vv: jli._initial_state(
                a, l, u, cc, stt, nss, xx, vv, struct, params, reg, xg, False)
        )(A, lbs, ubs, c, s, ns, x, v0)
        if mode == "prep":
            return st.x + st.v[:, :n_var], st.ctr_type
        ab = ("off",) if mode == "off" else ()
        outs = fused_active_set(
            A, st.lb, st.ub, st.ctr_type, st.stamp, st.next_stamp, st.x,
            st.v, st.Ax, st.n_fact, ablate=ab, **kw)
        return outs[0], outs[6]  # x, ctr_type


@functools.partial(jax.jit, static_argnames=("T", "mode"))
def run(bb, dd, T, mode):
    A0 = bb + dd[0]
    c0, s0, n0 = act(A0, lbs, ubs, jnp.zeros((B, m), jnp.int32))
    x0, ct0 = solve_b(A0, c0, s0, n0, jnp.zeros((B, n_var), dtype), False,
                      mode)

    def step(carry, drift_t):
        x, ct = carry
        A = bb + drift_t
        c, s, ns = act(A, lbs, ubs, ct)
        x2, ct2 = solve_b(A, c, s, ns, x, True, mode)
        return (x2, ct2), jnp.sum(x2)

    (x, ct), sums = lax.scan(step, (x0, ct0), dd[1:T])
    return jnp.sum(sums) + jnp.sum(x)


for mode in ("full", "off", "prep"):
    med = {}
    for T in Ts:
        np.asarray(run(base, drifts, T, mode))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(run(base, drifts, T, mode))
            ts.append(time.perf_counter() - t0)
        med[T] = statistics.median(ts)
    slope = (med[Ts[1]] - med[Ts[0]]) / (Ts[1] - Ts[0])
    print(f"{mode:5s} medians={ {T: round(v, 4) for T, v in med.items()} } "
          f"slope={slope*1e3:.2f}ms/step", flush=True)
