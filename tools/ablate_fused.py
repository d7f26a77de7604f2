"""Per-stage cost breakdown of the fused whole-solve kernel on TPU.

Runs the fused active-set kernel in "force" mode (exactly k iterations
per instance, convergence ignored) with stages cumulatively ablated, and
reports the per-iteration cost of each stage as the difference of
runtime slopes over two forced iteration counts (dispatch/transfer
constants cancel in the slope; the transfer is one scalar).

Usage:  python tools/ablate_fused.py [B] [tile]
"""

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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lexls_tpu.lexlsi as jli  # noqa: E402
from lexls_tpu.oracle import generate as gen  # noqa: E402
from lexls_tpu.ops.fused import fused_active_set  # noqa: E402
from lexls_tpu.sequence import _device_initial_activation  # noqa: E402
from lexls_tpu.types import ParametersLexLSI  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 384
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 64
KS = (2, 6)
REPS = 7

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

A0 = jnp.asarray(
    np.stack([prob.A + 1e-3 * rng.standard_normal(prob.A.shape)
              for _ in range(B)]), dtype)
lbs = jnp.broadcast_to(jnp.asarray(prob.lb, dtype), (B, m))
ubs = jnp.broadcast_to(jnp.asarray(prob.ub, dtype), (B, m))
reg = jnp.asarray(prob.regularization, dtype)
v0 = jnp.zeros((B, m), dtype)

# cold solve -> realistic warm-start state (active set at the optimum)
c0, s0, n0 = jax.vmap(
    lambda a, l, u, g: _device_initial_activation(a, l, u, g, struct)
)(A0, lbs, ubs, jnp.zeros((B, m), jnp.int32))
st0 = jli.solve_core_fused(
    A0, lbs, ubs, c0, s0, n0, jnp.zeros((B, n_var), dtype), v0, reg,
    struct=struct, params=params, x_guess_specified=False,
    v0_specified=False, tile=TILE, vmem_limit_mb=100)
print("cold solved:", int(jnp.sum(st0.status == 0)), "/", B, file=sys.stderr)

A1 = A0 + 1e-3 * jnp.asarray(rng.standard_normal(A0.shape), dtype)
c1, s1, n1 = jax.vmap(
    lambda a, l, u, g: _device_initial_activation(a, l, u, g, struct)
)(A1, lbs, ubs, st0.ctr_type)

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


def run(k, ablate):
    @jax.jit
    def f():
        with jax.default_matmul_precision("float32"):
            s = jax.vmap(
                lambda a, l, u, c, st, ns, x, v: jli._initial_state(
                    a, l, u, c, st, ns, x, v, struct, params, reg, True, False)
            )(A1, lbs, ubs, c1, s1, n1, st0.x, v0)
            outs = fused_active_set(
                A1, s.lb, s.ub, s.ctr_type, s.stamp, s.next_stamp, s.x, s.v,
                s.Ax, s.n_fact, it0=jnp.full((B,), k, jnp.int32),
                ablate=("force",) + ablate, **kw)
        return outs[0].sum()

    np.asarray(f())  # compile + run once
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(f())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


# single-token MARGINAL ablations: each variant removes ONE stage from
# the otherwise-full kernel, replacing it with a cheap *data-dependent*
# stub (resists constant folding, unlike the zeros of the cumulative
# mode) — slope(full) - slope(-X) = marginal cost of X.
VARIANTS = [
    ("full", ()),
    ("-panel", ("panel",)),
    ("-adx", ("adx",)),
    ("-ratio", ("ratio",)),
    ("-lodinit", ("lodinit",)),
    ("-wsupd", ("wsupd",)),
    ("-rsel", ("rsel",)),
    ("-solve", ("solve",)),
    ("-sweep", ("sweep",)),
]

slopes = {}
for name, ab in VARIANTS:
    t = {k: run(k, ab) for k in KS}
    slope = (t[KS[1]] - t[KS[0]]) / (KS[1] - KS[0])
    slopes[name] = slope
    print(f"{name:10s} t2={t[KS[0]]*1e3:8.2f}ms t6={t[KS[1]]*1e3:8.2f}ms "
          f"per-iter={slope*1e3:8.3f}ms ({slope/B*1e6:6.2f} us/inst)",
          flush=True)

print("\nmarginal stage costs (per batch-iteration):")
for name, _ in VARIANTS[1:]:
    d = slopes["full"] - slopes[name]
    print(f"  {name[1:]:8s} {d*1e3:8.3f}ms ({d/B*1e6:6.2f} us/inst)")
