"""Piecewise on-TPU timing of the tracker body (diagnosis harness).

The round-3 tracked bench measured 33 ms/step against a ~2 ms cost
model; this times each stage of ``_tracked_tail``'s body in isolation
with the bench's shapes (B=384, n=100, dims 4x30), using the hardened
slope protocol (device-reduced scalar fetch, scan-length slope).

Stages (cumulative, each adds one piece):
  chol     batched (B*p, K, K) Cholesky alone (the CholeskyQR suspect)
  fact     _masked_general + _factorize_carried
  solve    + _hot_solve + _form_step + _check_blocking
  lam      + _hot_lambda + _select_removal
  handover _fused_tail on an all-resolved state + permutes + bootstrap

Run: python tools/trk_profile.py [stages...]
"""
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import lexls_tpu.lexlsi as jli  # noqa: E402
from lexls_tpu import tracker as trk  # noqa: E402
from lexls_tpu.lexlsi import _masked_general, _form_step, _check_blocking  # noqa: E402
from lexls_tpu.oracle import generate as gen  # noqa: E402
from lexls_tpu.types import ParametersLexLSI  # noqa: E402

B = int(os.environ.get("TRK_B", 384))
Ls = (2, 10)
REPS = 5
dtype = jnp.float32


def slope(fn, args):
    # serialize timed phases against concurrent bench campaigns (same
    # flock protocol as bench.py / bench_extra.py)
    lock_path = os.environ.get("LEXLS_BENCH_LOCK")
    lk = None
    for L in Ls:
        np.asarray(fn(*args, L=L))  # compile outside the lock
    if lock_path:
        import fcntl

        lk = open(lock_path, "w")
        fcntl.flock(lk, fcntl.LOCK_EX)
    try:
        med = {}
        for L in Ls:
            np.asarray(fn(*args, L=L))  # re-warm under lock
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                np.asarray(fn(*args, L=L))
                ts.append(time.perf_counter() - t0)
            med[L] = statistics.median(ts)
    finally:
        if lk is not None:
            lk.close()
    return (med[max(Ls)] - med[min(Ls)]) / (max(Ls) - min(Ls))


def main():
    stages = sys.argv[1:] or ["chol", "fact", "solve", "lam", "handover"]
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
    A = jnp.asarray(np.stack([prob.A + 1e-3 * rng.standard_normal(prob.A.shape)
                              for _ in range(B)]), dtype)
    lb = jnp.broadcast_to(jnp.asarray(prob.lb, dtype), (B, m))
    ub = jnp.broadcast_to(jnp.asarray(prob.ub, dtype), (B, m))
    ct0 = jnp.zeros((B, m), jnp.int32)
    st0 = jnp.zeros((B, m), jnp.int32)
    ns0 = jnp.zeros((B,), jnp.int32)
    x0 = jnp.zeros((B, n_var), dtype)
    v0 = jnp.zeros((B, m), dtype)

    # one cold solve to get a realistic state + carried factors
    print("bootstrapping cold solve...", flush=True)
    st, car = trk.solve_core_cold_tracked(
        A, lb, ub, ct0, st0, ns0, x0, v0, struct=struct, params=params,
        tile=64, vmem_limit_mb=100,
        interpret=jax.devices()[0].platform != "tpu")
    st = jax.block_until_ready(st)
    print("cold done: solved", int(np.sum(np.asarray(st.status) == 0)),
          "/", B, flush=True)

    s0 = jax.vmap(
        lambda a, l, u, c, stp, ns, x, v: jli._initial_state(
            a, l, u, c, stp, ns, x, v, struct, params, None, True, False)
    )(A, lb, ub, st.ctr_type, st0, ns0, st.x, v0)

    offsets = []
    ofs = 0
    for d in struct.lexlse_dims:
        offsets.append(ofs)
        ofs += d

    hp = lax.Precision.HIGHEST

    if "chol" in stages:
        p = len(dims)
        K = trk.kmax_of(struct)
        G0 = car.rinv.reshape(B * p, K, K)
        G0 = (jnp.matmul(G0, jnp.swapaxes(G0, -1, -2), precision=hp)
              + jnp.eye(K, dtype=dtype) * 1.0)

        import functools

        @functools.partial(jax.jit, static_argnames=("L",))
        def chol_s(G, L):
            def body(c, _):
                Lc = jnp.linalg.cholesky(c)
                # chain: feed back a normalized SPD derived from Lc
                c2 = jnp.matmul(Lc, jnp.swapaxes(Lc, -1, -2), precision=hp)
                return c2 + jnp.eye(K, dtype=dtype) * 1e-6, None
            out, _ = lax.scan(body, G, None, length=L)
            return jnp.sum(out)
        s = slope(chol_s, (G0,))
        print(f"chol ({B*p}x{K}x{K}): {s*1e3:.2f} ms/step", flush=True)

    import functools

    def make_stage(upto):
        @functools.partial(jax.jit, static_argnames=("L",))
        def run(A, s0, rinv, pos, ranks, L):
            def body(carry, _):
                Ac, acc = carry
                with jax.default_matmul_precision("float32"):
                    Ag, bg, fixed_mask, fixed_val = jax.vmap(
                        lambda a, l, u, c: _masked_general(a, l, u, c, struct)
                    )(Ac, s0.lb, s0.ub, s0.ctr_type)
                    Agz = jnp.where(fixed_mask[:, None, :], 0.0, Ag)
                    bgz = bg - jnp.einsum("bmn,bn->bm", Ag, fixed_val,
                                          precision=hp)
                    ok, stash, fcs, pos_n, ranks_n, rinv_n, _why = \
                        trk._factorize_carried(
                            Agz, bgz, rinv, pos, ranks, struct, params,
                            ns_iters=2, cert_tol=1e-3, ext_steps=1,
                            reg_factors=None)
                    acc = acc + jnp.sum(rinv_n[:, 0, 0, 0]) + jnp.sum(
                        ok.astype(dtype))
                    if upto >= 1:
                        x_star = trk._hot_solve(stash, fcs, pos_n, fixed_mask,
                                                fixed_val, struct)
                        dx = x_star - s0.x
                        Adx, dv = jax.vmap(
                            lambda a, l, u, c, ax, v_, d: _form_step(
                                a, l, u, c, ax, v_, d)
                        )(Ac, s0.lb, s0.ub, s0.ctr_type, s0.Ax, s0.v, dx)
                        alpha, brow, btype = jax.vmap(
                            lambda c, ax, adx, v_, dv_, l, u: _check_blocking(
                                c, ax, adx, v_, dv_, l, u,
                                jnp.asarray(params.tol_feasibility, dtype),
                                dtype)
                        )(s0.ctr_type, s0.Ax, Adx, s0.v, dv, s0.lb, s0.ub)
                        acc = acc + jnp.sum(alpha) + jnp.sum(x_star)
                    if upto >= 2:
                        lam_all = trk._hot_lambda(stash, struct, offsets, B,
                                                  dtype)
                        found_rm, rrow = trk._select_removal(
                            lam_all, s0.ctr_type, s0.stamp, Ag, fixed_mask,
                            struct, params)
                        acc = acc + jnp.sum(rrow) + jnp.sum(lam_all[:, 0, 0])
                # drift A by a data-dependent epsilon so scan steps chain
                return (Ac * (1.0 + 1e-9 * jnp.tanh(acc)), acc), None
            (Ac, acc), _ = lax.scan(body, (A, jnp.zeros((), dtype)), None,
                                    length=L)
            return acc + jnp.sum(Ac[0, 0])
        return run

    names = {0: "fact", 1: "solve", 2: "lam"}
    for upto in (0, 1, 2):
        if names[upto] not in stages:
            continue
        fn = make_stage(upto)
        s = slope(fn, (A, s0, car.rinv, car.pos, car.ranks))
        print(f"{names[upto]} (cumulative): {s*1e3:.2f} ms/step", flush=True)

    if "handover" in stages:
        resolved_state = jax.vmap(
            lambda a, l, u, c, stp, ns, x, v: jli._initial_state(
                a, l, u, c, stp, ns, x, v, struct, params, None, True, False)
        )(A, lb, ub, st.ctr_type, st0, ns0, st.x, v0)
        import dataclasses

        @functools.partial(jax.jit, static_argnames=("L",))
        def run_h(A, s, rinv, pos, ranks, L):
            import lexls_tpu.lexlsi as _jli

            def body(carry, _):
                Ac, acc = carry
                with jax.default_matmul_precision("float32"):
                    resolved = jnp.ones((B,), bool)
                    sp = dataclasses.replace(
                        s, n_fact=jnp.full((B,), 250, jnp.int32),
                        status=jnp.zeros((B,), jnp.int32),
                        it=jnp.ones((B,), jnp.int32))
                    order = jnp.argsort(jnp.logical_not(resolved))
                    iota_b = jnp.arange(B, dtype=jnp.int32)
                    hot_b = (order[:, None] == iota_b[None, :]).astype(
                        jnp.float32)
                    g = lambda arr: _jli._permute_rows(arr, hot_b)
                    s_perm = jax.tree_util.tree_map(g, sp)
                    st_k, factors_k = _jli._fused_tail(
                        g(Ac), s_perm, g(sp.it), struct=struct, params=params,
                        tile=64, interpret=False, vmem_limit_mb=100,
                        compact=0, tile_b=0, panel_unroll=1,
                        compact_rounds=1, return_factors=True)
                    hot_t = hot_b.T
                    gi = lambda arr: _jli._permute_rows(arr, hot_t)
                    st_k = jax.tree_util.tree_map(gi, st_k)
                    factors_k = jax.tree_util.tree_map(gi, factors_k)
                    car_k = trk.bootstrap_carried(factors_k)
                    acc = acc + jnp.sum(st_k.x[:, 0]) + jnp.sum(
                        car_k.rinv[:, 0, 0, 0])
                return (Ac * (1.0 + 1e-9 * jnp.tanh(acc)), acc), None
            (Ac, acc), _ = lax.scan(body, (A, jnp.zeros((), dtype)), None,
                                    length=L)
            return acc + jnp.sum(Ac[0, 0])
        s = slope(run_h, (A, resolved_state, car.rinv, car.pos, car.ranks))
        print(f"handover (all-parked fused + permutes + bootstrap): "
              f"{s*1e3:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
