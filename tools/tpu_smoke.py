"""Tiny on-TPU smoke test of the throughput tiers.

Compiles and runs the fused Pallas kernel and the tracker loop on a
small random inequality hierarchy (fast compile), comparing x/v to the
XLA tier.  Catches Mosaic lowering regressions that CPU interpret-mode
tests cannot (e.g. gather lowering inside while loops).  Exits nonzero
on any mismatch.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import lexls_tpu as lt  # noqa: E402
from lexls_tpu import lexlsi as jli
from lexls_tpu.parallel import solve_batched
from lexls_tpu import tracker as trk
from lexls_tpu.types import ParametersLexLSI


def main():
    dev = jax.devices()[0]
    print("platform:", dev.platform, dev)
    on_tpu = dev.platform == "tpu"
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    n, dims = 12, (6, 5)
    B = 8
    prob_A = rng.standard_normal((B, sum(dims), n)).astype(np.float32)
    c = np.einsum("bmn,n->bm", prob_A, rng.standard_normal(n)).astype(
        np.float32)
    lb = c - 0.05
    ub = c + 0.05
    params = ParametersLexLSI(
        tol_linear_dependence=1e-6, tol_wrong_sign_lambda=1e-4,
        tol_correct_sign_lambda=1e-5, tol_feasibility=1e-5)
    prob0 = lt.build_general_hierarchy(
        [(prob_A[0, :dims[0]], lb[0, :dims[0]], ub[0, :dims[0]]),
         (prob_A[0, dims[0]:], lb[0, dims[0]:], ub[0, dims[0]:])])
    struct = jli.Structure.of(prob0)
    m = sum(dims)
    A = jnp.asarray(prob_A, dtype)
    lbj = jnp.asarray(lb, dtype)
    ubj = jnp.asarray(ub, dtype)
    ct0 = jnp.zeros((B, m), jnp.int32)
    st0 = jnp.zeros((B, m), jnp.int32)
    ns0 = jnp.zeros((B,), jnp.int32)
    x0 = jnp.zeros((B, n), dtype)
    v0 = jnp.zeros((B, m), dtype)
    reg = jnp.zeros((len(dims),), dtype)

    with jax.default_matmul_precision("float32"):
        ref = solve_batched(
            A, lbj, ubj, ct0, st0, ns0, x0, v0, reg, struct=struct,
            params=params, x_guess_specified=False)
    print("xla statuses:", np.asarray(ref.status))

    def lvl_norms(st):
        # per-level residual norms: the pivot-order-invariant solution
        # characterization (x is non-unique under rank deficiency)
        v = np.asarray(st.v)
        return np.stack(
            [np.linalg.norm(v[:, :dims[0]], axis=1),
             np.linalg.norm(v[:, dims[0]:], axis=1)], axis=1)

    fu = jli.solve_core_fused(
        A, lbj, ubj, ct0, st0, ns0, x0, v0, reg, struct=struct,
        params=params, x_guess_specified=False, v0_specified=False,
        tile=8, interpret=not on_tpu)
    dv = float(np.max(np.abs(lvl_norms(fu) - lvl_norms(ref))))
    print("fused statuses:", np.asarray(fu.status), "max|dnorm|:", dv)
    assert (np.asarray(fu.status) == np.asarray(ref.status)).all()
    assert dv < 5e-4, dv

    stc, car = trk.solve_core_cold_tracked(
        A, lbj, ubj, ct0, st0, ns0, x0, v0, struct=struct, params=params,
        tile=8, interpret=not on_tpu)
    dvc = float(np.max(np.abs(lvl_norms(stc) - lvl_norms(ref))))
    print("cold-tracked statuses:", np.asarray(stc.status),
          "max|dnorm|:", dvc)
    assert (np.asarray(stc.status) == np.asarray(ref.status)).all()
    assert dvc < 5e-4, dvc

    # warm step: small drift, warm-start from the cold solve
    A2 = A + 1e-3 * jnp.asarray(
        rng.standard_normal(A.shape), dtype)
    with jax.default_matmul_precision("float32"):
        ref2 = solve_batched(
            A2, lbj, ubj, stc.ctr_type, st0, ns0, stc.x, v0, reg,
            struct=struct, params=params, x_guess_specified=True)
    stw, car2 = trk.solve_core_tracked(
        A2, lbj, ubj, stc.ctr_type, st0, ns0, stc.x, v0, carried=car,
        struct=struct, params=params, tile=8, interpret=not on_tpu)
    dvw = float(np.max(np.abs(lvl_norms(stw) - lvl_norms(ref2))))
    print("warm-tracked statuses:", np.asarray(stw.status),
          "max|dnorm|:", dvw)
    assert (np.asarray(stw.status) == np.asarray(ref2.status)).all()
    assert dvw < 5e-4, dvw

    # --- simple-bounds (d0 > 0) kernel path: offset ref slices use
    # pl.ds (a nonzero-start basic slice on a Ref lowers to a gather
    # Mosaic rejects; caught on the first on-TPU golden run)
    probs = lt.build_hierarchy_with_bounds(
        np.arange(4), np.full(4, -0.4), np.full(4, 0.4),
        [(prob_A[0, :dims[0]], lb[0, :dims[0]], ub[0, :dims[0]]),
         (prob_A[0, dims[0]:], lb[0, dims[0]:], ub[0, dims[0]:])],
        n_var=n)
    structs = jli.Structure.of(probs)
    ms = probs.n_ctr
    As = jnp.broadcast_to(
        jnp.asarray(probs.A, dtype), (B, ms, n)) + 1e-3 * jnp.asarray(
        rng.standard_normal((B, ms, n)), dtype)
    lbs = jnp.broadcast_to(jnp.asarray(probs.lb, dtype), (B, ms))
    ubs = jnp.broadcast_to(jnp.asarray(probs.ub, dtype), (B, ms))
    cts = jnp.zeros((B, ms), jnp.int32)
    sts = jnp.zeros((B, ms), jnp.int32)
    regs = jnp.zeros((len(probs.dims),), dtype)
    with jax.default_matmul_precision("float32"):
        refs = solve_batched(
            As, lbs, ubs, cts, sts, ns0, x0, jnp.zeros((B, ms), dtype),
            regs, struct=structs, params=params, x_guess_specified=False)
    fus = jli.solve_core_fused(
        As, lbs, ubs, cts, sts, ns0, x0, jnp.zeros((B, ms), dtype), regs,
        struct=structs, params=params, x_guess_specified=False,
        v0_specified=False, tile=8, interpret=not on_tpu)
    assert (np.asarray(fus.status) == np.asarray(refs.status)).all()
    dvs = float(np.max(np.abs(np.asarray(fus.v) - np.asarray(refs.v))))
    print("simple-bounds fused statuses:", np.asarray(fus.status)[:4],
          "max|dv|:", dvs)
    assert dvs < 5e-3, dvs
    print("SMOKE OK")


if __name__ == "__main__":
    main()
