"""Batch (vmap), mesh (shard_map), and warm-start sequence (scan) tests.

SURVEY §4 multi-node analogue: single-instance vs vmap vs sharded
``shard_map`` must produce identical per-instance results; the "fake
backend" is the 8-device virtual CPU mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import lexls_tpu.lexlsi as jli
import lexls_tpu.sequence as jseq
from lexls_tpu import types as T
from lexls_tpu.oracle import generate as gen
from lexls_tpu.parallel import batched_initial_arrays, make_sharded_solver, solve_batched


def _batch_of_problems(rng, B, n_var=6, dims=(4, 3)):
    base = gen.random_inequality_hierarchy(rng, n_var, list(dims))
    As = np.stack([base.A + 1e-2 * rng.standard_normal(base.A.shape) for _ in range(B)])
    lbs = np.broadcast_to(base.lb, (B,) + base.lb.shape).copy()
    ubs = np.broadcast_to(base.ub, (B,) + base.ub.shape).copy()
    return base, As, lbs, ubs


def test_vmap_matches_single():
    rng = np.random.default_rng(0)
    base, As, lbs, ubs = _batch_of_problems(rng, 5)
    struct = jli.Structure.of(base)
    params = T.ParametersLexLSI()
    c0, s0, n0, x0, v0 = batched_initial_arrays(base, 5)
    st = solve_batched(
        jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
        c0, s0, n0, x0, v0, jnp.asarray(base.regularization),
        struct=struct, params=params)
    for i in range(5):
        prob_i = T.InequalityHierarchy(
            A=As[i], lb=lbs[i], ub=ubs[i], dims=base.dims, n_var=base.n_var)
        ri = jli.solve(prob_i, params)
        np.testing.assert_allclose(np.asarray(st.x[i]), ri.x, atol=1e-10)
        np.testing.assert_array_equal(np.asarray(st.ctr_type[i]), ri.ctr_type)
        assert int(st.status[i]) == int(ri.status)
        assert int(st.it[i]) == ri.n_iterations


def test_sharded_matches_vmap():
    rng = np.random.default_rng(1)
    B = 8
    base, As, lbs, ubs = _batch_of_problems(rng, B)
    struct = jli.Structure.of(base)
    params = T.ParametersLexLSI()
    c0, s0, n0, x0, v0 = batched_initial_arrays(base, B)
    reg = jnp.asarray(base.regularization)

    ref = solve_batched(jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
                        c0, s0, n0, x0, v0, reg, struct=struct, params=params)

    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    fn = make_sharded_solver(mesh, struct, params)
    st, metrics = fn(jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
                     c0, s0, n0, x0, v0, reg)
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(ref.x), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(st.status), np.asarray(ref.status))
    assert int(metrics["solved"]) == int(jnp.sum(ref.status == 0))
    assert int(metrics["max_iterations"]) == int(jnp.max(ref.it))


def test_sharded_fused_matches_vmap():
    """The fused throughput tier composes with the mesh path (VERDICT
    round-2 item 3): mode="fused" == xla tier == single, on the
    8-device virtual mesh (interpret-mode kernel)."""
    rng = np.random.default_rng(3)
    B = 16  # 2 instances per device
    base, As, lbs, ubs = _batch_of_problems(rng, B)
    struct = jli.Structure.of(base)
    params = T.ParametersLexLSI()
    c0, s0, n0, x0, v0 = batched_initial_arrays(base, B)
    reg = jnp.asarray(base.regularization)

    ref = solve_batched(jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
                        c0, s0, n0, x0, v0, reg, struct=struct, params=params)

    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    fn = make_sharded_solver(mesh, struct, params, mode="fused",
                             tile=2, interpret=True, compact=1)
    st, metrics = fn(jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
                     c0, s0, n0, x0, v0, reg)
    np.testing.assert_array_equal(np.asarray(st.status), np.asarray(ref.status))
    np.testing.assert_array_equal(np.asarray(st.it), np.asarray(ref.it))
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(ref.x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(st.v), np.asarray(ref.v), atol=1e-9)
    assert int(metrics["solved"]) == int(jnp.sum(ref.status == 0))


def test_sharded_tracked_matches_vmap():
    """The round-3 tracked tier (carried-factorization loop as batched
    MXU matmuls) composes with the mesh path: mode="tracked" statuses
    and solutions match the xla tier on the 8-device virtual mesh.
    Trajectories may differ on rejected carries, so x/v/status parity is
    asserted, not iteration counts (PARITY.md residual criterion)."""
    rng = np.random.default_rng(3)
    B = 16
    base, As, lbs, ubs = _batch_of_problems(rng, B)
    struct = jli.Structure.of(base)
    params = T.ParametersLexLSI()
    c0, s0, n0, x0, v0 = batched_initial_arrays(base, B)
    reg = jnp.asarray(base.regularization)

    ref = solve_batched(jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
                        c0, s0, n0, x0, v0, reg, struct=struct, params=params)

    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    fn = make_sharded_solver(mesh, struct, params, mode="tracked",
                             tile=2, interpret=True)
    st, metrics = fn(jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
                     c0, s0, n0, x0, v0, reg)
    np.testing.assert_array_equal(np.asarray(st.status), np.asarray(ref.status))
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(ref.x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(st.v), np.asarray(ref.v), atol=1e-9)
    assert int(metrics["solved"]) == int(jnp.sum(ref.status == 0))


def test_sharded_sequence_matches_single():
    """Warm-started sequences over the mesh (config 4 x config 5
    composition): the sharded sequence solver matches the single-process
    batched sequence driver for every tier."""
    from lexls_tpu.sequence import (make_sharded_sequence_solver,
                                    solve_sequence_batched)

    rng = np.random.default_rng(9)
    base = gen.random_inequality_hierarchy(
        rng, 8, [4, 3], equality_fraction=0.2, tight_fraction=0.4)
    struct = jli.Structure.of(base)
    params = T.ParametersLexLSI()
    B, Tn, m = 16, 3, base.n_ctr
    A_seq = jnp.asarray(np.stack([
        np.stack([base.A + 2e-3 * (t + 1) * rng.standard_normal(base.A.shape)
                  for t in range(Tn)]) for _ in range(B)]))
    lb_seq = jnp.broadcast_to(jnp.asarray(base.lb), (B, Tn, m))
    ub_seq = jnp.broadcast_to(jnp.asarray(base.ub), (B, Tn, m))
    reg = jnp.asarray(base.regularization)

    ref = solve_sequence_batched(A_seq, lb_seq, ub_seq, reg,
                                 struct=struct, params=params)

    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    for mode, kw in (("xla", {}),
                     ("fused", dict(tile=2, interpret=True, compact=0)),
                     ("tracked", dict(tile=2, interpret=True, compact=0))):
        fn = make_sharded_sequence_solver(mesh, struct, params, mode=mode,
                                          **kw)
        outs, metrics = fn(A_seq, lb_seq, ub_seq, reg)
        np.testing.assert_array_equal(np.asarray(outs[2]),
                                      np.asarray(ref[2]), err_msg=mode)
        # v is the pivot-set-invariant quantity (PARITY.md)
        np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(ref[1]),
                                   atol=1e-6, err_msg=mode)
        assert int(metrics["solved"]) == int(jnp.sum(ref[2] == 0)), mode


def test_sequence_matches_host_warm_start():
    """On-device scan warm-start == host loop passing x/active set."""
    rng = np.random.default_rng(2)
    base = gen.random_inequality_hierarchy(rng, 6, [4, 3])
    struct = jli.Structure.of(base)
    params = T.ParametersLexLSI()
    m = base.n_ctr
    Tn = 5
    As = np.stack([base.A + 2e-3 * t * rng.standard_normal(base.A.shape)
                   for t in range(Tn)])
    lbs = np.broadcast_to(base.lb, (Tn, m)).copy()
    ubs = np.broadcast_to(base.ub, (Tn, m)).copy()

    xs, vs, statuses, its, nfs, cts = jseq.solve_sequence(
        jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
        jnp.asarray(base.regularization), struct=struct, params=params)

    # host reference loop
    prev_x, prev_ct = None, None
    for t in range(Tn):
        prob_t = T.InequalityHierarchy(
            A=As[t], lb=lbs[t], ub=ubs[t], dims=base.dims, n_var=base.n_var)
        res = jli.solve(prob_t, params, x0=prev_x, active_guess=prev_ct)
        np.testing.assert_allclose(np.asarray(xs[t]), res.x, atol=1e-9)
        np.testing.assert_array_equal(np.asarray(cts[t]), res.ctr_type)
        assert int(statuses[t]) == int(res.status)
        assert int(its[t]) == res.n_iterations
        prev_x, prev_ct = res.x, res.ctr_type

    # warm-started steps should be much cheaper than the cold one
    assert int(its[1:].max()) <= int(its[0])


def test_sequence_batched_shapes():
    rng = np.random.default_rng(3)
    base = gen.random_inequality_hierarchy(rng, 5, [3, 2])
    struct = jli.Structure.of(base)
    B, Tn, m = 3, 4, base.n_ctr
    As = np.stack([np.stack([base.A + 1e-3 * rng.standard_normal(base.A.shape)
                             for _ in range(Tn)]) for _ in range(B)])
    lbs = np.broadcast_to(base.lb, (B, Tn, m)).copy()
    ubs = np.broadcast_to(base.ub, (B, Tn, m)).copy()
    xs, vs, statuses, its, nfs, cts = jseq.solve_sequence_batched(
        jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
        jnp.asarray(base.regularization), struct=struct,
        params=T.ParametersLexLSI())
    assert xs.shape == (B, Tn, base.n_var)
    assert np.all(np.asarray(statuses) == 0)


def test_host_mesh_2d_matches_vmap():
    """2-axis (dcn, ici) mesh: 2 hosts x 4 chips on the virtual devices."""
    rng = np.random.default_rng(5)
    B = 8
    base, As, lbs, ubs = _batch_of_problems(rng, B)
    struct = jli.Structure.of(base)
    params = T.ParametersLexLSI()
    c0, s0, n0, x0, v0 = batched_initial_arrays(base, B)
    reg = jnp.asarray(base.regularization)

    ref = solve_batched(jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
                        c0, s0, n0, x0, v0, reg, struct=struct, params=params)

    from lexls_tpu.parallel import make_host_mesh, make_sharded_solver_2d
    mesh = make_host_mesh(2, 4)
    fn = make_sharded_solver_2d(mesh, struct, params)
    st, metrics = fn(jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
                     c0, s0, n0, x0, v0, reg)
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(ref.x), atol=1e-12)
    assert int(metrics["solved"]) == int(jnp.sum(ref.status == 0))


@pytest.mark.parametrize("use_pallas", [False, True])
def test_solve_core_batched_matches_vmap(use_pallas):
    """Natively-batched solver (Pallas panels) == vmapped solve_core."""
    rng = np.random.default_rng(9)
    B = 4
    base, As, lbs, ubs = _batch_of_problems(rng, B)
    struct = jli.Structure.of(base)
    params = T.ParametersLexLSI()
    c0, s0, n0, x0, v0 = batched_initial_arrays(base, B)
    reg = jnp.asarray(base.regularization)
    ref = solve_batched(jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
                        c0, s0, n0, x0, v0, reg, struct=struct, params=params)
    st = jli.solve_core_batched(
        jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
        c0, s0, n0, x0, v0, reg, struct=struct, params=params,
        x_guess_specified=False, v0_specified=False, use_pallas=use_pallas)
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(ref.x), atol=1e-10)
    np.testing.assert_array_equal(np.asarray(st.ctr_type), np.asarray(ref.ctr_type))
    np.testing.assert_array_equal(np.asarray(st.status), np.asarray(ref.status))
    np.testing.assert_array_equal(np.asarray(st.it), np.asarray(ref.it))


def test_sequence_batched_native_matches_vmap():
    rng = np.random.default_rng(12)
    base = gen.random_inequality_hierarchy(rng, 5, [3, 2])
    struct = jli.Structure.of(base)
    B, Tn, m = 4, 3, base.n_ctr
    As = np.stack([np.stack([base.A + 1e-3 * rng.standard_normal(base.A.shape)
                             for _ in range(Tn)]) for _ in range(B)])
    lbs = np.broadcast_to(base.lb, (B, Tn, m)).copy()
    ubs = np.broadcast_to(base.ub, (B, Tn, m)).copy()
    params = T.ParametersLexLSI()
    ref = jseq.solve_sequence_batched(
        jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
        jnp.asarray(base.regularization), struct=struct, params=params)
    out = jseq.solve_sequence_batched_native(
        jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
        jnp.asarray(base.regularization), struct=struct, params=params)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=1e-10)
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(ref[2]))
    np.testing.assert_array_equal(np.asarray(out[3]), np.asarray(ref[3]))


@pytest.mark.parametrize("use_pallas", [False, True])
def test_solve_core_batched_simple_bounds(use_pallas):
    """Natively-batched solver on simple-bounds hierarchies (fixed
    variables flow through the Pallas panels)."""
    rng = np.random.default_rng(21)
    base = gen.random_inequality_hierarchy(rng, 6, [3, 3, 2], simple_bounds=True)
    B = 4
    As = np.stack([base.A for _ in range(B)])
    # perturb only the general rows (the unit selector rows must stay)
    for i in range(B):
        As[i][3:] += 1e-2 * rng.standard_normal(As[i][3:].shape)
    lbs = np.broadcast_to(base.lb, (B,) + base.lb.shape).copy()
    ubs = np.broadcast_to(base.ub, (B,) + base.ub.shape).copy()
    struct = jli.Structure.of(base)
    params = T.ParametersLexLSI()
    c0, s0, n0, x0, v0 = batched_initial_arrays(base, B)
    reg = jnp.asarray(base.regularization)

    ref = solve_batched(jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
                        c0, s0, n0, x0, v0, reg, struct=struct, params=params)
    st = jli.solve_core_batched(
        jnp.asarray(As), jnp.asarray(lbs), jnp.asarray(ubs),
        c0, s0, n0, x0, v0, reg, struct=struct, params=params,
        x_guess_specified=False, v0_specified=False, use_pallas=use_pallas)
    np.testing.assert_allclose(np.asarray(st.x), np.asarray(ref.x), atol=1e-10)
    np.testing.assert_array_equal(np.asarray(st.ctr_type), np.asarray(ref.ctr_type))
    np.testing.assert_array_equal(np.asarray(st.it), np.asarray(ref.it))
