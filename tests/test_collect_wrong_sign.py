"""Collect-all-wrong-signs sensitivity (``lexlse.h:511-602``): the
vectorized device pass vs the oracle's sequential reference sweep."""

import jax.numpy as jnp
import numpy as np
import pytest

import lexls_tpu.lexlsi as jli
import lexls_tpu.oracle.lexlsi as oli
import lexls_tpu.types as T
from lexls_tpu.oracle import generate as gen


def _random_active_set(rng, prob):
    """An arbitrary (non-optimal) working set: EQ rows stay EQ, a random
    subset of the rest activates at a random side."""
    ct = prob.initial_ctr_type().astype(np.int32)
    free = np.where(ct == int(T.CtrType.INACTIVE))[0]
    pick = rng.choice(free, size=max(1, len(free) // 2), replace=False)
    ct[pick] = rng.choice(
        [int(T.CtrType.ACTIVE_LB), int(T.CtrType.ACTIVE_UB)], size=len(pick))
    return ct


def _compare_at(prob, ct, params):
    struct = jli.Structure.of(prob)
    s = oli._OracleLexLSI(prob, params)
    s.ctr_type = ct.copy()
    wrong, marked, lam = jli.collect_wrong_sign(
        jnp.asarray(prob.A), jnp.asarray(prob.lb), jnp.asarray(prob.ub),
        jnp.asarray(ct), jnp.asarray(prob.regularization), struct, params)
    wrong, marked, lam = (np.asarray(wrong), np.asarray(marked),
                          np.asarray(lam))
    any_wrong = False
    for j in range(len(struct.lexlse_dims)):
        ow, om = s.collect_wrong_sign(j)
        ju = j + struct.obj_offset
        assert sorted(np.where(wrong[:, ju])[0].tolist()) == ow, (j, ow)
        assert sorted(np.where(marked[:, ju])[0].tolist()) == om, (j, om)
        any_wrong = any_wrong or bool(ow)
    olam = s.get_lambda()
    np.testing.assert_allclose(lam, olam, atol=1e-9, rtol=1e-9)
    return any_wrong


@pytest.mark.parametrize("seed", range(3))
def test_collect_parity_general(seed):
    rng = np.random.default_rng(900 + seed)
    prob = gen.random_inequality_hierarchy(rng, 8, [4, 3, 3])
    params = T.ParametersLexLSI()
    ct = _random_active_set(rng, prob)
    _compare_at(prob, ct, params)


def test_collect_parity_simple_bounds():
    rng = np.random.default_rng(910)
    prob = gen.random_inequality_hierarchy(
        rng, 8, [5, 4, 3], simple_bounds=True)
    params = T.ParametersLexLSI()
    ct = _random_active_set(rng, prob)
    _compare_at(prob, ct, params)


def test_collect_finds_wrong_signs_somewhere():
    """Fully-activated working sets must actually produce wrong-sign
    multipliers (they do: m > n), or the parity above is vacuous."""
    params = T.ParametersLexLSI()
    found = False
    for seed in range(3):
        rng = np.random.default_rng(920 + seed)
        prob = gen.random_inequality_hierarchy(rng, 8, [4, 3, 3])
        ct = prob.initial_ctr_type().astype(np.int32)
        free = np.where(ct == int(T.CtrType.INACTIVE))[0]
        ct[free] = rng.choice(
            [int(T.CtrType.ACTIVE_LB), int(T.CtrType.ACTIVE_UB)],
            size=len(free))
        found = found or _compare_at(prob, ct, params)
    assert found


def test_collect_empty_at_optimum():
    """At the solved working set no wrong-sign multiplier survives (the
    solver's own termination criterion, ``lexlsi.h:1229``)."""
    rng = np.random.default_rng(930)
    prob = gen.random_inequality_hierarchy(rng, 8, [4, 3, 3])
    params = T.ParametersLexLSI()
    res = jli.solve(prob, params)
    assert res.status == T.TerminationStatus.PROBLEM_SOLVED
    struct = jli.Structure.of(prob)
    wrong, _, _ = jli.collect_wrong_sign(
        jnp.asarray(prob.A), jnp.asarray(res.lb), jnp.asarray(res.ub),
        jnp.asarray(res.ctr_type), jnp.asarray(prob.regularization),
        struct, params)
    assert not bool(jnp.any(wrong))
