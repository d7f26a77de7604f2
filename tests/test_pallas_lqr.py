"""Pallas panel-factorization kernel: parity vs vmapped factorize_fast.

On CPU the kernel runs in interpreter mode (same math, same code path as
the Mosaic-compiled TPU kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lexls_tpu.lexlse as jle
from lexls_tpu.ops import factorize_fast_batched
from lexls_tpu.oracle import generate as gen
from lexls_tpu.types import ParametersLexLSE


def _batch(seed, B, n=10, dims=(4, 3), ranks=(3, 2)):
    rng = np.random.default_rng(seed)
    As, bs = [], []
    for _ in range(B):
        A, b, dims_, _, _ = gen.random_equality_hierarchy(rng, n, list(dims), list(ranks))
        As.append(A)
        bs.append(b)
    return np.stack(As), np.stack(bs), dims_


@pytest.mark.parametrize("use_pallas", [False, True])
def test_batched_matches_vmapped_fast(use_pallas):
    B = 4
    As, bs, dims = _batch(0, B)
    params = ParametersLexLSE()
    fb = factorize_fast_batched(
        jnp.asarray(As), jnp.asarray(bs), dims, params,
        use_pallas=use_pallas, tile=2, interpret=True)
    fv = jax.vmap(lambda A, b: jle.factorize_fast(A, b, dims, params))(
        jnp.asarray(As), jnp.asarray(bs))
    np.testing.assert_array_equal(np.asarray(fb.perm), np.asarray(fv.perm))
    np.testing.assert_array_equal(np.asarray(fb.ranks), np.asarray(fv.ranks))
    np.testing.assert_array_equal(np.asarray(fb.rank_row), np.asarray(fv.rank_row))
    np.testing.assert_allclose(np.asarray(fb.lod), np.asarray(fv.lod),
                               atol=1e-12, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(fb.hh), np.asarray(fv.hh), atol=1e-13)
    # downstream solves agree
    xb = jax.vmap(jle.solve)(fb)
    xv = jax.vmap(jle.solve)(fv)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(xv), atol=1e-12)


def test_batched_with_fixed_variables():
    B, n = 4, 10
    As, bs, dims = _batch(1, B)
    rng = np.random.default_rng(2)
    fm = np.zeros((B, n), bool)
    fv_ = np.zeros((B, n))
    for i in range(B):
        idx = rng.permutation(n)[:2]
        fm[i, idx] = True
        fv_[i, idx] = rng.standard_normal(2)
    params = ParametersLexLSE()
    fb = factorize_fast_batched(
        jnp.asarray(As), jnp.asarray(bs), dims, params,
        fixed_mask=jnp.asarray(fm), fixed_val=jnp.asarray(fv_),
        use_pallas=True, tile=2, interpret=True)
    fvm = jax.vmap(lambda A, b, m_, v_: jle.factorize_fast(
        A, b, dims, params, fixed_mask=m_, fixed_val=v_))(
        jnp.asarray(As), jnp.asarray(bs), jnp.asarray(fm), jnp.asarray(fv_))
    np.testing.assert_allclose(np.asarray(fb.lod), np.asarray(fvm.lod),
                               atol=1e-12, rtol=1e-12)
    xb = jax.vmap(jle.solve)(fb)
    xv = jax.vmap(jle.solve)(fvm)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(xv), atol=1e-12)
