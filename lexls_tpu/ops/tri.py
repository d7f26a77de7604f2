"""Matmul-based triangular inversion / solves for small systems.

XLA's TriangularSolve lowers poorly on TPU for the small (K <= ~128)
batched systems this solver produces (WY T-factors, per-level R blocks):
each solve costs ~1-2 ms at B=512.  Inverting the triangular matrix by
divide-and-conquer instead turns the whole operation into a log2(K)-deep
tree of small matmuls — pure MXU work:

    T = [[T11, T12],   T^{-1} = [[T11^-1, -T11^-1 T12 T22^-1],
         [0,   T22]]             [0,        T22^-1          ]]

Accuracy: one triangular inversion is backward-stable enough here — the
R blocks come from Householder QR of full-rank panels (condition bounded
by the rank test) and the WY T-factor has diagonal 1/tau with
tau in [1, 2].  The float64 oracle-parity suite runs through this same
path and holds at 1e-9.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tri_inv_upper(R: jax.Array) -> jax.Array:
    """Inverse of an upper-triangular matrix (batched over leading dims)
    by divide-and-conquer; strictly-lower entries of ``R`` are ignored."""
    K = R.shape[-1]
    if K == 1:
        return 1.0 / R
    if K == 2:
        a = R[..., 0, 0]
        b = R[..., 0, 1]
        d = R[..., 1, 1]
        ia = 1.0 / a
        id_ = 1.0 / d
        out = jnp.zeros_like(R)
        out = out.at[..., 0, 0].set(ia)
        out = out.at[..., 1, 1].set(id_)
        out = out.at[..., 0, 1].set(-ia * b * id_)
        return out
    K1 = K // 2
    A11 = tri_inv_upper(R[..., :K1, :K1])
    A22 = tri_inv_upper(R[..., K1:, K1:])
    B12 = -A11 @ (R[..., :K1, K1:] @ A22)
    top = jnp.concatenate([A11, B12], axis=-1)
    zeros = jnp.zeros(R.shape[:-2] + (K - K1, K1), R.dtype)
    bot = jnp.concatenate([zeros, A22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def solve_triu(R: jax.Array, b: jax.Array) -> jax.Array:
    """x with triu(R) x = b via explicit inversion (b: (..., K) or
    (..., K, r))."""
    Ri = tri_inv_upper(jnp.triu(R))
    if b.ndim == R.ndim - 1:
        return jnp.einsum("...ij,...j->...i", Ri, b)
    return Ri @ b


def solve_tril(L: jax.Array, b: jax.Array) -> jax.Array:
    """x with tril(L) x = b (via the transposed upper inverse)."""
    Ri = tri_inv_upper(jnp.triu(jnp.swapaxes(L, -1, -2)))
    RiT = jnp.swapaxes(Ri, -1, -2)
    if b.ndim == L.ndim - 1:
        return jnp.einsum("...ij,...j->...i", RiT, b)
    return RiT @ b


def solve_triu_right(B: jax.Array, R: jax.Array) -> jax.Array:
    """X with X triu(R) = B (solve on the right)."""
    Ri = tri_inv_upper(jnp.triu(R))
    return B @ Ri
