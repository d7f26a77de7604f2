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
    by Newton–Schulz doubling; strictly-lower entries of ``R`` are
    ignored.

    With X0 = diag(1/r_ii), the residual E0 = I - X0 R is strictly upper
    triangular (nilpotent of index K); each iteration X <- (I + E) X,
    E <- E^2 doubles the nilpotency degree, so the inverse is EXACT after
    ceil(log2(K)) iterations — 2 full-size batched matmuls each, instead
    of the many tiny operations a divide-and-conquer or substitution
    scheme produces (TPUs are throughput machines; few big matmuls beat
    many small ones)."""
    import math

    K = R.shape[-1]
    Rt = jnp.triu(R)
    d = jnp.diagonal(Rt, axis1=-2, axis2=-1)
    X = jnp.eye(K, dtype=R.dtype) * (1.0 / d)[..., :, None]
    if K == 1:
        return X
    E = jnp.eye(K, dtype=R.dtype) - X @ Rt
    for _ in range(math.ceil(math.log2(K))):
        X = X + E @ X
        E = E @ E
    return X


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
