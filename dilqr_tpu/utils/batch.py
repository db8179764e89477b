"""Batched small-matrix linear algebra helpers.

TPU-native equivalents of the reference's util.py:32-72 (bger/bmv/bquad/
bdot/bdiag/eclamp). All contractions request float32 accumulation
(``precision=HIGHEST``) because TPU matmuls otherwise default to bf16-ish
passes; the solver's Riccati conditioning needs full f32 (SURVEY.md section 7,
"Numerical parity").

Everything is shape-polymorphic over leading batch dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

HIGHEST = lax.Precision.HIGHEST


def bmv(X: jax.Array, y: jax.Array) -> jax.Array:
    """Batched matrix-vector: [..., n, m] @ [..., m] -> [..., n]."""
    return jnp.einsum("...nm,...m->...n", X, y, precision=HIGHEST)


def bger(x: jax.Array, y: jax.Array) -> jax.Array:
    """Batched outer product: [..., n], [..., m] -> [..., n, m]."""
    return jnp.einsum("...n,...m->...nm", x, y, precision=HIGHEST)


def bquad(x: jax.Array, Q: jax.Array) -> jax.Array:
    """Batched quadratic form: x^T Q x -> [...]."""
    return jnp.einsum("...n,...nm,...m->...", x, Q, x, precision=HIGHEST)


def bdot(x: jax.Array, y: jax.Array) -> jax.Array:
    """Batched dot product -> [...]."""
    return jnp.einsum("...n,...n->...", x, y, precision=HIGHEST)


def bmm(A: jax.Array, B: jax.Array) -> jax.Array:
    """Batched matmul with f32 accumulation."""
    return jnp.einsum("...nk,...km->...nm", A, B, precision=HIGHEST)


def btr(A: jax.Array) -> jax.Array:
    """Batched matrix transpose on the last two dims."""
    return jnp.swapaxes(A, -1, -2)


def clamp(x: jax.Array, lower, upper) -> jax.Array:
    """Functional clamp; replaces the reference's in-place eclamp
    (util.py:58-72). lower/upper may be scalars or arrays broadcastable
    to x (None disables a side)."""
    if lower is not None:
        x = jnp.maximum(x, lower)
    if upper is not None:
        x = jnp.minimum(x, upper)
    return x


def solve_psd(H: jax.Array, B: jax.Array) -> jax.Array:
    """Batched solve H X = B for small PSD-ish H.

    The reference uses LU (pnqp.py:53-54) or pinverse (lqr_step.py:89-94) on
    n<=16 matrices; on TPU a general batched solve lowers to a vectorized
    LU, which is what we want. B may be [..., n] or [..., n, m].
    """
    vec = B.ndim == H.ndim - 1
    if vec:
        B = B[..., None]
    X = jnp.linalg.solve(H, B)
    return X[..., 0] if vec else X
