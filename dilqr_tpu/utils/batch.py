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


def clamp_t(x: jax.Array, lower, upper) -> jax.Array:
    """Clamp with torch.clamp's DERIVATIVE convention: gradient 1 on the
    closed interval [lower, upper] including the endpoints. jnp.clip
    (min/max primitives) averages tangents at ties, giving derivative 0.5
    exactly ON a bound -- and a box-constrained line search parks controls
    exactly on their bounds, so every saturated Jacobian column through an
    in-dynamics torque clamp differed from the reference's autograd by 2x
    (found by scripts/fuzz_vs_reference.py; values are identical either
    way, only AUTO_DIFF linearizations see this)."""
    return jnp.where(x > upper, upper, jnp.where(x < lower, lower, x))


def inv_small(A: jax.Array) -> jax.Array:
    """Closed-form batched inverse for n <= 3 (reciprocal / Cramer /
    adjugate). Elementwise over the batch -- no LU factorization HLO, which
    both compiles and runs much faster on TPU at these sizes."""
    n = A.shape[-1]
    if n == 1:
        return 1.0 / A
    if n == 2:
        det = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
        r = (1.0 / det)[..., None, None]
        row0 = jnp.stack([A[..., 1, 1], -A[..., 0, 1]], -1)
        row1 = jnp.stack([-A[..., 1, 0], A[..., 0, 0]], -1)
        return jnp.stack([row0, row1], -2) * r
    # n == 3: adjugate / det
    a = [[A[..., i, j] for j in range(3)] for i in range(3)]
    c00 = a[1][1] * a[2][2] - a[1][2] * a[2][1]
    c01 = a[1][2] * a[2][0] - a[1][0] * a[2][2]
    c02 = a[1][0] * a[2][1] - a[1][1] * a[2][0]
    det = a[0][0] * c00 + a[0][1] * c01 + a[0][2] * c02
    r = 1.0 / det
    c10 = a[0][2] * a[2][1] - a[0][1] * a[2][2]
    c11 = a[0][0] * a[2][2] - a[0][2] * a[2][0]
    c12 = a[0][1] * a[2][0] - a[0][0] * a[2][1]
    c20 = a[0][1] * a[1][2] - a[0][2] * a[1][1]
    c21 = a[0][2] * a[1][0] - a[0][0] * a[1][2]
    c22 = a[0][0] * a[1][1] - a[0][1] * a[1][0]
    rows = [
        jnp.stack([c00 * r, c10 * r, c20 * r], -1),
        jnp.stack([c01 * r, c11 * r, c21 * r], -1),
        jnp.stack([c02 * r, c12 * r, c22 * r], -1),
    ]
    return jnp.stack(rows, -2)


def solve_psd(H: jax.Array, B: jax.Array) -> jax.Array:
    """Batched solve H X = B for small PSD-ish H.

    The reference uses LU (pnqp.py:53-54) or pinverse (lqr_step.py:89-94) on
    n<=16 matrices. For n <= 3 a closed-form inverse beats the batched-LU
    HLO on both compile time and runtime (and is the only n<=3 path that
    works for f64 on TPU, where batched LU is f32-only); larger sizes take
    the vectorized LU. B may be [..., n] or [..., n, m].

    Conditioning caveat: the adjugate/det inverse loses ~cond(H) ulps
    relative to a pivoted LU solve. The solver's Hessians are regularized
    (pnqp's 1e-11 ridge) and the f64 golden suite passes, but for f64 --
    where callers are after maximum accuracy -- one step of iterative
    refinement (one extra bmm pair) recovers the gap for stiff user costs.
    """
    vec = B.ndim == H.ndim - 1
    if vec:
        B = B[..., None]
    if H.shape[-1] <= 3:
        Hi = inv_small(H)
        X = bmm(Hi, B)
        if H.dtype == jnp.float64:
            X = X + bmm(Hi, B - bmm(H, X))
    else:
        X = jnp.linalg.solve(H, B)
    return X[..., 0] if vec else X
