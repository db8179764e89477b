"""Restarted GMRES on pytrees, built from plain lax/jnp ops.

jax.scipy.sparse.linalg.gmres lowers to ``lax.custom_linear_solve`` which
cannot be invoked inside a ``jax.custom_vjp`` backward rule under current
JAX (its transpose machinery leaks internal accumulator objects). The IFT
backward (diff/ift.py) runs exactly there, so this module provides a
self-contained GMRES(m): Arnoldi with (zero-padded) full-matrix
Gram-Schmidt -- uninitialized Krylov rows are zero vectors, so no masking
is needed -- and a dense least-squares solve of the (m+1, m) Hessenberg
system per cycle. Everything is fixed-shape; cycles run under
``lax.while_loop`` with an early exit on the residual norm.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

_EPS = 1e-30


def gmres(
    matvec: Callable[[Any], Any],
    b: Any,
    x0: Optional[Any] = None,
    tol: float = 1e-6,
    restart: int = 20,
    maxiter: int = 3,
    return_info: bool = False,
) -> Any:
    """Solve A x = b for the linear operator ``matvec`` acting on pytrees.

    Returns the solution pytree; with ``return_info=True`` returns
    ``(x, res_norm, b_norm)`` so callers can detect non-convergence
    (``res_norm > tol * b_norm``). ``tol`` is relative to ||b||;
    total matvecs <= maxiter * (restart + 1).
    """
    b_flat, unravel = ravel_pytree(b)
    n = b_flat.shape[0]
    dtype = b_flat.dtype

    def mv(xf):
        return ravel_pytree(matvec(unravel(xf)))[0]

    x = ravel_pytree(x0)[0] if x0 is not None else jnp.zeros_like(b_flat)
    b_norm = jnp.linalg.norm(b_flat)
    atol = tol * (b_norm + _EPS)

    m = restart

    def cycle(x):
        r = b_flat - mv(x)
        beta = jnp.linalg.norm(r)
        V0 = jnp.zeros((m + 1, n), dtype).at[0].set(r / (beta + _EPS))
        H0 = jnp.zeros((m + 1, m), dtype)

        def arnoldi(i, carry):
            V, H = carry
            w = mv(V[i])
            # rows j > i of V are zero, so this is exact Gram-Schmidt
            h = V @ w
            w = w - h @ V
            hn = jnp.linalg.norm(w)
            V = V.at[i + 1].set(w / (hn + _EPS))
            H = H.at[:, i].set(h).at[i + 1, i].set(hn)
            return V, H

        V, H = lax.fori_loop(0, m, arnoldi, (V0, H0))
        e1 = jnp.zeros((m + 1,), dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        x = x + y @ V[:m]
        res = jnp.linalg.norm(b_flat - mv(x))
        return x, res

    def cond(carry):
        _, res, i = carry
        return (res > atol) & (i < maxiter)

    def body(carry):
        x, _, i = carry
        x, res = cycle(x)
        return x, res, i + 1

    r0 = jnp.linalg.norm(b_flat - mv(x))
    x, res, _ = lax.while_loop(cond, body, (x, r0, jnp.int32(0)))
    if return_info:
        return unravel(x), res, b_norm
    return unravel(x)
