"""Standalone batched numerical differentiation utilities.

Equivalent of the reference's torch_numdiff.py (grad/hess via central
differences over batched functions, torch_numdiff.py:15-46). In JAX these
are mostly superseded by jax.grad/jax.hessian, but they remain useful as a
derivative oracle independent of autodiff (e.g. validating Pallas-kernel
Jacobians or the envs' analytic derivatives).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def grad(fn: Callable, x: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Central-difference gradient of a batched function.

    fn: [B, n] -> [B]; x: [B, n]. Returns [B, n].
    Reference torch_numdiff.py:15-30.
    """
    n = x.shape[-1]
    eye = jnp.eye(n, dtype=x.dtype) * eps

    def col(e):
        return (fn(x + e) - fn(x - e)) / (2.0 * eps)

    return jax.vmap(col)(eye).T  # [B, n]


def hess(fn: Callable, x: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Central-difference Hessian of a batched function.

    fn: [B, n] -> [B]; x: [B, n]. Returns [B, n, n] (symmetrized).
    Reference torch_numdiff.py:33-46.
    """
    n = x.shape[-1]
    eye = jnp.eye(n, dtype=x.dtype) * eps

    def row(e):
        return grad(fn, x + e, eps=eps) - grad(fn, x - e, eps=eps)

    H = jax.vmap(row)(eye) / (2.0 * eps)  # [n, B, n]
    H = jnp.moveaxis(H, 0, 1)  # [B, n, n]
    return 0.5 * (H + jnp.swapaxes(H, -1, -2))
