"""Affine dynamics x' = A x + B u + c (reference dynamics.py:159-202).

Params pytree: dict(A [nx,nx], B [nx,nu], c [nx] or None). The Jacobian is
(A, B) exactly, provided as a hand-written jacobian_fn (no jacfwd needed).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .base import Dynamics


def make(n_state: int, n_ctrl: int) -> Dynamics:
    def step(x, u, params):
        A, B = params["A"], params["B"]
        out = A @ x + B @ u
        c = params.get("c")
        if c is not None:
            out = out + c
        return out

    def jacobian(x, u, params):
        return params["A"], params["B"]

    return Dynamics(
        n_state=n_state,
        n_ctrl=n_ctrl,
        step=step,
        jacobian=jacobian,
    )


def params(A, B, c: Optional[jnp.ndarray] = None):
    return {"A": jnp.asarray(A), "B": jnp.asarray(B), "c": None if c is None else jnp.asarray(c)}
