"""Control-passthrough dynamics wrapper for the slew-rate augmented state.

TPU-native equivalent of the reference's CtrlPassthroughDynamics
(dynamics.py:133-156): wraps a base dynamics so that the augmented state
x_tilde = (u_{t-1}, x) steps as x_tilde' = (u_t, f(x, u_t)). Used by the
slew-rate penalty transformation (core/solver.augment_slew_rate, reference
mpc.py:339-445).
"""
from __future__ import annotations

import jax.numpy as jnp

from .base import Dynamics


def make(base: Dynamics) -> Dynamics:
    """Wrap ``base`` for the augmented state (u_{t-1}, x)."""
    nu = base.n_ctrl

    def aug(fn):
        def stepped(x_aug, u, p):
            x = x_aug[nu:]
            return jnp.concatenate([u, fn(x, u, p)])

        return stepped

    return Dynamics(
        n_state=nu + base.n_state,
        n_ctrl=nu,
        step=aug(base.step),
        step_unclamped=(
            aug(base.linearize_point)
            if base.step_unclamped is not None
            else None
        ),
        lower=base.lower,
        upper=base.upper,
        mpc_eps=base.mpc_eps,
        linesearch_decay=base.linesearch_decay,
        max_linesearch_iter=base.max_linesearch_iter,
    )
