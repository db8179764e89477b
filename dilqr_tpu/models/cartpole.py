"""Cartpole, 5-state (x, x_dot, cos th, sin th, th_dot), 1 control
(force, +-100). TPU-native port of the reference env behavior
(env_dx/cartpole.py:29-97): the classic Euler-integrated cartpole with
dt=0.05 and params theta = (gravity, masscart, masspole, length).
Jacobians come from jax.jacfwd of `step_unclamped`, replacing ~740 lines of
symbolic expressions (cartpole.py:99-839).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.kernel_math import rotate_cs
from ..utils.batch import clamp_t
from .base import Dynamics

DT = 0.05
FORCE_MAG = 100.0
N_STATE, N_CTRL = 5, 1

GOAL_STATE = jnp.array([0.0, 0.0, 1.0, 0.0, 0.0], jnp.float32)
GOAL_WEIGHTS = jnp.array([0.1, 0.1, 1.0, 1.0, 0.1], jnp.float32)
CTRL_PENALTY = 1e-3


def _step(state, u, params, clamp_u: bool):
    if not isinstance(params, (tuple, list)):
        # dtype follows the state; a tuple/list of already-traced scalars
        # (the Pallas in-kernel path, which cannot form small 1-D vectors)
        # unpacks directly below
        params = jnp.asarray(params, state.dtype)
    gravity, masscart, masspole, length = params
    total_mass = masspole + masscart
    polemass_length = masspole * length

    uu = u[0]
    if clamp_u:
        # bounds pinned to the operand dtype: jnp.clip materializes
        # python-float bounds as STRONG f64 under jax_enable_x64,
        # which Mosaic cannot cast back inside the fused kernel
        lim = uu.dtype.type(FORCE_MAG)
        uu = clamp_t(uu, -lim, lim)  # torch-derivative clamp (batch.clamp_t)

    x, dx, cos_th, sin_th, dth = state

    cart_in = (uu + polemass_length * dth**2 * sin_th) / total_mass
    th_acc = (gravity * sin_th - cos_th * cart_in) / (
        length * (4.0 / 3.0 - masspole * cos_th**2 / total_mass)
    )
    xacc = cart_in - polemass_length * th_acc * cos_th / total_mass

    x = x + DT * dx
    dx = dx + DT * xacc
    # reference advances by the PRE-update th_dot (cartpole.py:90); the
    # angle is only advanced and re-embedded, so skip its atan2 recovery
    # in kernels (rotate_cs; exact sequential form off-kernel)
    new_cos, new_sin = rotate_cs(cos_th, sin_th, DT * dth)
    dth = dth + DT * th_acc
    return jnp.stack([x, dx, new_cos, new_sin, dth])


def default_params() -> jnp.ndarray:
    """(gravity, masscart, masspole, length) = (9.8, 1.0, 0.1, 0.5)
    (reference cartpole.py:39)."""
    return jnp.array([9.8, 1.0, 0.1, 0.5], jnp.float32)


def get_true_obj(n_ctrl: int = N_CTRL):
    """Diagonal cost spec (reference cartpole.py:859-867)."""
    q = jnp.concatenate([GOAL_WEIGHTS, CTRL_PENALTY * jnp.ones(n_ctrl, jnp.float32)])
    px = -jnp.sqrt(GOAL_WEIGHTS) * GOAL_STATE
    p = jnp.concatenate([px, jnp.zeros(n_ctrl, jnp.float32)])
    return q, p


def make() -> Dynamics:
    return Dynamics(
        n_state=N_STATE,
        n_ctrl=N_CTRL,
        step=lambda x, u, p: _step(x, u, p, clamp_u=True),
        step_unclamped=lambda x, u, p: _step(x, u, p, clamp_u=False),
        lower=-FORCE_MAG,
        upper=FORCE_MAG,
        # per-env MPC hyper-parameters (reference cartpole.py:60-62)
        mpc_eps=1e-4,
        linesearch_decay=0.5,
        max_linesearch_iter=2,
    )
