"""Torque-limited pendulum swing-up, 3-state (cos th, sin th, th_dot),
1 control. TPU-native port of the reference env behavior
(env_dx/pendulum.py:29-125): Euler step

    th_dot' = th_dot + dt * (1.5 g/l sin th + 3 u / (m l^2))
    th'     = th + dt * th_dot'

with dt=0.05 and torque clamp +-2 inside the step (pendulum.py:81-91).
Params theta = (g, m, l) (simple) or (g, m, l, d, b) (damped/biased,
pendulum.py:39-49). Jacobians and all parameter-derivative tensors come
from jax.jacfwd of `step_unclamped`, replacing the reference's ~390 lines
of symbolic expressions (pendulum.py:127-515) which differentiate the same
un-clamped physics (pendulum.py:444-475).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.kernel_math import atan2, rotate_cs
from ..utils.batch import clamp_t
from .base import Dynamics

DT = 0.05
MAX_TORQUE = 2.0
N_STATE, N_CTRL = 3, 1

GOAL_STATE = jnp.array([1.0, 0.0, 0.0], jnp.float32)
GOAL_WEIGHTS = jnp.array([1.0, 1.0, 0.1], jnp.float32)
CTRL_PENALTY = 1e-3


def _step(x, u, params, clamp_u: bool, simple: bool):
    if not isinstance(params, (tuple, list)):
        # dtype follows the state; tuple/list of traced scalars (the Pallas
        # in-kernel path) unpacks directly below
        params = jnp.asarray(params, x.dtype)
    if simple:
        g, m, l = params
    else:
        g, m, l, d, b = params
    uu = u[0]
    if clamp_u:
        # dtype-pinned bounds: see models/cartpole.py (x64 + Mosaic)
        lim = uu.dtype.type(MAX_TORQUE)
        uu = clamp_t(uu, -lim, lim)  # torch-derivative clamp (batch.clamp_t)
    cos_th, sin_th, dth = x
    if simple:
        # the angle is only advanced and re-embedded: skip its recovery
        # (rotate_cs == atan2 -> cos/sin(th + delta) to f32 rounding;
        # exact sequential form off-kernel)
        newdth = dth + DT * (-3.0 * g / (2.0 * l) * (-sin_th) + 3.0 * uu / (m * l**2))
        newcos, newsin = rotate_cs(cos_th, sin_th, newdth * DT)
        return jnp.stack([newcos, newsin, newdth])
    # the complex variant's damping term -d*th needs the absolute angle
    th = atan2(sin_th, cos_th)
    sin_th_bias = jnp.sin(th + b)
    newdth = dth + DT * (
        -3.0 * g / (2.0 * l) * (-sin_th_bias) + 3.0 * uu / (m * l**2) - d * th
    )
    newth = th + newdth * DT
    return jnp.stack([jnp.cos(newth), jnp.sin(newth), newdth])


def default_params(simple: bool = True) -> jnp.ndarray:
    """(g, m, l) = (10, 1, 1) (reference pendulum.py:42); the complex
    variant adds damping d and gravity bias b (pendulum.py:45)."""
    if simple:
        return jnp.array([10.0, 1.0, 1.0], jnp.float32)
    return jnp.array([10.0, 1.0, 1.0, 0.0, 0.0], jnp.float32)


def get_true_obj(n_ctrl: int = N_CTRL):
    """Diagonal cost spec (q, p) with p = -sqrt(w) * x_goal
    (reference pendulum.py:117-125)."""
    q = jnp.concatenate([GOAL_WEIGHTS, CTRL_PENALTY * jnp.ones(n_ctrl, jnp.float32)])
    px = -jnp.sqrt(GOAL_WEIGHTS) * GOAL_STATE
    p = jnp.concatenate([px, jnp.zeros(n_ctrl, jnp.float32)])
    return q, p


def make(simple: bool = True) -> Dynamics:
    return Dynamics(
        n_state=N_STATE,
        n_ctrl=N_CTRL,
        step=lambda x, u, p: _step(x, u, p, clamp_u=True, simple=simple),
        step_unclamped=lambda x, u, p: _step(x, u, p, clamp_u=False, simple=simple),
        lower=-MAX_TORQUE,
        upper=MAX_TORQUE,
        # per-env MPC hyper-parameters (reference pendulum.py:56-58)
        mpc_eps=1e-3,
        linesearch_decay=0.2,
        max_linesearch_iter=5,
    )
