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


def _jac_lanes_simple(state, u, params):
    """Hand-derived Jacobian D = [dx'/dx | dx'/du] of the UN-clamped
    simple-pendulum step, [3, 4, ...] broadcasting over trailing tile
    dims. Independently derived (chain rule through newdth and the
    rotate_cs renormalization; the rotation part preserves the norm, so
    A-terms carry only the renorm correction); oracle-tested against
    jax.jacfwd of `step_unclamped` (tests/test_envs.py)."""
    if not isinstance(params, (tuple, list)):
        params = jnp.asarray(params, state[0].dtype)
    g, m, l = params
    dt = state[0].dtype.type(DT)
    c, s, w = state
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)

    # newdth = w + dt*(1.5 g/l s + 3 u/(m l^2))
    k_s = dt * 1.5 * g / l + zero
    k_u = dt * 3.0 / (m * l ** 2) + zero
    newdth = w + dt * (-3.0 * g / (2.0 * l) * (-s) + 3.0 * u[0] / (m * l ** 2))

    delta = newdth * dt
    d_s, d_w, d_u = dt * k_s, dt * one, dt * k_u  # d delta / d (s, w, u)
    cd = jnp.cos(delta)
    sd = jnp.sin(delta)
    ct = c * cd - s * sd
    st = s * cd + c * sd
    nn = ct * ct + st * st
    import jax

    # lax.rsqrt, NOT 1/sqrt: matches rotate_cs bit-for-bit AND avoids
    # XLA's context-dependent 1/sqrt->rsqrt rewrite (which made the
    # cross-mode bitwise kernel tests diverge by one ulp)
    r = jax.lax.rsqrt(jnp.maximum(nn, c.dtype.type(1e-30)))
    r2 = r * r
    # d ct/d y = rotation-input part + (-st) * d delta/d y (angle part)
    ct_c, st_c = cd, sd
    ct_s, st_s = -sd - st * d_s, cd + ct * d_s
    ct_w, st_w = -st * d_w, ct * d_w
    ct_u, st_u = -st * d_u, ct * d_u
    # renorm: A_y = ct ct_y + st st_y; the pure-angle parts cancel
    A_c = ct * ct_c + st * st_c
    A_s = ct * ct_s + st * st_s
    A_w = ct * ct_w + st * st_w
    A_u = ct * ct_u + st * st_u

    def o(cty, Ay, v):
        return r * (cty - v * Ay * r2)

    rows = [
        [o(ct_c, A_c, ct), o(ct_s, A_s, ct), o(ct_w, A_w, ct),
         o(ct_u, A_u, ct)],
        [o(st_c, A_c, st), o(st_s, A_s, st), o(st_w, A_w, st),
         o(st_u, A_u, st)],
        [zero, k_s, one, k_u],
    ]
    return jnp.stack([jnp.stack(row) for row in rows])


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
        jac_lanes=_jac_lanes_simple if simple else None,
        lower=-MAX_TORQUE,
        upper=MAX_TORQUE,
        # per-env MPC hyper-parameters (reference pendulum.py:56-58)
        mpc_eps=1e-3,
        linesearch_decay=0.2,
        max_linesearch_iter=5,
    )
