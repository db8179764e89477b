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


def _jac_lanes(state, u, params):
    """Hand-derived Jacobian D = [dx'/dx | dx'/du] of the UN-clamped step
    (the ANALYTIC linearization point), [5, 6, ...] broadcasting over
    trailing tile dims. Same coverage as the reference's symbolic pack
    (env_dx/cartpole.py:117-153) -- derived independently from _step's
    physics (incl. the rotate_cs renorm the reference does not have);
    the parity pin is the jacfwd oracle, not the pack. Independently derived from the physics above
    (chain rule through cart_in / th_acc / xacc and the rotate_cs
    renormalization); oracle-tested against jax.jacfwd of
    `step_unclamped` (tests/test_envs.py). The w-columns of the rotation
    rows use that the rotation part preserves the norm exactly
    (d r / d th_dot = 0 in algebra), so d cos'/d th_dot = -dt sin' and
    d sin'/d th_dot = dt cos'."""
    if not isinstance(params, (tuple, list)):
        params = jnp.asarray(params, state[0].dtype)
    gravity, masscart, masspole, length = params
    tm = masspole + masscart
    pml = masspole * length
    dt = state[0].dtype.type(DT)

    x, v, c, s, w = state
    uu = u[0]
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)

    ci = (uu + pml * (w * w) * s) / tm
    den = length * (4.0 / 3.0 - masspole * (c * c) / tm)
    ta = (gravity * s - c * ci) / den

    ci_s = pml * (w * w) / tm + zero
    ci_w = 2.0 * pml * w * s / tm
    ci_u = 1.0 / tm + zero
    den_c = -2.0 * length * masspole * c / tm
    ta_c = (-ci - ta * den_c) / den
    ta_s = (gravity - c * ci_s) / den
    ta_w = -c * ci_w / den
    ta_u = -c * ci_u / den
    k = pml / tm
    xacc_c = -k * (ta_c * c + ta)
    xacc_s = ci_s - k * ta_s * c
    xacc_w = ci_w - k * ta_w * c
    xacc_u = ci_u - k * ta_u * c

    # rotation + renormalization rows (see rotate_cs): r = nn^{-1/2}
    delta = dt * w
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
    A_c = ct * cd + st * sd
    A_s = -ct * sd + st * cd
    o3 = ct * r
    o4 = st * r
    d_o3_c = r * (cd - ct * A_c * r2)
    d_o3_s = r * (-sd - ct * A_s * r2)
    d_o4_c = r * (sd - st * A_c * r2)
    d_o4_s = r * (cd - st * A_s * r2)

    rows = [
        [one, dt + zero, zero, zero, zero, zero],
        [zero, one, dt * xacc_c, dt * xacc_s, dt * xacc_w, dt * xacc_u],
        [zero, zero, d_o3_c, d_o3_s, -dt * o4, zero],
        [zero, zero, d_o4_c, d_o4_s, dt * o3, zero],
        [zero, zero, dt * ta_c, dt * ta_s, one + dt * ta_w, dt * ta_u],
    ]
    return jnp.stack([jnp.stack(row) for row in rows])


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
        jac_lanes=_jac_lanes,
        lower=-FORCE_MAG,
        upper=FORCE_MAG,
        # per-env MPC hyper-parameters (reference cartpole.py:60-62)
        mpc_eps=1e-4,
        linesearch_decay=0.5,
        max_linesearch_iter=2,
    )
