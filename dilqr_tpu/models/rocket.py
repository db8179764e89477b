"""Rocket soft-landing, 13-state quaternion rigid body
(r[3], v[3], q[4], w[3]), 3 controls (thrust vector, box +-20).
TPU-native port of the reference env behavior (env_dx/rocket.py:17-164):

 * direction-cosine matrix from the quaternion (rocket.py:116-121)
 * gravity (-10, 0, 0) along the first axis (rocket.py:125)
 * quaternion kinematics dq = 0.5 Omega(w) q (rocket.py:135-144)
 * torque = r_T_B x T_B with r_T_B = (-l/2, 0, 0), Euler rotational
   dynamics dw = J^-1 (torque - w x J w) (rocket.py:147-152)
 * Euler integration with dt = 0.1 (rocket.py:154-156)

Behavioral quirk reproduced (flag-gated): the reference computes a
normalized quaternion into a copy but returns the UN-normalized state
(rocket.py:158-164); `normalize_quat=False` is therefore the default.

Jacobians come from jax.jacfwd, replacing ~500 lines of sparse index-writes
("CasADi 1:1 conversion", rocket.py:324-823).

Note: the reference detaches params inside forward (rocket.py:100), so its
rocket cannot backprop to params through the step; here the step is fully
differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.batch import clamp_t
from .base import Dynamics

DT = 0.1
N_STATE, N_CTRL = 13, 3
MAX_THRUST = 20.0**2  # clamp inside forward (rocket.py:64,111); the box
# bounds +-20 (rocket.py:80) keep it inactive in practice

GOAL_WEIGHTS = (
    jnp.ones(N_STATE, jnp.float32)
    .at[0:3].set(10.0).at[3:6].set(1.0).at[6:10].set(0.1).at[10:].set(1.0)
)
GOAL_STATE = jnp.zeros(N_STATE, jnp.float32).at[6].set(1.0)
SIDE_PENALTY = 1.0
THRUST_PENALTY = 0.4
CTRL_PENALTY = jnp.array([SIDE_PENALTY, SIDE_PENALTY, THRUST_PENALTY], jnp.float32)
TILT_PENALTY = 50.0
# tilt_Q is pre-multiplied by tilt_penalty at init (rocket.py:74-78)
TILT_Q = TILT_PENALTY * jnp.array([0.0, 0.0, 4.0, 4.0], jnp.float32)
TILT_P = TILT_PENALTY * jnp.array([0.0, 0.0, 0.0, 0.0], jnp.float32)

LOWER = jnp.array([-20.0, -20.0, -20.0], jnp.float32)
UPPER = jnp.array([20.0, 20.0, 20.0], jnp.float32)


def _dcm_body_to_inertial_rows(q0, q1, q2, q3):
    """Rows of C_I_B = C_B_I^T with C_B_I as in rocket.py:116-121.

    Written entrywise (no jnp.array matrix construction) so the step
    broadcasts over arbitrary trailing batch dims -- required by the fused
    Pallas kernel's batch-on-lanes layout."""
    c = [
        [1 - 2 * (q2**2 + q3**2), 2 * (q1 * q2 + q0 * q3), 2 * (q1 * q3 - q0 * q2)],
        [2 * (q1 * q2 - q0 * q3), 1 - 2 * (q1**2 + q3**2), 2 * (q2 * q3 + q0 * q1)],
        [2 * (q1 * q3 + q0 * q2), 2 * (q2 * q3 - q0 * q1), 1 - 2 * (q1**2 + q2**2)],
    ]
    # transpose
    return [[c[j][i] for j in range(3)] for i in range(3)]


def _step(x, u, params, clamp_u: bool, normalize_quat: bool):
    if not isinstance(params, (tuple, list)):
        # dtype follows the state; tuple/list of traced scalars (the Pallas
        # in-kernel path) unpacks directly below
        params = jnp.asarray(params, x.dtype)
    Jx, Jy, Jz, mass, l = params

    v0, v1, v2 = x[3], x[4], x[5]
    q0, q1, q2, q3 = x[6], x[7], x[8], x[9]
    w0, w1, w2 = x[10], x[11], x[12]

    if clamp_u:
        # dtype-pinned bounds: see models/cartpole.py (x64 + Mosaic)
        _lim = u[0].dtype.type(MAX_THRUST)
        T_B = [clamp_t(u[i], -_lim, _lim) for i in range(3)]
    else:
        T_B = [u[0], u[1], u[2]]

    C = _dcm_body_to_inertial_rows(q0, q1, q2, q3)
    g = (-10.0, 0.0, 0.0)

    # dv = C_I_B T_B / mass + g   (rocket.py:125-133)
    dv = [
        (C[i][0] * T_B[0] + C[i][1] * T_B[1] + C[i][2] * T_B[2]) / mass + g[i]
        for i in range(3)
    ]
    # dq = 0.5 Omega(w) q   (rocket.py:135-144)
    dq0 = 0.5 * (-w0 * q1 - w1 * q2 - w2 * q3)
    dq1 = 0.5 * (w0 * q0 + w2 * q2 - w1 * q3)
    dq2 = 0.5 * (w1 * q0 - w2 * q1 + w0 * q3)
    dq3 = 0.5 * (w2 * q0 + w1 * q1 - w0 * q2)

    # torque = r_T_B x T_B with r_T_B = (-l/2, 0, 0)  (rocket.py:147-148)
    a = -0.5 * l
    tq0 = 0.0
    tq1 = -a * T_B[2]
    tq2 = a * T_B[1]
    # w x (J w)   (rocket.py:149-152)
    cw0 = w1 * (Jz * w2) - w2 * (Jy * w1)
    cw1 = w2 * (Jx * w0) - w0 * (Jz * w2)
    cw2 = w0 * (Jy * w1) - w1 * (Jx * w0)
    dw0 = (tq0 - cw0) / Jx
    dw1 = (tq1 - cw1) / Jy
    dw2 = (tq2 - cw2) / Jz

    dx = jnp.stack(
        [v0, v1, v2, dv[0], dv[1], dv[2], dq0, dq1, dq2, dq3, dw0, dw1, dw2]
    )
    new_x = x + dx * DT
    if normalize_quat:
        nq = new_x[6:10]
        nrm = jnp.sqrt((nq * nq).sum(0)) + 1e-8
        new_x = jnp.concatenate([new_x[:6], nq / nrm, new_x[10:]], axis=0)
    return new_x


def _jac_lanes(x, u, params):
    """Hand-derived Jacobian D = [dx'/dx | dx'/du] of the UN-clamped,
    UN-normalized step (the default linearization point), [13, 16, ...]
    broadcasting over trailing tile dims. Covers what the reference's
    sparse index-write pack covers (env_dx/rocket.py:324-426, 69 nnz of
    a 13x16 D) -- derived independently from _step's physics, not
    transcribed; the parity pin is the jacfwd oracle, not the pack.

    With normalize_quat=False the step is a pure polynomial map, so
    every entry is a short product: D = I + dt * d(dx)/d(x,u) with the
    DCM partials linear in q, the quaternion-kinematics block
    0.5 Omega(w) (and its q-linear w-partials), and the Euler
    cross-coupling terms (Jz-Jy) w etc. Independently derived from the
    physics in _step; oracle-tested against jax.jacfwd of
    `step_unclamped` (tests/test_envs.py). Replaces the 16 one-hot jvp
    sweeps per Riccati step in the fused kernel (the megakernel's
    dominant linearization cost for this env)."""
    if not isinstance(params, (tuple, list)):
        params = jnp.asarray(params, x[0].dtype)
    Jx, Jy, Jz, mass, l = params
    dt = x[0].dtype.type(DT)
    q0, q1, q2, q3 = x[6], x[7], x[8], x[9]
    w0, w1, w2 = x[10], x[11], x[12]
    T = [u[0], u[1], u[2]]
    zero = jnp.zeros_like(q0)
    one = jnp.ones_like(q0)

    # body-to-inertial rows R[i][j] = c[j][i] (see _dcm rows) and the
    # partials of each c entry w.r.t. (q0, q1, q2, q3)
    c = [
        [1 - 2 * (q2 * q2 + q3 * q3), 2 * (q1 * q2 + q0 * q3),
         2 * (q1 * q3 - q0 * q2)],
        [2 * (q1 * q2 - q0 * q3), 1 - 2 * (q1 * q1 + q3 * q3),
         2 * (q2 * q3 + q0 * q1)],
        [2 * (q1 * q3 + q0 * q2), 2 * (q2 * q3 - q0 * q1),
         1 - 2 * (q1 * q1 + q2 * q2)],
    ]
    two = 2.0
    dc = {
        (0, 0): [zero, zero, -2 * two * q2, -2 * two * q3],
        (0, 1): [two * q3, two * q2, two * q1, two * q0],
        (0, 2): [-two * q2, two * q3, -two * q0, two * q1],
        (1, 0): [-two * q3, two * q2, two * q1, -two * q0],
        (1, 1): [zero, -2 * two * q1, zero, -2 * two * q3],
        (1, 2): [two * q1, two * q0, two * q3, two * q2],
        (2, 0): [two * q2, two * q3, two * q0, two * q1],
        (2, 1): [-two * q1, -two * q0, two * q3, two * q2],
        (2, 2): [zero, -2 * two * q1, -2 * two * q2, zero],
    }

    rows = [[zero] * 16 for _ in range(13)]
    # r rows: r' = r + dt v
    for i in range(3):
        rows[i][i] = one
        rows[i][3 + i] = dt + zero
    # v rows: v' = v + dt (R T / mass + g)
    for m in range(3):
        i = 3 + m
        rows[i][i] = one
        for k in range(4):
            rows[i][6 + k] = dt * (
                dc[(0, m)][k] * T[0] + dc[(1, m)][k] * T[1]
                + dc[(2, m)][k] * T[2]
            ) / mass
        for j in range(3):
            rows[i][13 + j] = dt * c[j][m] / mass
    # q rows: q' = q + 0.5 dt Omega(w) q
    h = 0.5 * dt
    qjac = [
        # (dq_a / dq_b) entries b=0..3, then (dq_a / dw_b) b=0..2
        ([zero, -h * w0, -h * w1, -h * w2], [-h * q1, -h * q2, -h * q3]),
        ([h * w0, zero, h * w2, -h * w1], [h * q0, -h * q3, h * q2]),
        ([h * w1, -h * w2, zero, h * w0], [h * q3, h * q0, -h * q1]),
        ([h * w2, h * w1, -h * w0, zero], [-h * q2, h * q1, h * q0]),
    ]
    for a in range(4):
        i = 6 + a
        dqq, dqw = qjac[a]
        for b in range(4):
            rows[i][6 + b] = dqq[b] + (one if a == b else zero)
        for b in range(3):
            rows[i][10 + b] = dqw[b]
    # w rows: w' = w + dt (torque(u) - w x (J w)) / J
    kzy, kxz, kyx = Jz - Jy, Jx - Jz, Jy - Jx
    rows[10][10] = one
    rows[10][11] = -dt * kzy * w2 / Jx
    rows[10][12] = -dt * kzy * w1 / Jx
    rows[11][10] = -dt * kxz * w2 / Jy
    rows[11][11] = one
    rows[11][12] = -dt * kxz * w0 / Jy
    rows[11][15] = dt * (0.5 * l) / Jy + zero  # d dw1 / d u2 (tq1 = l/2 T2)
    rows[12][10] = -dt * kyx * w1 / Jz
    rows[12][11] = -dt * kyx * w0 / Jz
    rows[12][12] = one
    rows[12][14] = -dt * (0.5 * l) / Jz + zero  # d dw2 / d u1 (tq2 = -l/2 T1)

    return jnp.stack([jnp.stack(r) for r in rows])


def default_params() -> jnp.ndarray:
    """(Jx, Jy, Jz, mass, l) = (0.5, 1, 1, 1, 1) (reference rocket.py:29)."""
    return jnp.array([0.5, 1.0, 1.0, 1.0, 1.0], jnp.float32)


def get_true_obj():
    """Diagonal cost (q, p) with the tilt-angle quadratic surrogate folded
    into the quaternion weights. Reproduces the reference's double
    tilt_penalty multiplication (rocket.py:74-78 then 225): the effective
    quaternion weight is 50 * 50 * [0,0,4,4] = [0,0,10000,10000]."""
    q = jnp.concatenate([GOAL_WEIGHTS, CTRL_PENALTY])
    q = q.at[6:10].set(TILT_Q * TILT_PENALTY)
    px = -jnp.sqrt(GOAL_WEIGHTS) * GOAL_STATE
    px = px.at[6:10].set(-TILT_P * TILT_PENALTY)
    p = jnp.concatenate([px, jnp.zeros(N_CTRL, jnp.float32)])
    return q, p


def get_cost_matrices(n_batch: int, mpc_T: int):
    """Batched diagonal cost builder (reference rocket.py:234-256; NB the
    reference's version crashes on a shape mismatch when adding tilt_Q into
    the 13x13 block -- the working intent, diag(q)/p broadcast, is built
    here)."""
    q, p = get_true_obj()
    Q = jnp.diag(q)
    Q = jnp.broadcast_to(Q, (n_batch, mpc_T) + Q.shape)
    p = jnp.broadcast_to(p, (n_batch, mpc_T) + p.shape)
    return Q, p


def make(normalize_quat: bool = False) -> Dynamics:
    return Dynamics(
        n_state=N_STATE,
        n_ctrl=N_CTRL,
        step=lambda x, u, p: _step(x, u, p, True, normalize_quat),
        step_unclamped=lambda x, u, p: _step(x, u, p, False, normalize_quat),
        # the normalize_quat=True quirk variant renormalizes inside the
        # step; its Jacobian is not the polynomial one below
        jac_lanes=None if normalize_quat else _jac_lanes,
        lower=LOWER,
        upper=UPPER,
        # per-env MPC hyper-parameters (reference rocket.py:68-70)
        mpc_eps=1e-3,
        linesearch_decay=0.2,
        max_linesearch_iter=5,
    )
