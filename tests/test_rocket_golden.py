"""Rocket solver-level parity vs the PyTorch reference (VERDICT round-1
item: the hardest env -- 13 states / 3 controls, quaternion rigid body --
previously had only env-step goldens).

Three fixtures, all f64 (exact-parity precision; see test_mpc_golden.py):
 * mpc_rocket_f64: mpc_explicit.py box +-20 solve with the reference's
   returns-unnormalized-quaternion behavior (rocket.py:158-164).
 * mpc_rocket_norm_f64: same solve with the forward patched to return the
   normalized new_x_out -- pins our normalize_quat=True flag.
 * rocket_receding_f64: 5 closed-loop steps with the demo's warm-start
   shift u_init <- cat(u[1:], u[-1:]) (rocket.py:1120-1140).
"""
import jax.numpy as jnp
import numpy as np

import dilqr_tpu
from dilqr_tpu import GradMethod, ILQRConfig, QuadCost
from dilqr_tpu.control import receding_horizon
from dilqr_tpu.models import rocket

F64 = jnp.float64


def _solve_rocket(g, dyn, grad_method):
    params = jnp.asarray(rocket.default_params(), F64)
    T = g["u"].shape[0]
    cfg = ILQRConfig(
        n_state=13,
        n_ctrl=3,
        T=T,
        lqr_iter=20,
        eps=dyn.mpc_eps,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        detach_unconverged=False,
        exit_unconverged=False,
        grad_method=grad_method,
        backprop=False,
        qp_solver="pnqp",
    )
    q = jnp.asarray(g["q"], F64)
    return dilqr_tpu.solve(
        cfg,
        jnp.asarray(g["x_init"], F64),
        QuadCost(jnp.diag(q), jnp.asarray(g["p"], F64)),
        dyn,
        params=params,
        u_lower=-20.0,
        u_upper=20.0,
    )


def test_rocket_mpc_golden_f64(golden):
    g = golden("mpc_rocket_f64")
    res = _solve_rocket(g, rocket.make(), GradMethod.ANALYTIC)
    u = np.swapaxes(np.asarray(res.u), 0, 1)
    x = np.swapaxes(np.asarray(res.x), 0, 1)
    np.testing.assert_allclose(u, g["u"], atol=1e-6)
    np.testing.assert_allclose(x, g["x"], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res.costs, np.float64), g["objs"], rtol=1e-6
    )


def test_rocket_mpc_norm_quat_golden_f64(golden):
    """normalize_quat=True path (the quirk flag's other setting); the
    reference golden uses AUTO_DIFF since its hand-derived pack linearizes
    the unnormalized physics."""
    g = golden("mpc_rocket_norm_f64")
    res = _solve_rocket(
        g, rocket.make(normalize_quat=True), GradMethod.AUTO_DIFF
    )
    u = np.swapaxes(np.asarray(res.u), 0, 1)
    np.testing.assert_allclose(u, g["u"], atol=1e-6)
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(res.x), 0, 1), g["x"], atol=1e-6
    )


def test_rocket_receding_golden_f64(golden):
    """Closed-loop receding horizon with warm-start shifting
    (rocket.py:1120-1140) via control.receding_horizon -- the whole episode
    is one lax.scan, but the per-step numerics must match the reference's
    host loop exactly."""
    g = golden("rocket_receding_f64")
    dyn = rocket.make()
    params = jnp.asarray(rocket.default_params(), F64)
    T, steps = 20, g["us"].shape[0]
    cfg = ILQRConfig(
        n_state=13,
        n_ctrl=3,
        T=T,
        lqr_iter=30,
        eps=1e-2,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        detach_unconverged=False,
        exit_unconverged=False,
        backprop=False,
        backend="xla",
    )
    q = jnp.asarray(g["q"], F64)
    ep = receding_horizon(
        cfg,
        dyn,
        params,
        QuadCost(jnp.diag(q), jnp.asarray(g["p"], F64)),
        jnp.asarray(g["x_init"], F64),
        n_steps=steps,
    )
    np.testing.assert_allclose(np.asarray(ep.us[0]), g["us"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ep.xs[0]), g["xs"], atol=1e-6)
