"""Full nonlinear box-constrained MPC vs the PyTorch reference
(mpc_explicit.py ANALYTIC path, replicating IL_Env.mpc il_env.py:153-188).

Two precisions:
 * f64: exact semantic parity -- our solver tracks the reference's full
   20-iteration trajectory (every line-search trial, pnqp active set, and
   best-tracking decision) to ~1e-13 on cartpole; asserted at 1e-6, well
   inside the <=1e-4 bar (BASELINE.md).
 * f32: the reference's native precision. Ours and torch use different
   libm/rounding, and the near-chaotic cartpole iteration amplifies ~1e-6
   per-step noise by ~100x over 20 iterations; parity is asserted at the
   corresponding 2e-3 level (both solutions sit within their own mpc_eps
   convergence tolerance of the common fixed point).
"""
import jax.numpy as jnp
import numpy as np
import pytest

import dilqr_tpu
from dilqr_tpu import BackwardMode, ILQRConfig, QuadCost
from dilqr_tpu.models import cartpole, pendulum

ENVS = {
    "mpc_pendulum": (pendulum.make(), pendulum.default_params()),
    "mpc_cartpole": (cartpole.make(), cartpole.default_params()),
}


def _run(golden, name, dtype, u_tol, x_tol, qp_solver="auto"):
    g = golden(name if dtype == jnp.float32 else name + "_f64")
    dyn, params = ENVS[name]
    T, B = g["u"].shape[0], g["u"].shape[1]
    cfg = ILQRConfig(
        n_state=dyn.n_state,
        n_ctrl=dyn.n_ctrl,
        T=T,
        lqr_iter=20,
        eps=dyn.mpc_eps,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        detach_unconverged=False,
        exit_unconverged=False,
        backward_mode=BackwardMode.KKT,
        backprop=False,
        qp_solver=qp_solver,
    )
    q = jnp.asarray(g["q"], dtype)
    p = jnp.asarray(g["p"], dtype)
    res = dilqr_tpu.solve(
        cfg,
        jnp.asarray(g["x_init"], dtype),
        QuadCost(jnp.diag(q), p),
        dyn,
        params=jnp.asarray(params, dtype),
        u_lower=dyn.lower,
        u_upper=dyn.upper,
    )
    u = np.swapaxes(np.asarray(res.u), 0, 1)
    x = np.swapaxes(np.asarray(res.x), 0, 1)
    err_u = np.abs(u - g["u"]).max()
    err_x = np.abs(x - g["x"]).max()
    assert err_u <= u_tol, f"{name}/{dtype.__name__}: u-seq max err {err_u:.2e}"
    assert err_x <= x_tol, f"{name}/{dtype.__name__}: x-seq max err {err_x:.2e}"
    np.testing.assert_allclose(
        np.asarray(res.costs, np.float64), g["objs"], rtol=10 * u_tol
    )


@pytest.mark.parametrize("name", list(ENVS))
def test_mpc_env_golden_f64_exact(golden, name):
    """The headline parity bar: u-seq max err <= 1e-4 (BASELINE.md),
    asserted 100x tighter at f64 with qp_solver="pnqp" (the reference's
    exact projected-Newton iteration path)."""
    _run(golden, name, jnp.float64, u_tol=1e-6, x_tol=1e-6, qp_solver="pnqp")


@pytest.mark.parametrize("name", list(ENVS))
def test_mpc_env_golden_f64_closed_form_qp(golden, name):
    """The default fast path (closed-form 1-D box-QP) solves each Riccati
    subproblem exactly instead of to pnqp's 1e-4 Newton tolerance; it must
    still meet the official <=1e-4 u-seq parity bar vs the reference."""
    _run(golden, name, jnp.float64, u_tol=1e-4, x_tol=1e-4, qp_solver="auto")


@pytest.mark.parametrize("name", list(ENVS))
def test_mpc_env_golden_f32(golden, name):
    _run(golden, name, jnp.float32, u_tol=2e-3, x_tol=5e-3)
