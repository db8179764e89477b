"""Feature-path golden tests vs the PyTorch reference: slew-rate
augmentation, u_zero_I zero-control constraints, delta_u trust region,
NNDynamics MLP, and callable (module) costs. All f64 for exact semantic
parity (see test_mpc_golden.py for the precision discussion)."""
import jax
import jax.numpy as jnp
import numpy as np

import dilqr_tpu
from dilqr_tpu import BackwardMode, ILQRConfig, LinDx, QuadCost
from dilqr_tpu.models import nn_dynamics, pendulum

F64 = jnp.float64


def _bm(a):
    return jnp.swapaxes(jnp.asarray(a, F64), 0, 1)


def test_slew_rate_golden(golden):
    g = golden("mpc_slew_pendulum_f64")
    dyn = pendulum.make()
    params = jnp.asarray(pendulum.default_params(), F64)
    T = g["u"].shape[0]
    cfg = ILQRConfig(
        n_state=3,
        n_ctrl=1,
        T=T,
        lqr_iter=12,
        eps=1e-4,
        linesearch_decay=0.2,
        max_linesearch_iter=5,
        detach_unconverged=False,
        exit_unconverged=False,
        slew_rate_penalty=1.0,
        backprop=False,
        # exact-parity golden: follow the reference's pnqp iteration path
        # (the default closed-form 1-D QP is exact, ~3e-5 off pnqp's 1e-4-
        # tolerance iterates; parity for that path is asserted separately in
        # test_mpc_golden.py)
        qp_solver="pnqp",
    )
    q = jnp.asarray(g["q"], F64)
    res = dilqr_tpu.solve(
        cfg,
        jnp.asarray(g["x_init"], F64),
        QuadCost(jnp.diag(q), jnp.asarray(g["p"], F64)),
        dyn,
        params=params,
        u_lower=-2.0,
        u_upper=2.0,
        prev_ctrl=jnp.asarray(g["prev_u"], F64),
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(res.u), 0, 1), g["u"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(res.x), 0, 1), g["x"], atol=1e-6
    )


def test_slew_rate_lindx_golden(golden):
    """Slew penalty with LinDx dynamics: the augmented-LinDx block build
    (core/solver.augment_slew_rate) vs the reference's _F0/_F1 blocks
    (mpc.py:381-395; golden generated with the reference's
    true_dynamics=None crash repaired, see make_goldens.golden_slew_lindx)."""
    g = golden("lqr_slew_lindx_f64")
    T, B, nx = g["x"].shape
    nu = g["u"].shape[2]
    cfg = ILQRConfig(
        n_state=nx,
        n_ctrl=nu,
        T=T,
        lqr_iter=10,
        eps=1e-7,
        detach_unconverged=False,
        exit_unconverged=False,
        slew_rate_penalty=1.5,
        backprop=False,
        qp_solver="pnqp",
    )
    res = dilqr_tpu.solve(
        cfg,
        jnp.asarray(g["x_init"], F64),
        QuadCost(_bm(g["C"]), _bm(g["c"])),
        LinDx(_bm(g["F"]), _bm(g["f"])),
        u_lower=-0.5,
        u_upper=0.5,
        prev_ctrl=jnp.asarray(g["prev_u"], F64),
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(res.u), 0, 1), g["u"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(res.x), 0, 1), g["x"], atol=1e-6
    )


def test_u_zero_golden(golden):
    g = golden("lqr_uzero_f64")
    T, B, nx = g["x"].shape
    nu = g["u"].shape[2]
    cfg = ILQRConfig(
        n_state=nx,
        n_ctrl=nu,
        T=T,
        lqr_iter=8,
        eps=1e-7,
        detach_unconverged=False,
        exit_unconverged=False,
        backprop=False,
    )
    res = dilqr_tpu.solve(
        cfg,
        jnp.asarray(g["x_init"], F64),
        QuadCost(_bm(g["C"]), _bm(g["c"])),
        LinDx(_bm(g["F"]), _bm(g["f"])),
        u_zero_I=jnp.swapaxes(jnp.asarray(g["u_zero_I"]), 0, 1),
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(res.u), 0, 1), g["u"], atol=1e-8
    )
    # the mask is actually enforced
    assert np.abs(np.swapaxes(np.asarray(res.u), 0, 1)[g["u_zero_I"]]).max() == 0.0


def test_delta_u_golden(golden):
    g = golden("lqr_delta_u_f64")
    T, B, nx = g["x"].shape
    nu = g["u"].shape[2]
    cfg = ILQRConfig(
        n_state=nx,
        n_ctrl=nu,
        T=T,
        lqr_iter=8,
        eps=1e-7,
        detach_unconverged=False,
        exit_unconverged=False,
        backprop=False,
    )
    res = dilqr_tpu.solve(
        cfg,
        jnp.asarray(g["x_init"], F64),
        QuadCost(_bm(g["C"]), _bm(g["c"])),
        LinDx(_bm(g["F"]), _bm(g["f"])),
        u_lower=-0.5,
        u_upper=0.5,
        delta_u=0.2,
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(res.u), 0, 1), g["u"], atol=1e-8
    )


def test_nn_dynamics_golden(golden):
    """MLP dynamics forward + Jacobian vs the reference's hand-backprop
    grad_input (dynamics.py:81-130)."""
    g = golden("nn_dynamics")
    dyn = nn_dynamics.make(3, 2, activation="sigmoid", passthrough=True)
    params = [
        (jnp.asarray(g["W0"], F64), jnp.asarray(g["b0"], F64)),
        (jnp.asarray(g["W1"], F64), jnp.asarray(g["b1"], F64)),
    ]
    x = jnp.asarray(g["x"], F64)
    u = jnp.asarray(g["u"], F64)
    xp = jax.vmap(lambda a, b: dyn.step(a, b, params))(x, u)
    np.testing.assert_allclose(np.asarray(xp), g["x_next"], atol=1e-10)

    R = jax.vmap(lambda a, b: jax.jacfwd(dyn.step, 0)(a, b, params))(x, u)
    S = jax.vmap(lambda a, b: jax.jacfwd(dyn.step, 1)(a, b, params))(x, u)
    np.testing.assert_allclose(np.asarray(R), g["R"], atol=1e-10)
    np.testing.assert_allclose(np.asarray(S), g["S"], atol=1e-10)


def test_module_cost_golden(golden):
    """Callable cost -> per-iteration quadraticization (mpc.py:447-487)."""
    g = golden("mpc_module_cost_f64")
    T, B, nx = g["x"].shape
    nu = g["u"].shape[2]
    w = jnp.asarray(g["w"], F64)
    target = jnp.asarray(g["target"], F64)

    def cost_fn(tau):
        d = tau - target
        return 0.5 * jnp.sum(w * d * d) + 0.1 * jnp.sum(d**4)

    cfg = ILQRConfig(
        n_state=nx,
        n_ctrl=nu,
        T=T,
        lqr_iter=10,
        eps=1e-6,
        detach_unconverged=False,
        exit_unconverged=False,
        backprop=False,
    )
    res = dilqr_tpu.solve(
        cfg,
        jnp.asarray(g["x_init"], F64),
        cost_fn,
        LinDx(_bm(g["F"]), _bm(g["f"])),
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(res.u), 0, 1), g["u"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(res.x), 0, 1), g["x"], atol=1e-6
    )
