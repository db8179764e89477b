"""Closed-loop receding-horizon driver (dilqr_tpu/control.py): one lax.scan
program equivalent of the reference's host loops (test_mpc.py:95-113,
rocket.py:1120-1140)."""
import jax
import jax.numpy as jnp
import numpy as np

from dilqr_tpu import ILQRConfig, QuadCost
from dilqr_tpu.control import receding_horizon
from dilqr_tpu.models import pendulum


def test_receding_horizon_pendulum_swingup():
    dyn = pendulum.make()
    params = pendulum.default_params().astype(jnp.float64)
    q, p = pendulum.get_true_obj()
    B, steps = 4, 60
    rng = np.random.RandomState(0)
    # starts above horizontal: the torque-limited swing-up from hanging is
    # a local-minimum trap at short horizons (the reference's closed-loop
    # demo also starts near upright, test_mpc.py:50-72)
    th = -1.5 + 3.0 * rng.rand(B)
    x0 = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)),
         jnp.zeros(B)], 1
    )
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=16, lqr_iter=12, eps=1e-4,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    ep = jax.jit(
        lambda x: receding_horizon(
            cfg, dyn, params, QuadCost(jnp.diag(q), p), x, n_steps=steps,
            u_lower=dyn.lower, u_upper=dyn.upper,
        )
    )(x0)
    assert ep.xs.shape == (B, steps + 1, 3)
    assert ep.us.shape == (B, steps, 1)
    # swing-up reached: cos(theta) near 1, slow rotation
    final = np.asarray(ep.xs[:, -1])
    assert (final[:, 0] > 0.95).all(), final
    assert (np.abs(final[:, 2]) < 1.0).all(), final
    # torque bounds respected
    assert float(jnp.abs(ep.us).max()) <= 2.0 + 1e-6


def test_receding_horizon_model_mismatch_stabilizes():
    """The scenario MPC exists for (the reference's actual gym demo,
    test_mpc.py:29,95-113 drives a plant it did NOT model): the PLANT is
    the 5-param complex pendulum -- damping, gravity bias, heavier/shorter
    arm -- while the controller plans with the nominal 3-param simple
    model. Closed-loop replanning must stabilize the true plant upright
    anyway, and must do measurably better than open-loop executing the
    first plan on the same plant."""
    model = pendulum.make()                       # controller's model
    model_params = pendulum.default_params().astype(jnp.float64)
    plant = pendulum.make(simple=False)           # true plant
    plant_params = jnp.array([10.0, 1.25, 0.9, 0.4, 0.05], jnp.float64)
    q, p = pendulum.get_true_obj()
    B, steps = 3, 60
    rng = np.random.RandomState(2)
    th = -1.2 + 2.4 * rng.rand(B)
    x0 = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)), jnp.zeros(B)], 1
    )
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=16, lqr_iter=12, eps=1e-4,
        linesearch_decay=model.linesearch_decay,
        max_linesearch_iter=model.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    ep = jax.jit(
        lambda x: receding_horizon(
            cfg, model, model_params, QuadCost(jnp.diag(q), p), x,
            n_steps=steps, u_lower=model.lower, u_upper=model.upper,
            env_step=plant.step, env_params=plant_params,
        )
    )(x0)
    final = np.asarray(ep.xs[:, -1])
    # stabilized upright on the mismatched plant
    assert (final[:, 0] > 0.9).all(), final
    assert (np.abs(final[:, 2]) < 1.5).all(), final

    # open-loop baseline: execute the FIRST solve's plan on the true plant
    # with no replanning; feedback must beat it on final upright error
    from dilqr_tpu import solve as solve_fn
    from dilqr_tpu.control import open_loop_rollout

    res0 = solve_fn(cfg, x0, QuadCost(jnp.diag(q), p), model,
                    params=model_params,
                    u_lower=model.lower, u_upper=model.upper)
    n_ol = min(steps, cfg.T)
    x_ol = open_loop_rollout(plant.step, plant_params, x0,
                             res0.u[:, :n_ol])[:, -1]
    err_cl = np.abs(1.0 - np.asarray(ep.xs[:, n_ol, 0]))
    err_ol = np.abs(1.0 - np.asarray(x_ol[:, 0]))
    assert err_cl.mean() <= err_ol.mean() + 1e-9, (err_cl, err_ol)
