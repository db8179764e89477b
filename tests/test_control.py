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


def test_receding_horizon_model_mismatch():
    """env_step overrides the plant (learned-model evaluation pattern)."""
    dyn = pendulum.make()
    true_params = pendulum.default_params().astype(jnp.float64)
    wrong = jnp.array([12.0, 1.2, 0.9], jnp.float64)  # model mismatch
    q, p = pendulum.get_true_obj()
    x0 = jnp.stack([jnp.ones(2), jnp.zeros(2), jnp.zeros(2)], 1)
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=8, lqr_iter=5, eps=1e-4,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    ep = receding_horizon(
        cfg, dyn, wrong, QuadCost(jnp.diag(q), p), x0, n_steps=5,
        u_lower=dyn.lower, u_upper=dyn.upper,
        env_step=dyn.step, env_params=true_params,
    )
    assert np.isfinite(np.asarray(ep.xs)).all()
