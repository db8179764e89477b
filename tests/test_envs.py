"""Env step functions and jacfwd linearization vs the reference's hand-coded
analytic tensors (golden fixtures from env_dx/*.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dilqr_tpu.models import cartpole, pendulum, rocket

ENVS = {
    "env_pendulum": (pendulum.make(), pendulum.default_params()),
    "env_cartpole": (cartpole.make(), cartpole.default_params()),
    "env_rocket": (rocket.make(), rocket.default_params()),
}


@pytest.mark.parametrize("name", list(ENVS))
def test_env_forward_golden(golden, name):
    g = golden(name)
    dyn, params = ENVS[name]
    x = jnp.asarray(g["x"], jnp.float32)
    u = jnp.asarray(g["u"], jnp.float32)
    xp = jax.vmap(lambda xi, ui: dyn.step(xi, ui, params))(x, u)
    np.testing.assert_allclose(np.asarray(xp), g["x_next"], atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("name", list(ENVS))
def test_env_jacfwd_vs_reference_analytic(golden, name):
    """jax.jacfwd of the un-clamped step reproduces the reference's
    hand-transcribed D = [dx'/dx | dx'/du] (pendulum.py:444-475,
    cartpole.py:790-839, rocket.py:324-426)."""
    g = golden(name)
    dyn, params = ENVS[name]
    x = jnp.asarray(g["x"], jnp.float32)
    u = jnp.asarray(g["u"], jnp.float32)

    def D_at(xi, ui):
        R = jax.jacfwd(dyn.linearize_point, argnums=0)(xi, ui, params)
        S = jax.jacfwd(dyn.linearize_point, argnums=1)(xi, ui, params)
        return jnp.concatenate([R, S], axis=-1)

    D = jax.vmap(D_at)(x, u)
    np.testing.assert_allclose(np.asarray(D), g["D"], atol=2e-4, rtol=2e-4)


def test_rocket_cost_spec(golden):
    g = golden("env_rocket")
    q, p = rocket.get_true_obj()
    np.testing.assert_allclose(np.asarray(q), g["q"], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p), g["p"], atol=1e-5, rtol=1e-5)


def test_pendulum_unit_circle_preserved():
    dyn, params = ENVS["env_pendulum"]
    x = jnp.array([np.cos(0.3), np.sin(0.3), 0.5], jnp.float32)
    u = jnp.array([1.0], jnp.float32)
    for _ in range(50):
        x = dyn.step(x, u, params)
    assert abs(float(x[0] ** 2 + x[1] ** 2) - 1.0) < 1e-4
