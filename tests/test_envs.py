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


def test_pendulum_complex_variant_solves():
    """The 5-parameter damped/biased pendulum (reference pendulum.py:45)
    through the full solver."""
    import jax.numpy as jnp
    import numpy as np

    from dilqr_tpu.core.solver import solve
    from dilqr_tpu.models import pendulum
    from dilqr_tpu.types import ILQRConfig, QuadCost

    dyn = pendulum.make(simple=False)
    params = pendulum.default_params(simple=False)
    params = params.at[3].set(0.1).at[4].set(0.2)  # damping + gravity bias
    q, p = pendulum.get_true_obj()
    B, T = 3, 8
    rng = np.random.RandomState(0)
    th = rng.uniform(-2, 2, B)
    x0 = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)), jnp.zeros(B)], 1
    )
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=6, eps=1e-4,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    r = solve(cfg, x0, QuadCost(jnp.diag(q), p), dyn, params=params,
              u_lower=dyn.lower, u_upper=dyn.upper)
    assert np.isfinite(np.asarray(r.costs)).all()
    # damping/bias change the solution vs the simple variant
    r0 = solve(cfg, x0, QuadCost(jnp.diag(q), p), pendulum.make(),
               params=pendulum.default_params(),
               u_lower=dyn.lower, u_upper=dyn.upper)
    assert np.abs(np.asarray(r.u) - np.asarray(r0.u)).max() > 1e-3


def test_auto_diff_linearizes_clamped_forward():
    """GradMethod.AUTO_DIFF must differentiate the CLAMPED env forward
    (reference mpc.py:534-549 autograds dynamics(x, u), whose torque
    clamp zeroes saturated Jacobian columns), while ANALYTIC keeps the
    un-clamped physics (the reference's hand packs, pendulum.py:444-475).
    Also pins the torch clamp derivative convention: gradient 1 exactly
    ON the bound (jnp.clip averages ties to 0.5 -- utils/batch.clamp_t).
    Both distinctions were found by scripts/fuzz_vs_reference.py against
    the live reference (unbounded pendulum-complex diverged O(1) in u;
    bounded cases by ~1e-4)."""
    import jax

    from dilqr_tpu.core.linearize import linearize_dynamics
    from dilqr_tpu.types import GradMethod

    dyn = pendulum.make()
    params = pendulum.default_params().astype(jnp.float64)
    T, B = 3, 2
    x = jnp.broadcast_to(
        jnp.asarray([0.5, 0.8660254, 0.3], jnp.float64), (T, B, 3)
    )
    # u_t saturated beyond the +-2 torque clamp for t < T-1
    u = jnp.full((T, B, 1), 5.0, jnp.float64)

    def lin(method):
        lin_fn = (None if method is GradMethod.AUTO_DIFF
                  else dyn.linearize_point)
        return linearize_dynamics(dyn.step, params, x, u, method=method,
                                  linearize_fn=lin_fn)

    F_ad, _ = lin(GradMethod.AUTO_DIFF)
    F_an, _ = lin(GradMethod.ANALYTIC)
    S_ad = np.asarray(F_ad[..., 3:])   # du column
    S_an = np.asarray(F_an[..., 3:])
    assert np.all(S_ad == 0.0), "saturated AUTO_DIFF column must be zero"
    assert np.all(np.abs(S_an) > 0.0), "ANALYTIC stays un-clamped"

    # boundary derivative: torch.clamp passes gradient 1 exactly ON the
    # bound; clamp_t reproduces that (jnp.clip gives 0.5)
    from dilqr_tpu.utils.batch import clamp_t

    g = jax.jvp(lambda v: clamp_t(v, -2.0, 2.0), (2.0,), (1.0,))[1]
    assert g == 1.0, g


@pytest.mark.parametrize("name", ["pendulum", "cartpole", "rocket"])
def test_jac_lanes_matches_jacfwd(name):
    """The hand-derived kernel-lane Jacobian (Dynamics.jac_lanes, used by
    the fused kernel's ANALYTIC linearization in place of the n one-hot
    jvp sweeps) must agree with jax.jacfwd of step_unclamped at f64 --
    including on UN-normalized (cos, sin) states, where the rotate_cs
    renormalization derivative is non-trivial."""
    from dilqr_tpu.models import cartpole, pendulum, rocket

    mod = {"pendulum": pendulum, "cartpole": cartpole,
           "rocket": rocket}[name]
    dyn = mod.make()
    params = mod.default_params().astype(jnp.float64)
    nx, nu = dyn.n_state, dyn.n_ctrl
    rng = np.random.RandomState(0)
    worst = 0.0
    for _ in range(25):
        th = rng.uniform(-np.pi, np.pi)
        scale = 1.0 + 0.3 * rng.randn()
        if name == "cartpole":
            x = np.concatenate(
                [rng.randn(2), [np.cos(th) * scale, np.sin(th) * scale],
                 rng.randn(1)])
        elif name == "rocket":
            q4 = rng.randn(4)
            q4 = q4 / np.linalg.norm(q4) * scale
            x = np.concatenate([rng.randn(3), 0.3 * rng.randn(3), q4,
                                0.5 * rng.randn(3)])
        else:
            x = np.array([np.cos(th) * scale, np.sin(th) * scale,
                          rng.randn()])
        x = jnp.asarray(x, jnp.float64)
        u = jnp.asarray(5.0 * rng.randn(nu), jnp.float64)
        J = jax.jacfwd(
            lambda xu: dyn.step_unclamped(xu[:nx], xu[nx:], params)
        )(jnp.concatenate([x, u]))
        D = dyn.jac_lanes(x, u, params)
        worst = max(worst, float(jnp.max(jnp.abs(J - D))))
    assert worst < 1e-12, worst
