"""Tests for auxiliary components: numdiff oracle (reference
torch_numdiff.py self-test), rendering hooks, ANALYTIC_CHECK mode, and the
CtrlPassthroughDynamics wrapper (reference dynamics.py:133-156)."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from dilqr_tpu.utils import numdiff


def test_numdiff_grad_hess_match_autodiff():
    rng = np.random.RandomState(0)
    B, n = 3, 4
    A = jnp.asarray(rng.randn(n, n).astype(np.float64))
    W = A @ A.T + jnp.eye(n)

    def fn(x):  # [B, n] -> [B]
        return 0.5 * jnp.einsum("bi,ij,bj->b", x, W, x) + jnp.sin(x).sum(-1)

    x = jnp.asarray(rng.randn(B, n))
    g = numdiff.grad(fn, x)
    H = numdiff.hess(fn, x)
    g_ad = jax.vmap(jax.grad(lambda xi: fn(xi[None])[0]))(x)
    H_ad = jax.vmap(jax.hessian(lambda xi: fn(xi[None])[0]))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), atol=1e-6)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ad), atol=1e-4)


def test_analytic_check_runs_clean():
    """GradMethod.ANALYTIC_CHECK compares jacfwd vs finite differences in
    place of the reference's stale assert-False (mpc.py:552-567)."""
    import warnings

    from dilqr_tpu.core.linearize import linearize_dynamics
    from dilqr_tpu.models import pendulum
    from dilqr_tpu.types import GradMethod

    dyn = pendulum.make()
    params = pendulum.default_params().astype(jnp.float64)
    T, B = 4, 2
    rng = np.random.RandomState(0)
    th = rng.uniform(-1, 1, (T, B))
    x = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)),
         jnp.zeros((T, B))], -1
    )
    u = jnp.asarray(0.3 * rng.randn(T, B, 1))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        F, f = linearize_dynamics(
            dyn.step, params, x, u, method=GradMethod.ANALYTIC_CHECK,
            linearize_fn=dyn.linearize_point,
        )
        jax.block_until_ready((F, f))
    assert F.shape == (T - 1, B, 3, 4)


def test_ctrl_passthrough_wrapper():
    from dilqr_tpu.models import ctrl_passthrough, pendulum

    base = pendulum.make()
    aug = ctrl_passthrough.make(base)
    assert aug.n_state == base.n_state + 1 and aug.n_ctrl == 1
    params = pendulum.default_params()
    x = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    u = jnp.array([0.5], jnp.float32)
    xa = jnp.concatenate([jnp.array([0.2]), x])
    out = aug.step(xa, u, params)
    np.testing.assert_allclose(np.asarray(out[0]), 0.5)  # u passthrough
    np.testing.assert_allclose(
        np.asarray(out[1:]), np.asarray(base.step(x, u, params)), atol=1e-6
    )


def test_render_hooks_smoke():
    from dilqr_tpu import viz

    ax = viz.pendulum_frame(np.array([0.8, 0.6, 0.0]))
    assert ax is not None
    ax = viz.cartpole_frame(np.array([0.1, 0.0, 0.9, 0.43, 0.0]))
    assert ax is not None
    xs = np.random.RandomState(0).randn(5, 13).astype(np.float32)
    us = np.random.RandomState(1).randn(5, 3).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = viz.rocket_trajectory(xs, us, path=os.path.join(d, "r.png"))
        assert os.path.exists(p)
        g = viz.rocket_animation(xs, us, path=os.path.join(d, "r.gif"))
        assert os.path.exists(g) and os.path.getsize(g) > 0


def test_rotate_cs_kernel_branch_matches_reference_sequence():
    """kernel_math.rotate_cs: the in-kernel angle-addition form must match
    the reference's atan2 -> cos/sin(th + delta) sequence to f32 rounding
    for any input scale and any delta (the pendulum/cartpole steps route
    through it inside the fused kernels), and the off-kernel branch must
    be the EXACT sequential form (f64 golden parity depends on it)."""
    import jax.numpy as jnp

    from dilqr_tpu.utils.kernel_math import kernel_context, rotate_cs

    rng = np.random.RandomState(0)
    th = rng.uniform(-np.pi, np.pi, 4096).astype(np.float32)
    scale = rng.uniform(0.2, 5.0, 4096).astype(np.float32)  # non-unit norm
    delta = rng.uniform(-30.0, 30.0, 4096).astype(np.float32)
    c, s = jnp.asarray(scale * np.cos(th)), jnp.asarray(scale * np.sin(th))
    d = jnp.asarray(delta)

    ref_c = jnp.cos(jnp.arctan2(s, c) + d)
    ref_s = jnp.sin(jnp.arctan2(s, c) + d)

    off_c, off_s = rotate_cs(c, s, d)
    assert np.array_equal(np.asarray(off_c), np.asarray(ref_c))
    assert np.array_equal(np.asarray(off_s), np.asarray(ref_s))

    with kernel_context():
        kc, ks = rotate_cs(c, s, d)
    np.testing.assert_allclose(np.asarray(kc), np.asarray(ref_c), atol=3e-6)
    np.testing.assert_allclose(np.asarray(ks), np.asarray(ref_s), atol=3e-6)
    # output is unit-norm to rounding (repeated rotations must not drift)
    np.testing.assert_allclose(
        np.asarray(kc) ** 2 + np.asarray(ks) ** 2, 1.0, atol=1e-6
    )


def test_rocket_animation_geometry():
    """Body segment has the requested length, the tip sits above the tail
    for an upright rocket, and the flame points opposite the body-frame
    thrust (the quantities the animation draws, reference
    rocket.py:961-994)."""
    from dilqr_tpu import viz

    # upright (identity quaternion), thrust straight down the body axis
    xs = np.zeros((3, 13), np.float32)
    xs[:, 0] = [2.0, 1.5, 1.0]   # descending altitude
    xs[:, 6] = 1.0               # q = (1, 0, 0, 0)
    us = np.zeros((3, 3), np.float32)
    us[:, 0] = 8.0               # +x body thrust
    com, tail, tip, flame = viz._rocket_geometry(xs, us, rocket_len=0.5)
    np.testing.assert_allclose(
        np.linalg.norm(tip - tail, axis=1), 0.5, atol=1e-6
    )
    assert (tip[:, 0] > tail[:, 0]).all()        # tip above tail
    # flame extends below the tail, opposite the thrust direction
    assert (flame[:, 0] < tail[:, 0]).all()
    np.testing.assert_allclose(flame[:, 1:], tail[:, 1:], atol=1e-6)
