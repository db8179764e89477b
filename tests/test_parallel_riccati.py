"""Parallel (associative-scan) Riccati vs the sequential scan
(ops/parallel_riccati.py). The stable 5-tuple combine is exact to machine
precision with no growth in T (validated to T=512)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dilqr_tpu.ops.parallel_riccati import plqr_backward, plqr_solve
from dilqr_tpu.ops.riccati import lqr_backward
from dilqr_tpu.ops.rollout import get_traj
from dilqr_tpu.types import LinDx


def _problem(T, B, nx, nu, seed=0, dtype=jnp.float64):
    n = nx + nu
    rng = np.random.RandomState(seed)
    A = rng.randn(T, B, n, n)
    C = jnp.asarray(A @ A.transpose(0, 1, 3, 2) + 3.0 * np.eye(n), dtype)
    c = jnp.asarray(rng.randn(T, B, n), dtype)
    Fx = np.eye(nx) + 0.08 * rng.randn(T - 1, B, nx, nx)
    Fu = 0.4 * rng.randn(T - 1, B, nx, nu)
    F = jnp.asarray(np.concatenate([Fx, Fu], -1), dtype)
    f = jnp.asarray(0.2 * rng.randn(T - 1, B, nx), dtype)
    x0 = jnp.asarray(rng.randn(B, nx), dtype)
    return C, c, F, f, x0


@pytest.mark.parametrize(
    "shape",
    [
        (6, 3, 4, 1),
        (32, 2, 3, 2),
        pytest.param((512, 1, 4, 2), marks=pytest.mark.slow),
    ],
)
def test_parallel_matches_sequential_f64(shape):
    T, B, nx, nu = shape
    C, c, F, f, x0 = _problem(T, B, nx, nu)
    ref = lqr_backward(nx, nu, C, c, F, f, jnp.zeros((T, B, nu)), backend="xla")
    K, k = plqr_backward(nx, nu, C, c, F, f)
    np.testing.assert_allclose(np.asarray(K), np.asarray(ref.K), atol=1e-10)
    np.testing.assert_allclose(np.asarray(k), np.asarray(ref.k), atol=1e-10)

    res = plqr_solve(nx, nu, C, c, F, f, x0)
    # the parallel rollout must reproduce the sequential open-loop rollout
    # of its own controls
    x_ref = get_traj(T, res.u, x0, LinDx(F, f))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), atol=1e-10)


@pytest.mark.slow
def test_parallel_f32_long_horizon():
    # slow lane: f32 stability at T=128 (default lane covers T<=64 f64)
    T, B, nx, nu = 128, 2, 3, 1
    C, c, F, f, x0 = _problem(T, B, nx, nu, dtype=jnp.float32)
    ref = lqr_backward(nx, nu, C, c, F, f, jnp.zeros((T, B, nu), jnp.float32),
                       backend="xla")
    K, k = plqr_backward(nx, nu, C, c, F, f)
    np.testing.assert_allclose(np.asarray(K), np.asarray(ref.K), atol=5e-4)
    np.testing.assert_allclose(np.asarray(k), np.asarray(ref.k), atol=5e-4)


def test_riccati_parallel_solve_end_to_end():
    """cfg.riccati_parallel=True through the full solve (the lqr_step
    dispatch, delta-space shift, and line search) must match sequential."""
    import dataclasses

    from dilqr_tpu.core.solver import solve
    from dilqr_tpu.models import pendulum
    from dilqr_tpu.types import ILQRConfig, QuadCost

    dyn = pendulum.make()
    params = pendulum.default_params().astype(jnp.float64)
    q, p = pendulum.get_true_obj()
    B, T = 3, 10
    rng = np.random.RandomState(0)
    th = rng.uniform(-1.5, 1.5, B)
    x0 = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)), jnp.zeros(B)], 1
    )
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=8, eps=0.0,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
        backend="xla",  # unconstrained sequential reference
    )
    # NB unconstrained (the parallel path requires no box)
    r_seq = solve(cfg, x0, QuadCost(jnp.diag(q), p), dyn, params=params)
    r_par = solve(
        dataclasses.replace(cfg, riccati_parallel=True),
        x0, QuadCost(jnp.diag(q), p), dyn, params=params,
    )
    np.testing.assert_allclose(
        np.asarray(r_par.u), np.asarray(r_seq.u), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(r_par.costs), np.asarray(r_seq.costs), atol=1e-10
    )


@pytest.mark.parametrize(
    "shape",
    [
        pytest.param((128, 2, 4, 1), marks=pytest.mark.slow),
        (64, 3, 3, 2),
    ],
)
def test_parallel_masked_matches_sequential_f64(shape):
    """u_zero_I free-subspace masking in the associative-scan Riccati
    (the KKT backward's auxiliary solve, reference lqr_step.py:99-127 /
    322-340) vs the sequential masked scan."""
    T, B, nx, nu = shape
    C, c, F, f, x0 = _problem(T, B, nx, nu, seed=3)
    rng = np.random.RandomState(7)
    uz = jnp.asarray(rng.rand(T, B, nu) < 0.3)
    ref = lqr_backward(nx, nu, C, c, F, f, jnp.zeros((T, B, nu)),
                       u_zero_I=uz, backend="xla")
    K, k = plqr_backward(nx, nu, C, c, F, f, u_zero_I=uz)
    np.testing.assert_allclose(np.asarray(K), np.asarray(ref.K), atol=1e-10)
    np.testing.assert_allclose(np.asarray(k), np.asarray(ref.k), atol=1e-10)
    # frozen rows carry exactly zero gain
    uzn = np.asarray(uz)
    assert np.all(np.asarray(K)[uzn] == 0.0)
    assert np.all(np.asarray(k)[uzn] == 0.0)


def test_kkt_vjp_parallel_matches_sequential():
    """kkt_vjp(parallel=True): auxiliary solve + both adjoint scans as
    associative scans must reproduce the sequential VJP (f64, active-set
    masked, T=64 LinDx)."""
    from dilqr_tpu.diff.kkt import kkt_vjp

    T, B, nx, nu = 64, 2, 3, 2
    C, c, F, f, x0 = _problem(T, B, nx, nu, seed=5)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(T, B, nx))
    u = jnp.asarray(rng.randn(T, B, nu))
    g_x = jnp.asarray(rng.randn(T, B, nx))
    g_u = jnp.asarray(rng.randn(T, B, nu))
    uz = jnp.asarray(rng.rand(T, B, nu) < 0.25)
    a = kkt_vjp(nx, nu, C, c, F, x, u, g_x, g_u, u_zero_I=uz,
                backend="xla", parallel=False)
    b = kkt_vjp(nx, nu, C, c, F, x, u, g_x, g_u, u_zero_I=uz,
                backend="xla", parallel=True)
    for ga, gb, name in zip(a, b, a._fields):
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(ga), atol=1e-9, err_msg=name
        )


@pytest.mark.slow
def test_ift_grad_riccati_parallel_end_to_end():
    """cfg.riccati_parallel threads into the IFT backward's per-GMRES-
    iteration auxiliary solves; gradients must match the sequential
    backward (f64, box-constrained pendulum). Slow lane: the components
    are covered by test_kkt_vjp_parallel_matches_sequential and
    test_riccati_parallel_solve_end_to_end in the default lane."""
    import dataclasses

    from dilqr_tpu.core.solver import solve
    from dilqr_tpu.models import pendulum
    from dilqr_tpu.types import BackwardMode, ILQRConfig, QuadCost

    dyn = pendulum.make()
    params = pendulum.default_params().astype(jnp.float64)
    q, p = pendulum.get_true_obj()
    B, T = 3, 12
    rng = np.random.RandomState(0)
    th = rng.uniform(-1.5, 1.5, B)
    x0 = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)), jnp.zeros(B)], 1
    ).astype(jnp.float64)
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=12, eps=1e-6,
        exit_unconverged=False, detach_unconverged=False,
        backward_mode=BackwardMode.IFT, backend="xla",
    )

    def loss(cfg_, th_):
        r = solve(cfg_, x0, QuadCost(jnp.diag(q), p), dyn, params=th_,
                  u_lower=-2.0, u_upper=2.0)
        return jnp.mean(r.u ** 2)

    g_seq = jax.grad(lambda t: loss(cfg, t))(params)
    g_par = jax.grad(
        lambda t: loss(dataclasses.replace(cfg, riccati_parallel=True), t)
    )(params)
    np.testing.assert_allclose(
        np.asarray(g_par), np.asarray(g_seq), rtol=1e-8, atol=1e-10
    )
