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


@pytest.mark.parametrize("shape", [(6, 3, 4, 1), (32, 2, 3, 2), (512, 1, 4, 2)])
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


def test_parallel_f32_long_horizon():
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
