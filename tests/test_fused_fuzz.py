"""Randomized cross-backend fuzz: megakernel (interpret) vs the XLA scan on
randomly generated smooth nonlinear control problems across n_ctrl 1..3.
Catches corner interactions (active-set flips, line-search boundaries,
asymmetric bounds) that the curated env tests miss."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dilqr_tpu.core.solver import solve
from dilqr_tpu.models.base import Dynamics
from dilqr_tpu.types import ILQRConfig, QuadCost

F32 = jnp.float32


def _random_env(rng, nx, nu):
    """A stable random smooth system: x' = x + dt (tanh(A x) + B u + b).

    Coefficients are python floats (compile-time constants) and the step is
    written with index arithmetic, like the real envs -- the fused kernels
    trace it on [d, 8, 128] lane arrays and cannot capture array constants.
    """
    A = (0.8 * rng.randn(nx, nx)).tolist()
    Bm = (0.7 * rng.randn(nx, nu)).tolist()
    b = (0.2 * rng.randn(nx)).tolist()
    dt = 0.1
    lo = float(-(0.5 + rng.rand()))
    hi = float(0.5 + rng.rand())

    def _step(x, u, params, clamp):
        a0, a1 = params[0], params[1]
        uu = [jnp.clip(u[j], lo, hi) if clamp else u[j] for j in range(nu)]
        rows = []
        for i in range(nx):
            lin = sum(A[i][j] * x[j] for j in range(nx))
            ctl = sum(Bm[i][j] * uu[j] for j in range(nu))
            rows.append(x[i] + dt * (jnp.tanh(lin) * a0 + ctl * a1 + b[i]))
        return jnp.stack(rows)

    def step(x, u, params):
        return _step(x, u, params, clamp=True)

    def step_unclamped(x, u, params):
        return _step(x, u, params, clamp=False)

    dyn = Dynamics(
        n_state=nx, n_ctrl=nu, step=step, step_unclamped=step_unclamped,
        lower=lo, upper=hi, linesearch_decay=0.5, max_linesearch_iter=3,
    )
    return dyn, jnp.asarray([1.0, 1.0], F32), lo, hi


@pytest.mark.parametrize("seed", range(6))
def test_fused_fuzz_random_problems(seed):
    rng = np.random.RandomState(100 + seed)
    nu = 1 + seed % 3
    nx = int(rng.randint(2, 6))
    T = int(rng.randint(3, 9))
    B = int(rng.randint(1, 6))
    dyn, params, lo, hi = _random_env(rng, nx, nu)
    n = nx + nu
    q = jnp.asarray(10.0 ** rng.uniform(-1, 1, n), F32)
    p = jnp.asarray(0.5 * rng.randn(n), F32)
    x_init = jnp.asarray(rng.randn(B, nx), F32)
    cfg = ILQRConfig(
        n_state=nx, n_ctrl=nu, T=T, lqr_iter=4, eps=0.0,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    boxed = seed % 2 == 0
    kw = dict(u_lower=lo, u_upper=hi) if boxed else {}
    args = (x_init, QuadCost(jnp.diag(q), p), dyn)
    r_x = solve(dataclasses.replace(cfg, backend="xla"), *args,
                params=params, **kw)
    r_p = solve(dataclasses.replace(cfg, backend="pallas"), *args,
                params=params, **kw)
    cx, cp = np.asarray(r_x.costs), np.asarray(r_p.costs)
    scale = np.abs(cx).max() + 1e-6
    assert np.abs(cx - cp).max() / scale < 1e-4, (seed, cx, cp)
    np.testing.assert_allclose(
        np.asarray(r_p.u), np.asarray(r_x.u), atol=5e-3,
        err_msg=f"seed={seed} nx={nx} nu={nu} T={T} boxed={boxed}",
    )


def test_array_closure_env_falls_back():
    """An env step that closes over array constants cannot trace into the
    fused kernel; the dispatch must fall back to the XLA path, not error."""
    A = jnp.asarray(np.eye(3, dtype=np.float32) * 0.9)

    def step(x, u, params):
        return A @ x + jnp.concatenate([u, jnp.zeros(2, F32)]) * params[0]

    dyn = Dynamics(n_state=3, n_ctrl=1, step=step, lower=-1.0, upper=1.0)
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=4, lqr_iter=2, eps=1e-4,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    q = jnp.ones(4, F32)
    r = solve(cfg, jnp.ones((2, 3), F32), QuadCost(jnp.diag(q), jnp.zeros(4, F32)),
              dyn, params=jnp.asarray([0.5], F32), u_lower=-1.0, u_upper=1.0)
    assert np.isfinite(np.asarray(r.costs)).all()


def test_vmap_over_solve_xla_path():
    """jax.vmap over solve on the explicit XLA path (the fused path has
    its own custom_vmap routing -- test_vmap_fused.py)."""
    from dilqr_tpu.models import pendulum

    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    x0 = jnp.stack([jnp.ones(2), jnp.zeros(2), jnp.zeros(2)], 1)
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=5, lqr_iter=3, eps=1e-4,
        exit_unconverged=False, detach_unconverged=False,
        backprop=False, backend="xla",
    )
    scales = jnp.linspace(0.5, 2.0, 3)
    out = jax.vmap(
        lambda s: solve(cfg, x0, QuadCost(jnp.diag(jnp.asarray(q) * s), p),
                        dyn, params=params, u_lower=-2.0, u_upper=2.0).costs
    )(scales)
    assert out.shape == (3, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("seed", range(8))
def test_fused_fuzz_round2_features(seed):
    """Round-2 feature-matrix fuzz: random combinations of LinDx vs env
    dynamics, zero-control masks, scalar trust regions, warm starts, and
    nu up to 5 (the Gauss-Jordan lane inverse path), fused vs XLA."""
    from dilqr_tpu.types import LinDx

    rng = np.random.RandomState(500 + seed)
    nu = int(rng.randint(1, 6))
    nx = int(rng.randint(2, 6))
    T = int(rng.randint(3, 8))
    B = int(rng.randint(1, 5))
    n = nx + nu
    use_lindx = seed % 2 == 0
    use_uz = rng.rand() < 0.5
    use_delta = rng.rand() < 0.5
    use_warm = rng.rand() < 0.5

    q = jnp.asarray(10.0 ** rng.uniform(-1, 1, n), F32)
    p = jnp.asarray(0.5 * rng.randn(n), F32)
    x_init = jnp.asarray(rng.randn(B, nx), F32)

    if use_lindx:
        F = jnp.asarray(
            np.swapaxes(
                (0.25 * rng.randn(T - 1, B, nx, n)
                 + np.concatenate([np.eye(nx), np.zeros((nx, nu))], 1)
                 ).astype(np.float32), 0, 1))
        f = jnp.asarray(
            np.swapaxes((0.1 * rng.randn(T - 1, B, nx)).astype(np.float32),
                        0, 1))
        dyn = LinDx(F, f if rng.rand() < 0.7 else None)
        params = None
        lo, hi = -0.6, 0.6
        decay, ls = 0.5, 3
    else:
        dyn, params, lo, hi = _random_env(rng, nx, nu)
        decay, ls = dyn.linesearch_decay, dyn.max_linesearch_iter

    cfg = ILQRConfig(
        n_state=nx, n_ctrl=nu, T=T, lqr_iter=4, eps=0.0,
        linesearch_decay=decay, max_linesearch_iter=ls,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    boxed = use_delta or rng.rand() < 0.7  # delta_u requires bounds
    kw = {}
    if boxed:
        kw.update(u_lower=lo, u_upper=hi)
    if use_delta:
        kw.update(delta_u=float(0.2 + 0.3 * rng.rand()))
    if use_uz:
        kw.update(u_zero_I=jnp.asarray(rng.rand(B, T, nu) < 0.3))
    if use_warm:
        kw.update(u_init=jnp.asarray(
            0.3 * rng.randn(B, T, nu).astype(np.float32)))

    args = (x_init, QuadCost(jnp.diag(q), p), dyn)
    r_x = solve(dataclasses.replace(cfg, backend="xla"), *args,
                params=params, **kw)
    r_p = solve(dataclasses.replace(cfg, backend="pallas"), *args,
                params=params, **kw)
    cx, cp = np.asarray(r_x.costs), np.asarray(r_p.costs)
    scale = np.abs(cx).max() + 1e-6
    tag = (f"seed={seed} nx={nx} nu={nu} T={T} lindx={use_lindx} "
           f"uz={use_uz} delta={use_delta} warm={use_warm} boxed={boxed}")
    assert np.abs(cx - cp).max() / scale < 1e-4, (tag, cx, cp)
    np.testing.assert_allclose(
        np.asarray(r_p.u), np.asarray(r_x.u), atol=5e-3, err_msg=tag
    )
