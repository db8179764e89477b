"""Parity of the fused Pallas Riccati kernel (ops/pallas/riccati_fused.py)
against the pure-XLA lax.scan path, run in interpret mode on CPU. On-device
(TPU) agreement was additionally measured at <= 4e-7 max err on the
flagship shapes (T=20, B=4096, cartpole)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dilqr_tpu.ops.riccati import lqr_backward

F32 = jnp.float32


def _problem(seed, T, B, nx):
    n = nx + 1
    rng = np.random.RandomState(seed)
    A = rng.randn(T, B, n, n).astype(np.float32)
    C = jnp.asarray(A @ A.transpose(0, 1, 3, 2) + 2.0 * np.eye(n, dtype=np.float32))
    c = jnp.asarray(rng.randn(T, B, n).astype(np.float32))
    F = jnp.asarray(0.3 * rng.randn(T - 1, B, nx, n).astype(np.float32))
    u = jnp.asarray(0.5 * rng.randn(T, B, 1).astype(np.float32))
    return C, c, F, u


@pytest.mark.parametrize("boxed", [False, True])
@pytest.mark.parametrize("shape", [(6, 5, 4), (3, 2, 5)])
def test_pallas_riccati_matches_xla(boxed, shape):
    T, B, nx = shape
    C, c, F, u = _problem(0, T, B, nx)
    kw = dict(u_lower=-1.0, u_upper=1.0) if boxed else {}
    ref = lqr_backward(nx, 1, C, c, F, None, u, backend="xla", **kw)
    pal = lqr_backward(nx, 1, C, c, F, None, u, backend="pallas", **kw)
    np.testing.assert_allclose(np.asarray(pal.K), np.asarray(ref.K), atol=2e-6)
    np.testing.assert_allclose(np.asarray(pal.k), np.asarray(ref.k), atol=2e-6)


@pytest.mark.parametrize("env_name", ["pendulum", "cartpole"])
@pytest.mark.parametrize("boxed", [False, True])
def test_fused_whole_solve_matches_xla(env_name, boxed):
    """Whole-solve megakernel (ops/pallas/ilqr_fused.py) vs the lax.scan
    path, interpret mode. f32 tolerances: the iLQR iteration amplifies
    rounding ~100x over iterations (see test_mpc_golden.py docstring); cost
    agreement is the tight check. On the real chip the same comparison gave
    u err <= 1e-2 with cost err <= 3e-5 at B=512->1024 padding."""
    import dataclasses

    from dilqr_tpu.core.solver import solve
    from dilqr_tpu.models import cartpole, pendulum
    from dilqr_tpu.types import ILQRConfig, QuadCost

    env_mod = {"pendulum": pendulum, "cartpole": cartpole}[env_name]
    dyn = env_mod.make()
    params = env_mod.default_params()
    q, p = env_mod.get_true_obj()
    nx = dyn.n_state
    B, T = 6, 8
    rng = np.random.RandomState(0)
    th = rng.uniform(-2, 2, B).astype(np.float32)
    if env_name == "pendulum":
        x_init = jnp.stack(
            [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)), jnp.zeros(B)], 1
        )
    else:
        x_init = jnp.stack(
            [jnp.zeros(B), jnp.zeros(B), jnp.cos(jnp.asarray(th)),
             jnp.sin(jnp.asarray(th)), jnp.zeros(B)], 1
        )
    cfg = ILQRConfig(
        n_state=nx, n_ctrl=1, T=T, lqr_iter=6, eps=0.0,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    kw = dict(u_lower=dyn.lower, u_upper=dyn.upper) if boxed else {}
    args = (x_init, QuadCost(jnp.diag(q), p), dyn)
    r_x = solve(dataclasses.replace(cfg, backend="xla"), *args, params=params, **kw)
    r_p = solve(dataclasses.replace(cfg, backend="pallas"), *args, params=params, **kw)
    np.testing.assert_allclose(np.asarray(r_p.u), np.asarray(r_x.u), atol=2e-3)
    np.testing.assert_allclose(np.asarray(r_p.x), np.asarray(r_x.x), atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(r_p.costs), np.asarray(r_x.costs), atol=1e-5, rtol=1e-5
    )
    assert int(r_p.n_iter) == int(r_x.n_iter)


@pytest.mark.parametrize("boxed", [False, True])
def test_fused_whole_solve_rocket_nu3(boxed):
    """nu=3 path: in-kernel projected-Newton pnqp with adjugate solves
    (reference pnqp.py:5-82). On the real chip this configuration measured
    209k solves/s vs 3.5k for the lax.scan path (60x), costs agreeing to
    3e-7 relative."""
    import dataclasses

    from dilqr_tpu.core.solver import solve
    from dilqr_tpu.models import rocket
    from dilqr_tpu.types import ILQRConfig, QuadCost

    dyn = rocket.make()
    params = rocket.default_params()
    q, p = rocket.get_true_obj()
    B, T = 3, 6
    rng = np.random.RandomState(0)
    r0 = np.array([10.0, 0.0, 0.0]) + 0.5 * rng.randn(B, 3)
    v0 = np.array([-1.0, 0.0, 0.0]) + 0.1 * rng.randn(B, 3)
    q0 = np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (B, 1))
    w0 = 0.05 * rng.randn(B, 3)
    x_init = jnp.asarray(np.concatenate([r0, v0, q0, w0], 1), jnp.float32)
    cfg = ILQRConfig(
        n_state=13, n_ctrl=3, T=T, lqr_iter=5, eps=0.0,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    kw = dict(u_lower=dyn.lower, u_upper=dyn.upper) if boxed else {}
    args = (x_init, QuadCost(jnp.diag(q), p), dyn)
    r_x = solve(dataclasses.replace(cfg, backend="xla"), *args, params=params, **kw)
    r_p = solve(dataclasses.replace(cfg, backend="pallas"), *args, params=params, **kw)
    np.testing.assert_allclose(np.asarray(r_p.u), np.asarray(r_x.u), atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(r_p.costs), np.asarray(r_x.costs), rtol=1e-5
    )


def test_fused_whole_solve_warm_start_and_per_time_cost():
    """Exercise the non-default megakernel paths: warm-started u_init and a
    per-timestep [T,n,n] cost (smem per_t mode)."""
    import dataclasses

    from dilqr_tpu.core.solver import solve
    from dilqr_tpu.models import pendulum
    from dilqr_tpu.types import ILQRConfig, QuadCost

    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    B, T = 4, 6
    rng = np.random.RandomState(1)
    th = rng.uniform(-2, 2, B).astype(np.float32)
    x_init = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)), jnp.zeros(B)], 1
    )
    # time-varying diagonal cost + warm start
    scale = jnp.linspace(0.5, 2.0, T)[:, None]
    C_t = jax.vmap(jnp.diag)(scale * q[None, :])
    p_t = jnp.broadcast_to(p, (T, 4))
    u0 = jnp.asarray(0.1 * rng.randn(B, T, 1), jnp.float32)
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=4, eps=0.0,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    kw = dict(u_lower=dyn.lower, u_upper=dyn.upper, u_init=u0)
    args = (x_init, QuadCost(C_t, p_t), dyn)
    r_x = solve(dataclasses.replace(cfg, backend="xla"), *args, params=params, **kw)
    r_p = solve(dataclasses.replace(cfg, backend="pallas"), *args, params=params, **kw)
    np.testing.assert_allclose(np.asarray(r_p.u), np.asarray(r_x.u), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(r_p.costs), np.asarray(r_x.costs), atol=1e-5, rtol=1e-5
    )


def test_fused_dispatch_tolerates_pytree_params():
    """Regression: fused_supported must return False (not crash) for
    pytree dynamics params (NNDynamics weight lists) under the default
    backend."""
    from dilqr_tpu.core.solver import solve
    from dilqr_tpu.models import nn_dynamics
    from dilqr_tpu.types import ILQRConfig, QuadCost

    dyn = nn_dynamics.make(3, 1)
    params = nn_dynamics.init_params(jax.random.PRNGKey(0), 3, 1, (8,))
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=4, lqr_iter=2, eps=1e-4,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    q = jnp.ones(4)
    r = solve(
        cfg, 0.1 * jnp.ones((2, 3)),  # tests run x64; params follow
        QuadCost(jnp.diag(q), jnp.zeros(4)), dyn, params=params,
    )
    assert np.isfinite(np.asarray(r.costs)).all()


def test_pallas_riccati_u_zero_mask():
    """The zero-control equality mode used by the KKT/IFT backward's
    auxiliary solves (reference lqr_step.py:99-127)."""
    T, B, nx = 6, 4, 4
    C, c, F, u = _problem(2, T, B, nx)
    rng = np.random.RandomState(3)
    uz = jnp.asarray(rng.rand(T, B, 1) < 0.3)
    ref = lqr_backward(nx, 1, C, c, F, None, u, u_zero_I=uz, backend="xla")
    pal = lqr_backward(nx, 1, C, c, F, None, u, u_zero_I=uz, backend="pallas")
    np.testing.assert_allclose(np.asarray(pal.K), np.asarray(ref.K), atol=2e-6)
    np.testing.assert_allclose(np.asarray(pal.k), np.asarray(ref.k), atol=2e-6)


def test_pallas_riccati_delta_u():
    T, B, nx = 5, 3, 4
    C, c, F, u = _problem(1, T, B, nx)
    kw = dict(u_lower=-1.0, u_upper=1.0, delta_u=0.3)
    ref = lqr_backward(nx, 1, C, c, F, None, u, backend="xla", **kw)
    pal = lqr_backward(nx, 1, C, c, F, None, u, backend="pallas", **kw)
    np.testing.assert_allclose(np.asarray(pal.K), np.asarray(ref.K), atol=2e-6)
    np.testing.assert_allclose(np.asarray(pal.k), np.asarray(ref.k), atol=2e-6)


def test_stream_k_bitwise_matches_vmem_mode():
    """Long-horizon mode (K gain stack double-buffered through HBM,
    ops/pallas/ilqr_fused.use_stream_k) vs the all-VMEM megakernel: the
    math is identical, only the storage differs, so interpret-mode results
    must be BITWISE equal. On the real chip the same comparison at rocket
    T=40 B=1024 is exercised by scripts/tpu_smoke.py."""
    from dilqr_tpu.models import pendulum
    from dilqr_tpu.ops.pallas.ilqr_fused import ilqr_fused
    from dilqr_tpu.types import ILQRConfig, QuadCost

    dyn, params = pendulum.make(), pendulum.default_params()
    q, p = pendulum.get_true_obj()
    B, T, n = 6, 8, 4
    rng = np.random.RandomState(0)
    th = rng.uniform(-2, 2, B).astype(np.float32)
    x_init = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)), jnp.zeros(B)], 1
    ).astype(jnp.float32)
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=6, eps=0.0,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    C = jnp.broadcast_to(jnp.diag(q).astype(jnp.float32), (T, B, n, n))
    c = jnp.broadcast_to(p.astype(jnp.float32), (T, B, n))
    kw = dict(
        u_lower=-2.0, u_upper=2.0,
        cost_small=(jnp.diag(q).astype(jnp.float32), p.astype(jnp.float32)),
        interpret=True,
    )
    pf = jnp.asarray(params, jnp.float32)
    a = ilqr_fused(cfg, dyn, pf, x_init, C, c, None, force_stream_k=False, **kw)
    b = ilqr_fused(cfg, dyn, pf, x_init, C, c, None, force_stream_k=True, **kw)
    for name, av, bv in zip(["x", "u", "costs", "du", "n_iter"], a, b):
        assert np.array_equal(np.asarray(av), np.asarray(bv)), name


def test_stream_k_gate():
    """use_stream_k triggers exactly when the full-K footprint busts the
    VMEM budget but the staged footprint fits (rocket T=40 -- the
    reference's demo horizon, rocket.py:1108 -- is the motivating case)."""
    from dilqr_tpu.ops.pallas.ilqr_fused import (_vmem_bytes,
                                                 VMEM_SCRATCH_LIMIT,
                                                 use_stream_k)
    from dilqr_tpu.types import ILQRConfig

    rocket40 = ILQRConfig(n_state=13, n_ctrl=3, T=40)
    assert _vmem_bytes(rocket40) > VMEM_SCRATCH_LIMIT
    assert _vmem_bytes(rocket40, stream_k=True) <= VMEM_SCRATCH_LIMIT
    assert use_stream_k(rocket40)
    assert not use_stream_k(ILQRConfig(n_state=13, n_ctrl=3, T=20))
    assert not use_stream_k(ILQRConfig(n_state=5, n_ctrl=1, T=50))
