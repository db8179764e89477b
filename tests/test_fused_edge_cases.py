"""Edge cases of the whole-solve megakernel (interpret mode): per-example
lanes cost, nu=2 in-kernel pnqp (Cramer solves), degenerate T=1 / B=1, and
batch padding."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dilqr_tpu.core.solver import solve
from dilqr_tpu.models import pendulum
from dilqr_tpu.models.base import Dynamics
from dilqr_tpu.types import ILQRConfig, QuadCost

F32 = jnp.float32


def _compare(cfg, x_init, cost, dyn, params, **kw):
    r_x = solve(dataclasses.replace(cfg, backend="xla"), x_init, cost, dyn,
                params=params, **kw)
    r_p = solve(dataclasses.replace(cfg, backend="pallas"), x_init, cost, dyn,
                params=params, **kw)
    np.testing.assert_allclose(np.asarray(r_p.u), np.asarray(r_x.u), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(r_p.costs), np.asarray(r_x.costs), rtol=2e-5, atol=1e-6
    )
    return r_x, r_p


def _pendulum_problem(B, T, seed=0):
    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    rng = np.random.RandomState(seed)
    th = rng.uniform(-2, 2, B).astype(np.float32)
    x_init = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)), jnp.zeros(B)], 1
    )
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=4, eps=0.0,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    return cfg, x_init, dyn, params, q, p


def test_fused_per_example_lanes_cost():
    """[B,T,n,n] per-example cost forces the lanes (non-SMEM) path."""
    B, T = 3, 5
    cfg, x_init, dyn, params, q, p = _pendulum_problem(B, T)
    rng = np.random.RandomState(1)
    scale = jnp.asarray(1.0 + 0.5 * rng.rand(B, T, 1).astype(np.float32))
    C = jnp.broadcast_to(jnp.diag(q), (B, T, 4, 4)) * scale[..., None]
    c = jnp.broadcast_to(p, (B, T, 4)) * scale
    _compare(cfg, x_init, QuadCost(C, c), dyn, params,
             u_lower=dyn.lower, u_upper=dyn.upper)


@pytest.mark.parametrize("B,T", [(1, 5), (2, 1), (5, 2)])
def test_fused_degenerate_shapes(B, T):
    cfg, x_init, dyn, params, q, p = _pendulum_problem(B, T)
    _compare(cfg, x_init, QuadCost(jnp.diag(q), p), dyn, params,
             u_lower=dyn.lower, u_upper=dyn.upper)


def _double_pendulum_style():
    """A synthetic 4-state 2-control env to exercise nu=2 (Cramer path)."""
    def step(x, u, params):
        k1, k2, d = params
        q0, q1, v0, v1 = x[0], x[1], x[2], x[3]
        u0 = jnp.clip(u[0], -1.5, 1.5)
        u1 = jnp.clip(u[1], -1.5, 1.5)
        a0 = -k1 * jnp.sin(q0) - d * v0 + u0 + 0.3 * u1
        a1 = -k2 * jnp.sin(q1) - d * v1 + u1 - 0.2 * u0
        dt = 0.05
        return jnp.stack([q0 + dt * v0, q1 + dt * v1, v0 + dt * a0, v1 + dt * a1])

    def step_unclamped(x, u, params):
        k1, k2, d = params
        q0, q1, v0, v1 = x[0], x[1], x[2], x[3]
        a0 = -k1 * jnp.sin(q0) - d * v0 + u[0] + 0.3 * u[1]
        a1 = -k2 * jnp.sin(q1) - d * v1 + u[1] - 0.2 * u[0]
        dt = 0.05
        return jnp.stack([q0 + dt * v0, q1 + dt * v1, v0 + dt * a0, v1 + dt * a1])

    return Dynamics(
        n_state=4, n_ctrl=2, step=step, step_unclamped=step_unclamped,
        lower=-1.5, upper=1.5, linesearch_decay=0.5, max_linesearch_iter=4,
    )


@pytest.mark.parametrize("boxed", [False, True])
def test_fused_nu2_pnqp(boxed):
    dyn = _double_pendulum_style()
    params = jnp.array([2.0, 1.5, 0.1], F32)
    B, T = 4, 6
    rng = np.random.RandomState(0)
    x_init = jnp.asarray(rng.uniform(-1, 1, (B, 4)).astype(np.float32))
    q = jnp.array([1.0, 1.0, 0.1, 0.1, 1e-3, 1e-3], F32)
    p = jnp.zeros(6, F32)
    cfg = ILQRConfig(
        n_state=4, n_ctrl=2, T=T, lqr_iter=4, eps=0.0,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    kw = dict(u_lower=dyn.lower, u_upper=dyn.upper) if boxed else {}
    _compare(cfg, x_init, QuadCost(jnp.diag(q), p), dyn, params, **kw)


@pytest.mark.parametrize("boxed", [False, True])
@pytest.mark.parametrize("nu2", [False, True])
def test_fused_u_zero_I(boxed, nu2):
    """In-kernel zero-control constraints (round-2): masked free-subspace
    gains when unbounded (reference lqr_step.py:99-127, incl. the nu==1
    unmasked-Quu quirk) and rollout masking before the clamp
    (lqr_step.py:197-213), vs the XLA path."""
    rng = np.random.RandomState(5)
    if nu2:
        dyn = _double_pendulum_style()
        params = jnp.array([2.0, 1.5, 0.1], F32)
        B, T, nu = 4, 6, 2
        x_init = jnp.asarray(rng.uniform(-1, 1, (B, 4)).astype(np.float32))
        q = jnp.array([1.0, 1.0, 0.1, 0.1, 1e-3, 1e-3], F32)
        p = jnp.zeros(6, F32)
        cfg = ILQRConfig(
            n_state=4, n_ctrl=2, T=T, lqr_iter=4, eps=0.0,
            linesearch_decay=dyn.linesearch_decay,
            max_linesearch_iter=dyn.max_linesearch_iter,
            exit_unconverged=False, detach_unconverged=False, backprop=False,
        )
    else:
        B, T, nu = 4, 6, 1
        cfg, x_init, dyn, params, q, p = _pendulum_problem(B, T)
    uz = jnp.asarray(rng.rand(B, T, nu) < 0.35)
    kw = dict(u_lower=dyn.lower, u_upper=dyn.upper) if boxed else {}
    r_x, r_p = _compare(
        cfg, x_init, QuadCost(jnp.diag(q), p), dyn, params,
        u_zero_I=uz, **kw
    )
    # the mask is actually enforced by the kernel
    assert np.abs(np.asarray(r_p.u)[np.asarray(uz)]).max() == 0.0


def test_fused_delta_u():
    """In-kernel trust region (round-2): QP delta bounds intersected with
    +-delta_u (lqr_step.py:132-135) and the rollout clamp widened around
    the current iterate (lqr_step.py:200-213), vs the XLA path."""
    dyn = _double_pendulum_style()
    params = jnp.array([2.0, 1.5, 0.1], F32)
    B, T = 4, 6
    rng = np.random.RandomState(6)
    x_init = jnp.asarray(rng.uniform(-1, 1, (B, 4)).astype(np.float32))
    q = jnp.array([1.0, 1.0, 0.1, 0.1, 1e-3, 1e-3], F32)
    p = jnp.zeros(6, F32)
    cfg = ILQRConfig(
        n_state=4, n_ctrl=2, T=T, lqr_iter=4, eps=0.0,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    r_x, r_p = _compare(
        cfg, x_init, QuadCost(jnp.diag(q), p), dyn, params,
        u_lower=dyn.lower, u_upper=dyn.upper, delta_u=0.4,
    )
    # per-iteration steps really were trust-region-limited: the first
    # accepted iterate moves at most delta_u from the zero warm start
    assert np.abs(np.asarray(r_p.u)).max() <= 1.5 + 1e-6


def _random_lindx(seed, T, B, nx, nu, ridge=0.5, f_scale=0.1, F_scale=0.3):
    """Batch-major random LQR problem: SPD cost, near-identity F.
    Returns (cfg-ready pieces): QuadCost, LinDx (f=None if f_scale is
    None), x_init."""
    from dilqr_tpu.types import LinDx

    rng = np.random.RandomState(seed)
    n = nx + nu
    A = rng.randn(T, B, n, n).astype(np.float32)
    C = jnp.asarray(A @ A.transpose(0, 1, 3, 2)
                    + ridge * np.eye(n, dtype=np.float32))
    c = jnp.asarray(rng.randn(T, B, n).astype(np.float32))
    F = jnp.asarray(
        (rng.randn(T - 1, B, nx, n) * F_scale
         + np.concatenate([np.eye(nx), np.zeros((nx, nu))], 1)
         ).astype(np.float32))
    f = (None if f_scale is None else
         jnp.asarray((rng.randn(T - 1, B, nx) * f_scale).astype(np.float32)))
    x_init = jnp.asarray(rng.randn(B, nx).astype(np.float32))
    bm = lambda a: jnp.swapaxes(a, 0, 1)
    return (QuadCost(bm(C), bm(c)),
            LinDx(bm(F), None if f is None else bm(f)), x_init, rng)


@pytest.mark.parametrize("boxed", [False, True])
@pytest.mark.parametrize("with_f", [True, False])
def test_fused_lindx(boxed, with_f):
    """Time-varying affine (LinDx / classic LQR) problems on the fused
    whole-solve kernel (round 2): F/f ride in as lane inputs, the
    linearization stage reads them instead of tracing jax.linearize, and
    the rollout steps x' = F tau + f, vs the XLA path."""
    cost, dynx, x_init, _ = _random_lindx(
        3, 8, 6, 3, 2, f_scale=0.1 if with_f else None
    )
    cfg = ILQRConfig(
        n_state=3, n_ctrl=2, T=8, lqr_iter=8, eps=0.0,
        detach_unconverged=False, backprop=False,
    )
    kw = dict(u_lower=-0.5, u_upper=0.5) if boxed else {}
    _compare(cfg, x_init, cost, dynx, None, **kw)


def test_fused_lindx_u_zero():
    """LinDx + zero-control constraints on the fused path (masked
    free-subspace gains, unbounded branch)."""
    cost, dynx, x_init, rng = _random_lindx(9, 6, 4, 3, 2, f_scale=None)
    uz = jnp.asarray(rng.rand(4, 6, 2) < 0.3)
    cfg = ILQRConfig(
        n_state=3, n_ctrl=2, T=6, lqr_iter=6, eps=0.0,
        detach_unconverged=False, backprop=False,
    )
    r_x, r_p = _compare(cfg, x_init, cost, dynx, None, u_zero_I=uz)
    assert np.abs(np.asarray(r_p.u)[np.asarray(uz)]).max() == 0.0


@pytest.mark.parametrize("nu", [4, 5, 6, 7, 8])
@pytest.mark.parametrize("boxed", [False, True])
def test_fused_gauss_jordan_nu(nu, boxed):
    """nu in 4..8 (odd and even) exercises the unrolled lane Gauss-Jordan inverse
    (round 2; closed-form inverses stop at nu=3) inside the in-kernel
    pnqp and gain solves, vs the XLA path -- covering the full advertised
    MAX_NU=8 envelope."""
    cost, dynx, x_init, _ = _random_lindx(
        11 + nu, 5, 3, 4, nu, ridge=1.0, f_scale=None, F_scale=0.2
    )
    cfg = ILQRConfig(
        n_state=4, n_ctrl=nu, T=5, lqr_iter=4, eps=0.0,
        detach_unconverged=False, backprop=False,
    )
    kw = dict(u_lower=-0.4, u_upper=0.4) if boxed else {}
    _compare(cfg, x_init, cost, dynx, None, **kw)


def test_fused_per_example_bounds():
    """Per-example [B,T,nu] box bounds cannot bake as compile-time
    constants; they ride as two [T,nu] lane inputs (lb_ref/ub_ref) --
    the dynamic-bounds kernel path, vs the XLA path."""
    B, T = 4, 6
    cfg, x_init, dyn, params, q, p = _pendulum_problem(B, T)
    rng = np.random.RandomState(13)
    lb = jnp.asarray(-(1.0 + rng.rand(B, T, 1)).astype(np.float32))
    ub = jnp.asarray((1.0 + rng.rand(B, T, 1)).astype(np.float32))
    r_x, r_p = _compare(
        cfg, x_init, QuadCost(jnp.diag(q), p), dyn, params,
        u_lower=lb, u_upper=ub,
    )
    # the per-example bounds really constrain the kernel's solution
    u = np.asarray(r_p.u)
    assert (u <= np.asarray(ub) + 1e-6).all()
    assert (u >= np.asarray(lb) - 1e-6).all()
    assert np.abs(u).max() > 1.0  # some example uses its wider box


@pytest.mark.parametrize("with_params", [True, False])
def test_fused_callable_cost(with_params):
    """In-kernel module (callable) costs (round 2, the last fused-coverage
    row): the cost is authored like env steps (index arithmetic, so it
    traces on [n,8,128] lane stacks), its params ride as SMEM scalars,
    the TRUE cost backs the rollout/line-search objectives, and the
    Riccati stage quadraticizes it in-kernel with one-hot jvp probes --
    vs the XLA path's approximate_cost + lax.scan."""
    dyn = pendulum.make()
    params = jnp.asarray(pendulum.default_params(), F32)
    rng = np.random.RandomState(7)
    B, T = 4, 6
    th = rng.uniform(-2, 2, B).astype(np.float32)
    x_init = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)), jnp.zeros(B)], 1
    ).astype(F32)
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=5, eps=0.0,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    if with_params:
        cp = jnp.asarray(
            np.concatenate(
                [0.5 + rng.rand(4), 0.3 * rng.randn(4)]
            ).astype(np.float32))

        def cost_fn(tau, p):
            acc = None
            for i in range(4):
                d = tau[i] - p[4 + i]
                term = 0.5 * p[i] * d * d
                acc = term if acc is None else acc + term
            return acc + 0.01 * tau[3] ** 4

        cost = (cost_fn, cp)
    else:
        # parameterless callable (python-float constants only)
        def cost(tau):
            return (0.5 * (tau[0] - 1.0) ** 2 + 0.5 * tau[1] ** 2
                    + 0.05 * tau[2] ** 2 + 1e-3 * tau[3] ** 2
                    + 0.01 * tau[3] ** 4)

    r_x, r_p = _compare(cfg, x_init, cost, dyn, params,
                        u_lower=-2.0, u_upper=2.0)
    # the kernel path really ran (an XLA-vs-XLA comparison would be 0.0)
    assert np.abs(np.asarray(r_p.u) - np.asarray(r_x.u)).max() > 0.0


def test_fused_callable_cost_array_capture_falls_back():
    """A callable cost closing over array constants cannot trace into the
    kernel (same contract as env steps); dispatch must fall back to the
    XLA path, not error."""
    w = jnp.asarray(np.array([1.0, 1.0, 0.1, 1e-3], np.float32))

    def cost(tau):
        return 0.5 * jnp.sum(w * tau * tau, axis=0)

    dyn = pendulum.make()
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=4, lqr_iter=2, eps=1e-4,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    r = solve(cfg, jnp.ones((2, 3), F32), cost, dyn,
              params=jnp.asarray(pendulum.default_params(), F32),
              u_lower=-2.0, u_upper=2.0)
    assert np.isfinite(np.asarray(r.costs)).all()


def test_resident_lanes_entry_matches_standard():
    """ilqr_fused_lanes (the resident-layout single-kernel entry bench.py
    drives on-chip) must produce the standard wrapper's results exactly:
    it skips layout/canonicalization ops, not math."""
    from dilqr_tpu.models import pendulum
    from dilqr_tpu.ops.pallas.ilqr_fused import ilqr_fused, ilqr_fused_lanes
    from dilqr_tpu.ops.pallas.layout import from_lanes, to_lanes

    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    B, T = 1024, 6
    rng = np.random.RandomState(2)
    th = rng.uniform(-2, 2, B).astype(np.float32)
    x_init = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)), jnp.zeros(B)],
        1).astype(jnp.float32)
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=4, eps=0.0,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    n = 4
    x_s, u_s, c_s, du_s, it_s = ilqr_fused(
        cfg, dyn, params, x_init, None, None, None,
        u_lower=float(dyn.lower), u_upper=float(dyn.upper),
        cost_small=(jnp.diag(q), p), interpret=True,
    )

    params2d = jnp.asarray(params, jnp.float32).reshape(1, -1)
    # bench.py's construction: [B, nx] -> [nx, G, 8, 128]
    xi_lanes = x_init.T.reshape(3, B // 1024, 8, 128)
    Cs = jnp.asarray(q, jnp.float32).reshape(1, n)
    cs = jnp.asarray(p, jnp.float32).reshape(1, n)
    bx, bu, bc, bdu, it_l = ilqr_fused_lanes(
        cfg, dyn, params2d, xi_lanes, Cs, cs,
        u_lower=float(dyn.lower), u_upper=float(dyn.upper),
        interpret=True,
    )
    # raw lane outputs [T, d, G, 8, lw] -> [T, B, d]
    bx_std = from_lanes(bx, T, B)
    bu_std = from_lanes(bu, T, B)
    np.testing.assert_array_equal(np.asarray(bx_std), np.asarray(x_s))
    np.testing.assert_array_equal(np.asarray(bu_std), np.asarray(u_s))
    np.testing.assert_array_equal(
        np.asarray(bc).reshape(-1), np.asarray(c_s))
    np.testing.assert_array_equal(
        np.asarray(bdu).reshape(-1), np.asarray(du_s))
