"""Implicit-gradient validation (BASELINE config #4): the matrix-free DiLQR
IFT backward must match unrolled autodiff through the (fixed-trip-count)
solver -- the oracle the PyTorch reference cannot compute cheaply -- on
cost AND dynamics-parameter gradients."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import dilqr_tpu
from dilqr_tpu import BackwardMode, ILQRConfig, QuadCost
from dilqr_tpu.models import pendulum


def _setup(T=10, B=3):
    dyn = pendulum.make()
    params = pendulum.default_params()
    rng = np.random.RandomState(0)
    th = rng.uniform(-np.pi / 2, np.pi / 2, B)
    thdot = rng.uniform(-1, 1, B)
    x_init = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), thdot], axis=1), jnp.float32
    )
    q, p = pendulum.get_true_obj()
    wx = jnp.asarray(rng.randn(B, T, dyn.n_state), jnp.float32)
    wu = jnp.asarray(rng.randn(B, T, dyn.n_ctrl), jnp.float32)
    cfg = ILQRConfig(
        n_state=dyn.n_state,
        n_ctrl=dyn.n_ctrl,
        T=T,
        lqr_iter=40,
        eps=1e-6,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        detach_unconverged=False,
        exit_unconverged=False,
    )
    return dyn, params, x_init, q, p, wx, wu, cfg


def _loss_fn(cfg, dyn, x_init, wx, wu):
    def loss(params, C, c):
        res = dilqr_tpu.solve(
            cfg,
            x_init,
            QuadCost(C, c),
            dyn,
            params=params,
            u_lower=dyn.lower,
            u_upper=dyn.upper,
        )
        return jnp.sum(res.u * wu) + jnp.sum(res.x * wx)

    return loss


def test_ift_matches_unrolled():
    dyn, params, x_init, q, p, wx, wu, cfg = _setup()
    C = jnp.diag(q)
    c = p

    cfg_ift = dataclasses.replace(cfg, backward_mode=BackwardMode.IFT)
    cfg_unroll = dataclasses.replace(
        cfg, backward_mode=BackwardMode.UNROLL, unroll=True
    )

    g_ift = jax.grad(_loss_fn(cfg_ift, dyn, x_init, wx, wu), argnums=(0, 1, 2))(
        params, C, c
    )
    g_unr = jax.grad(
        _loss_fn(cfg_unroll, dyn, x_init, wx, wu), argnums=(0, 1, 2)
    )(params, C, c)

    names = ["dtheta", "dC", "dc"]
    for a, b, n in zip(g_ift, g_unr, names):
        a, b = np.asarray(a), np.asarray(b)
        if n == "dC":
            # the IFT/KKT dC is symmetrized (as the reference's,
            # lqr_step.py:346-351); unrolled autodiff returns the raw
            # asymmetric cotangent. They are the same gradient on the
            # symmetric subspace where C lives.
            a = 0.5 * (a + np.swapaxes(a, -1, -2))
            b = 0.5 * (b + np.swapaxes(b, -1, -2))
        scale = max(1.0, np.abs(b).max())
        err = np.abs(a - b).max() / scale
        assert err <= 1e-4, f"{n}: IFT vs UNROLL rel err {err:.2e}\n{a}\n{b}"


def test_kkt_runs_and_is_finite():
    """The O(T) module-KKT mode produces finite gradients of the same
    shapes (its values intentionally omit the fixed-point correction --
    that gap is the DiLQR paper's contribution)."""
    dyn, params, x_init, q, p, wx, wu, cfg = _setup(T=8, B=2)
    cfg_kkt = dataclasses.replace(cfg, backward_mode=BackwardMode.KKT)
    g = jax.grad(_loss_fn(cfg_kkt, dyn, x_init, wx, wu), argnums=(0, 1, 2))(
        params, jnp.diag(q), p
    )
    for a in g:
        assert np.isfinite(np.asarray(a)).all()


def test_dense_ift_matches_gmres():
    """cfg.ift_solver="dense" materializes the adjoint system by probing
    (the reference's mechanism, lqr_step_explicit.py:664-702); it must
    agree with the matrix-free GMRES solve."""
    dyn, params, x_init, q, p, wx, wu, cfg = _setup(T=6)
    C = jnp.diag(q)
    c = p
    cfg_g = dataclasses.replace(cfg, backward_mode=BackwardMode.IFT)
    cfg_d = dataclasses.replace(
        cfg, backward_mode=BackwardMode.IFT, ift_solver="dense"
    )
    g_g = jax.grad(_loss_fn(cfg_g, dyn, x_init, wx, wu), argnums=(0, 1, 2))(
        params, C, c
    )
    g_d = jax.grad(_loss_fn(cfg_d, dyn, x_init, wx, wu), argnums=(0, 1, 2))(
        params, C, c
    )
    for a, b, n in zip(g_d, g_g, ["dtheta", "dC", "dc"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(b).max())
        assert np.abs(a - b).max() / scale <= 1e-4, n
