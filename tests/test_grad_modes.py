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


def test_kkt_nonlinear_golden(golden):
    """Full nonlinear module-KKT gradient chain vs the reference:
    mpc.py AUTO_DIFF forward + lqr_step.py:311-407 backward through the
    diff=True linearization (mpc.py:308-319) to the pendulum's dynamics
    params, plus dC/dc/dx_init. f64, exact forward parity first, then
    gradients at <=2e-3 relative (the KKT dC/dc comparison inherits the
    active-set freeze's sensitivity to ulp-level boundary decisions)."""
    from dilqr_tpu.models import pendulum as penv

    g = golden("kkt_nonlinear_pendulum_f64")
    dyn = penv.make()
    T = g["u"].shape[0]
    F64 = jnp.float64
    cfg = ILQRConfig(
        n_state=3,
        n_ctrl=1,
        T=T,
        lqr_iter=12,
        eps=1e-5,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        detach_unconverged=False,
        exit_unconverged=False,
        backward_mode=BackwardMode.KKT,
        qp_solver="pnqp",
        # the reference's AUTO_DIFF diff=True linearization omits the
        # dF/dtheta chain (autograd.grad without create_graph,
        # mpc.py:538-549); reproduce that for gradient parity
        kkt_grad_through_F=False,
    )
    bm = lambda a: jnp.swapaxes(jnp.asarray(a, F64), 0, 1)
    gx, gu = bm(g["gx"]), bm(g["gu"])
    x_init = jnp.asarray(g["x_init"], F64)
    params0 = jnp.asarray(penv.default_params(), F64)

    def loss(params, C, c, xi):
        res = dilqr_tpu.solve(
            cfg, xi, QuadCost(C, c), dyn, params=params,
            u_lower=-2.0, u_upper=2.0,
        )
        return jnp.sum(res.x * gx) + jnp.sum(res.u * gu)

    (x, u), _ = jax.vjp(
        lambda p_: (lambda r: (r.x, r.u))(
            dilqr_tpu.solve(
                cfg, x_init, QuadCost(bm(g["C"]), bm(g["c"])), dyn,
                params=p_, u_lower=-2.0, u_upper=2.0,
            )
        ),
        params0,
    )
    # forward parity gate: gradients are only comparable at the same point
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(u), 0, 1), g["u"], atol=1e-8
    )

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        params0, bm(g["C"]), bm(g["c"]), x_init
    )
    refs = [
        g["dparams"],
        np.swapaxes(g["dC"], 0, 1),
        np.swapaxes(g["dc"], 0, 1),
        g["dx_init"],
    ]
    for a, b, n in zip(grads, refs, ["dparams", "dC", "dc", "dx_init"]):
        a, b = np.asarray(a), np.asarray(b)
        if n == "dC":
            a = 0.5 * (a + np.swapaxes(a, -1, -2))
            b = 0.5 * (b + np.swapaxes(b, -1, -2))
        scale = max(1.0, np.abs(b).max())
        err = np.abs(a - b).max() / scale
        assert err <= 2e-3, f"{n}: KKT vs reference rel err {err:.2e}"


def test_ift_underconverged_falls_back_to_dense():
    """A deliberately starved GMRES budget (restart=1, maxiter=1,
    tol=1e-10) cannot meet tolerance, so the residual check must route the
    adjoint solve to the dense probing fallback (cfg.ift_fallback) -- the
    gradients then equal ift_solver="dense" exactly. Guards VERDICT round-1
    weakness #3: silently under-converged IFT gradients."""
    dyn, params, x_init, q, p, wx, wu, cfg = _setup(T=6, B=2)
    C, c = jnp.diag(q), p
    base = dataclasses.replace(
        cfg,
        lqr_iter=2,  # under-converged forward: weak contraction
        backward_mode=BackwardMode.IFT,
        ift_tol=1e-10,
        ift_restart=1,
        ift_maxiter=1,
    )
    cfg_fb = dataclasses.replace(base, ift_fallback=True)
    cfg_dense = dataclasses.replace(base, ift_solver="dense")
    cfg_nofb = dataclasses.replace(base, ift_fallback=False)

    g_fb = jax.grad(_loss_fn(cfg_fb, dyn, x_init, wx, wu), argnums=(0, 1, 2))(
        params, C, c
    )
    g_d = jax.grad(
        _loss_fn(cfg_dense, dyn, x_init, wx, wu), argnums=(0, 1, 2)
    )(params, C, c)
    g_raw = jax.grad(
        _loss_fn(cfg_nofb, dyn, x_init, wx, wu), argnums=(0, 1, 2)
    )(params, C, c)

    for a, b, n in zip(g_fb, g_d, ["dtheta", "dC", "dc"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(b).max())
        assert np.abs(a - b).max() / scale <= 1e-6, (
            f"{n}: fallback did not reproduce the dense solve"
        )
    # sanity: the starved GMRES result alone is NOT the dense answer
    # (otherwise this test exercises nothing)
    diff = max(
        np.abs(np.asarray(a) - np.asarray(b)).max()
        for a, b in zip(g_raw, g_d)
    )
    assert diff > 1e-8, "starved GMRES unexpectedly converged; tighten setup"


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


def test_gmres_batched_per_example_residuals():
    """VERDICT r2 weak #2: one ill-conditioned example with a small
    cotangent hidden in a well-conditioned batch. The old single global
    residual norm passes silently (the big examples dominate ||b||); the
    per-example accounting must flag exactly that example -- and solve the
    easy one exactly."""
    from dilqr_tpu.ops.gmres import gmres, gmres_batched

    d, tol = 8, 1e-4
    # block-diagonal operator over B=2 "examples" at batch_axis=1
    A0 = jnp.diag(jnp.logspace(-3, 0, d).astype(jnp.float32))  # cond 1e3
    A1 = jnp.eye(d, dtype=jnp.float32)

    def matvec(x):
        (xb,) = x  # [1, B, d]
        return (jnp.stack([A0 @ xb[0, 0], A1 @ xb[0, 1]])[None],)

    b = (jnp.stack([
        jnp.full((d,), 1e-6, jnp.float32),   # tiny, hard block
        jnp.ones((d,), jnp.float32),         # O(1), trivial block
    ])[None],)

    # degree-3 Krylov polynomial cannot capture a 1e3 eigenvalue spread
    kw = dict(tol=tol, restart=3, maxiter=1)
    _, res_g, bn_g = gmres(matvec, b, x0=b, return_info=True, **kw)
    assert res_g <= tol * bn_g, (
        "setup error: the global criterion should pass silently here "
        f"(res {res_g:.3e} vs {tol * bn_g:.3e})"
    )

    x, res_b, bn_b = gmres_batched(matvec, b, x0=b, **kw)
    bad_b = np.asarray(res_b > tol * bn_b)
    assert bad_b[0], (
        f"ill-conditioned example not flagged: res {res_b[0]:.3e} vs "
        f"{tol * bn_b[0]:.3e}"
    )
    assert not bad_b[1], "well-conditioned example wrongly flagged"
    np.testing.assert_allclose(
        np.asarray(x[0][0, 1]), np.ones(d), rtol=1e-5
    )


def test_ift_per_example_dense_repair(monkeypatch):
    """The dense fallback must repair ONLY the examples whose per-example
    residual failed, keeping converged examples' Krylov solutions -- and a
    corrupted adjoint that is NOT reported bad must flow through only its
    own example (the whole backward chain is per-example independent).

    Sabotages example 1's adjoint solution inside solve_adjoint_fixed_point
    and flips its reported residual; dx_init is per-example, so the
    repaired/unrepaired gradients localize the effect."""
    from dilqr_tpu.diff import modes as M

    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    B, T = 3, 4
    rng = np.random.RandomState(0)
    th = rng.uniform(-1.2, 1.2, B)
    thdot = rng.uniform(-1, 1, B)
    x_init = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), thdot], 1), jnp.float32
    )
    wx = jnp.asarray(rng.randn(B, T, 3), jnp.float32)
    wu = jnp.asarray(rng.randn(B, T, 1), jnp.float32)
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, eps=1e-6, lqr_iter=6,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        detach_unconverged=False, exit_unconverged=False, backend="xla",
        backward_mode=BackwardMode.IFT, ift_restart=6, ift_maxiter=2,
        ift_fallback=True,
    )

    def loss(xi):
        r = dilqr_tpu.solve(
            cfg, xi, QuadCost(jnp.diag(q), p), dyn, params=params,
            u_lower=-2.0, u_upper=2.0,
        )
        return jnp.sum(r.u * wu) + jnp.sum(r.x * wx)

    g_ref = np.asarray(jax.grad(loss)(x_init))

    orig = M.solve_adjoint_fixed_point

    def sabotage(sT_Ff, lT_xu, v, **kw):
        w, res_b, b_b = orig(sT_Ff, lT_xu, v, **kw)
        wx_, wu_ = w
        wx_ = wx_.at[:, 1].add(100.0)
        wu_ = wu_.at[:, 1].add(-50.0)
        return (wx_, wu_), res_b.at[1].set(1e6), b_b

    monkeypatch.setattr(M, "solve_adjoint_fixed_point", sabotage)
    g_rep = np.asarray(jax.grad(loss)(x_init))
    err = np.abs(g_rep - g_ref).max(axis=1)
    scale = np.abs(g_ref).max()
    assert err[0] == 0.0 and err[2] == 0.0, (
        f"repair touched well-converged examples: {err}"
    )
    assert err[1] <= 1e-4 * scale, (
        f"flagged example not repaired to the dense solution: {err}"
    )

    def sabotage_unreported(sT_Ff, lT_xu, v, **kw):
        w, res_b, b_b = orig(sT_Ff, lT_xu, v, **kw)
        wx_, wu_ = w
        wx_ = wx_.at[:, 1].add(100.0)
        wu_ = wu_.at[:, 1].add(-50.0)
        return (wx_, wu_), res_b, b_b

    monkeypatch.setattr(M, "solve_adjoint_fixed_point", sabotage_unreported)
    g_bad = np.asarray(jax.grad(loss)(x_init))
    err2 = np.abs(g_bad - g_ref).max(axis=1)
    assert err2[1] > 1.0, "sabotage had no effect; test exercises nothing"
    assert err2[0] == 0.0 and err2[2] == 0.0, (
        f"example 1's corruption leaked into other examples: {err2}"
    )
