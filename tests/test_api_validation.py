"""Public-API validation paths: shape/bound errors raise clearly (the
reference uses bare asserts, mpc.py:147-156)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dilqr_tpu import ILQRConfig, MPC, QuadCost, solve
from dilqr_tpu.models import pendulum


def _cfg(**kw):
    base = dict(n_state=3, n_ctrl=1, T=4, lqr_iter=2, eps=1e-4,
                exit_unconverged=False, detach_unconverged=False,
                backprop=False)
    base.update(kw)
    return ILQRConfig(**base)


def test_bad_x_init_shape_raises():
    dyn = pendulum.make()
    q, p = pendulum.get_true_obj()
    with pytest.raises(ValueError, match="x_init"):
        solve(_cfg(), jnp.zeros((2, 5)), QuadCost(jnp.diag(q), p), dyn,
              params=pendulum.default_params())


def test_one_sided_bounds_raise():
    dyn = pendulum.make()
    q, p = pendulum.get_true_obj()
    with pytest.raises(ValueError, match="u_lower and u_upper"):
        solve(_cfg(), jnp.zeros((2, 3)), QuadCost(jnp.diag(q), p), dyn,
              params=pendulum.default_params(), u_lower=-2.0)


def test_mpc_wrapper_asserts_bounds():
    with pytest.raises(AssertionError):
        MPC(3, 1, 4, u_lower=-2.0)  # reference asserts too (mpc.py:147)


def test_unroll_mode_requires_unroll_flag():
    from dilqr_tpu import BackwardMode

    dyn = pendulum.make()
    q, p = pendulum.get_true_obj()
    cfg = _cfg(backward_mode=BackwardMode.UNROLL, backprop=True)
    with pytest.raises(ValueError, match="UNROLL"):
        solve(cfg, jnp.zeros((2, 3)), QuadCost(jnp.diag(q), p), dyn,
              params=pendulum.default_params())


def test_back_eps_rejected_outside_ift():
    """back_eps names the iterative backward-solve tolerance (reference
    lqr_step.py:330-338); the KKT/UNROLL backwards are exact direct solves,
    so accepting-and-ignoring it (the round-3 behavior) hid a real knob
    from reference ports. It must error, not no-op."""
    with pytest.raises(ValueError, match="back_eps"):
        _cfg(back_eps=1e-3)  # default backward_mode is KKT
    with pytest.raises(ValueError, match="back_eps"):
        MPC(3, 1, 4, back_eps=1e-3)


def test_back_eps_sets_ift_backward_tol():
    """Under BackwardMode.IFT, back_eps IS the GMRES adjoint tolerance
    unless ift_tol overrides it."""
    from dilqr_tpu import BackwardMode

    cfg = _cfg(backward_mode=BackwardMode.IFT, back_eps=1e-9)
    assert cfg.backward_tol == 1e-9
    cfg2 = _cfg(backward_mode=BackwardMode.IFT, back_eps=1e-9, ift_tol=1e-3)
    assert cfg2.backward_tol == 1e-3
    assert _cfg(backward_mode=BackwardMode.IFT).backward_tol == 1e-4


def test_back_eps_plumbed_into_ift_gradient():
    """End-to-end: gradients computed with back_eps=t equal gradients
    computed with ift_tol=t (same GMRES stopping), and both run green."""
    import jax

    from dilqr_tpu import BackwardMode

    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    x0 = jnp.stack([jnp.cos(jnp.asarray([0.5, -0.8])),
                    jnp.sin(jnp.asarray([0.5, -0.8])),
                    jnp.zeros(2)], 1)

    def loss(cfg, th):
        r = solve(cfg, x0, QuadCost(jnp.diag(q), p), dyn, params=th,
                  u_lower=-2.0, u_upper=2.0)
        return jnp.mean(r.u ** 2)

    # small GMRES budget + no dense-fallback branch: this test checks
    # PLUMBING equality (same tol -> same program), not accuracy, and the
    # fallback's lax.cond would compile the whole dense probing solve too
    kw = dict(backward_mode=BackwardMode.IFT, eps=1e-6, lqr_iter=6,
              backprop=True, backend="xla", ift_restart=2, ift_maxiter=1,
              ift_fallback=False)
    g_a = jax.grad(lambda t: loss(_cfg(back_eps=1e-8, **kw), t))(params)
    g_b = jax.grad(lambda t: loss(_cfg(ift_tol=1e-8, **kw), t))(params)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b), rtol=1e-12)


def test_n_batch_validates_batch_size():
    """Reference n_batch pins the batch when shapes can't infer it
    (mpc.py:102,193-196); here it validates x_init's leading axis."""
    dyn = pendulum.make()
    q, p = pendulum.get_true_obj()
    ctrl = MPC(3, 1, 4, lqr_iter=2, eps=1e-4, exit_unconverged=False,
               detach_unconverged=False, backprop=False, n_batch=3)
    with pytest.raises(ValueError, match="n_batch"):
        ctrl(jnp.zeros((2, 3)), QuadCost(jnp.diag(q), p), dyn,
             params=pendulum.default_params())
    x, u, costs = ctrl(jnp.zeros((3, 3)), QuadCost(jnp.diag(q), p), dyn,
                       params=pendulum.default_params())
    assert costs.shape == (3,)


def test_delta_u_requires_bounds():
    """The reference asserts this combination unsupported
    (lqr_step.py:195); rejecting it keeps the XLA and fused backends from
    silently diverging (the XLA rollout would ignore the trust region
    while the kernel would apply it)."""
    dyn = pendulum.make()
    q, p = pendulum.get_true_obj()
    with pytest.raises(ValueError, match="delta_u requires"):
        solve(_cfg(), jnp.zeros((2, 3)), QuadCost(jnp.diag(q), p), dyn,
              params=pendulum.default_params(), delta_u=0.3)


def test_eager_cpu_arrays_dispatch_xla_under_tpu_default(monkeypatch):
    """The container's TPU plugin keeps jax.default_backend() == "tpu"
    even for CPU-mesh programs; an eager solve on CPU-committed arrays
    must key on the arrays' committed platform (core/ilqr._target_platform)
    and take the XLA loop instead of compiling a Pallas kernel for CPU."""
    import importlib

    import dilqr_tpu.core.ilqr as ilqr_mod
    import dilqr_tpu.ops.pallas as pmod

    # the package __init__ rebinds the name `ilqr_fused` to the FUNCTION,
    # so `import ... as` would alias that; fetch the submodule explicitly
    fmod = importlib.import_module("dilqr_tpu.ops.pallas.ilqr_fused")

    monkeypatch.setattr(ilqr_mod.jax, "default_backend", lambda: "tpu")
    # the fused megakernel and the fused Riccati both lack a compiled CPU
    # lowering; if either is invoked non-interpreted this test must fail
    # loudly rather than depend on the lowering error's wording
    fs_results = []
    real_fs = fmod.fused_supported

    def spy_fs(*a, **k):
        r = real_fs(*a, **k)
        fs_results.append(r)
        return r

    def boom(*a, **k):
        raise AssertionError("compiled Pallas kernel dispatched for CPU")

    monkeypatch.setattr(fmod, "fused_supported", spy_fs)
    monkeypatch.setattr(fmod, "ilqr_fused", boom)
    real_rb = pmod.lqr_backward_pallas  # riccati.py binds via the package
    monkeypatch.setattr(
        pmod, "lqr_backward_pallas",
        lambda *a, interpret=False, **k: boom() if not interpret
        else real_rb(*a, interpret=True, **k))
    dyn = pendulum.make()
    q, p = pendulum.get_true_obj()
    # fully float32: under the suite's jax_enable_x64, a single f64 leaf
    # (e.g. jnp.zeros(4)) promotes x0 and makes fused_supported False for
    # the wrong reason, passing vacuously on pre-fix code (ADVICE r4)
    th = jnp.asarray(np.linspace(-1.0, 1.0, 4, dtype=np.float32))
    x0 = jnp.stack([jnp.cos(th), jnp.sin(th),
                    jnp.zeros(4, jnp.float32)], axis=1)
    assert x0.dtype == jnp.float32
    r = solve(_cfg(lqr_iter=4), x0,
              QuadCost(jnp.diag(q).astype(jnp.float32),
                       p.astype(jnp.float32)),
              dyn, params=pendulum.default_params().astype(jnp.float32),
              u_lower=-2.0, u_upper=2.0)
    # non-vacuous: the fused path was genuinely on the table (the ONLY
    # reason it was skipped is the committed-CPU-platform dispatch)
    assert fs_results and any(fs_results), (
        "test setup no longer reaches a fused_supported=True config")
    assert np.isfinite(np.asarray(r.costs)).all()
