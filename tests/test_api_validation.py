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
