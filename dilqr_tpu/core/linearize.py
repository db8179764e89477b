"""Dynamics linearization and cost quadraticization.

Replaces the reference's three linearization paths (mpc.py:489-601):

 * ANALYTIC / AUTO_DIFF: a single batched ``jax.jacfwd`` of the env step
   function over all (T-1)*B flattened points. On the reference side
   ANALYTIC dispatches to ~2300 lines of hand-transcribed symbolic Jacobians
   (env_dx/pendulum.py:127-515, cartpole.py:99-839, rocket.py:324-823);
   jacfwd of the same forward function is equally analytic, exact, and ~30
   lines. Envs may still provide a hand-written ``jacobian`` attribute
   (e.g. a Pallas kernel) which takes precedence.
 * FINITE_DIFF: central differences with eps=1e-4 (reference mpc.py:568-582,
   util.jacobian util.py:10-20).

Also implements approximate_cost (reference mpc.py:447-487): per-timestep
Hessian/gradient of a callable cost, with the gradient re-centered so that
``C tau + c`` reproduces it at the linearization point.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import GradMethod
from ..utils.batch import bmv


def _point_jacobian(step_fn, method: GradMethod, fd_eps: float):
    """Jacobian of x' = step(x, u, params) at a single point -> (R, S)."""
    if method in (GradMethod.ANALYTIC, GradMethod.AUTO_DIFF, GradMethod.ANALYTIC_CHECK):

        def jac(x, u, params):
            R = jax.jacfwd(step_fn, argnums=0)(x, u, params)
            S = jax.jacfwd(step_fn, argnums=1)(x, u, params)
            return R, S

        return jac

    if method is GradMethod.FINITE_DIFF:

        def jac(x, u, params):
            nx, nu = x.shape[0], u.shape[0]
            ex = jnp.eye(nx, dtype=x.dtype) * fd_eps
            eu = jnp.eye(nu, dtype=u.dtype) * fd_eps

            def dcol_x(e):
                return (step_fn(x + e, u, params) - step_fn(x - e, u, params)) / (
                    2.0 * fd_eps
                )

            def dcol_u(e):
                return (step_fn(x, u + e, params) - step_fn(x, u - e, params)) / (
                    2.0 * fd_eps
                )

            R = jax.vmap(dcol_x)(ex).T
            S = jax.vmap(dcol_u)(eu).T
            return R, S

        return jac

    raise ValueError(f"Unsupported grad method {method}")


def linearize_dynamics(
    step_fn: Callable,
    params,
    x: jax.Array,
    u: jax.Array,
    method: GradMethod = GradMethod.ANALYTIC,
    jacobian_fn: Optional[Callable] = None,
    fd_eps: float = 1e-4,
    linearize_fn: Optional[Callable] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Linearize around a trajectory.

    x: [T, B, nx]; u: [T, B, nu]. Returns F: [T-1, B, nx, nx+nu] and the
    affine residual f: [T-1, B, nx] with ``f = x' - R x - S u`` evaluated at
    the trajectory points (reference mpc.py:515-516).

    ``linearize_fn(x, u, params) -> x'`` optionally overrides the function
    being differentiated (e.g. the env's un-clamped dynamics, matching the
    reference's analytic Jacobians which differentiate the un-clamped
    physics, env_dx/pendulum.py:444-475) while ``step_fn`` still supplies
    the value of x' for the residual.
    """
    T, B, nx = x.shape
    nu = u.shape[-1]
    # NB vmap over (time, batch) as separate axes -- flattening them into
    # one (T-1)*B axis would merge the batch-sharded dim with time and
    # force XLA to all-gather per-example trajectories across devices
    # (caught by the multihost collectives audit)
    xf = x[: T - 1]
    uf = u[: T - 1]

    lin_f = linearize_fn if linearize_fn is not None else step_fn
    if jacobian_fn is not None and method in (
        GradMethod.ANALYTIC,
        GradMethod.ANALYTIC_CHECK,
    ):
        jac = jacobian_fn
    else:
        jac = _point_jacobian(lin_f, method, fd_eps)

    per_point = jax.vmap(jax.vmap(lambda xi, ui: jac(xi, ui, params)))
    R, S = per_point(xf, uf)

    if method is GradMethod.ANALYTIC_CHECK:
        # functional version of the reference's (stale, assert-False)
        # analytic-vs-numeric comparison (mpc.py:552-567): warn from the
        # host when the analytic Jacobian disagrees with central
        # differences beyond the reference's 1e-8 print threshold scaled
        # to the fd step.
        fd = _point_jacobian(lin_f, GradMethod.FINITE_DIFF, fd_eps)
        Rn, Sn = jax.vmap(jax.vmap(lambda xi, ui: fd(xi, ui, params)))(
            xf, uf
        )
        err = jnp.maximum(
            jnp.abs(R - Rn).max(), jnp.abs(S - Sn).max()
        )

        def _warn(e):
            if e > 1e-2 * fd_eps ** 0.5:
                import warnings

                warnings.warn(
                    f"ANALYTIC_CHECK: analytic vs finite-difference "
                    f"Jacobian max err {float(e):.3e}"
                )

        from ..utils.callbacks import supports_host_callback

        if supports_host_callback():
            jax.debug.callback(_warn, err)

    new_x = jax.vmap(jax.vmap(lambda xi, ui: step_fn(xi, ui, params)))(
        xf, uf
    )
    f = new_x - bmv(R, xf) - bmv(S, uf)

    F = jnp.concatenate([R, S], axis=-1)
    return F, f


def approximate_cost(
    cost_fn: Callable, x: jax.Array, u: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Quadraticize a callable cost around tau = (x, u).

    cost_fn(tau_vec) -> scalar. Returns (C [T,B,n,n], c [T,B,n],
    costs [T,B]) with c = grad - H tau so that the quadratic model matches
    value/gradient at tau (reference mpc.py:447-487).
    """
    tau = jnp.concatenate([x, u], axis=-1)

    def point(tv):
        H = jax.hessian(cost_fn)(tv)
        g = jax.grad(cost_fn)(tv)
        return H, g - H @ tv, cost_fn(tv)

    C, c, costs = jax.vmap(jax.vmap(point))(tau)
    return C, c, costs
