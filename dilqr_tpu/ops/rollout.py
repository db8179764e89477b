"""Forward rollout, objective evaluation, and the batched line search.

TPU-native re-implementation of the reference's util.get_traj/get_cost
(util.py:104-153) and lqr_forward (lqr_step.py:164-261). The per-timestep
Python loops become ``lax.scan``; the backtracking line search becomes a
``lax.while_loop`` carrying per-example step sizes ``alpha``:

 * trial rollout: u'_t = u_t + K_t (x'_t - x_t) + alpha k_t, optionally
   zero-masked (u_zero_I), trust-region'd (delta_u) and clamped to the box
   (reference lqr_step.py:192-213), stepping the TRUE nonlinear dynamics
   (lqr_step.py:217-228)
 * the loop repeats while ANY example's total cost worsened, decaying only
   the worsened examples' alpha (lqr_step.py:176-179, 247)
 * full_du_norm is recorded from the first (alpha=1) trial
   (lqr_step.py:243-245); over-shrunk alphas are un-decayed once at exit for
   reporting (lqr_step.py:250-252)

All tensors are time-major [T, B, ...] internally.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import LinDx, QuadCost
from ..utils.batch import bdot, bmv, bquad, clamp
from ..utils.loops import bounded_while


class LqrForOut(NamedTuple):
    objs: jax.Array  # [T, B]
    full_du_norm: jax.Array  # [B]
    alpha_du_norm: jax.Array  # [B]
    mean_alphas: jax.Array  # []
    costs: jax.Array  # [B]


def _lin_step(F_t, f_t, x, u):
    tau = jnp.concatenate([x, u], axis=-1)
    nxt = bmv(F_t, tau)
    if f_t is not None:
        nxt = nxt + f_t
    return nxt


def _env_step(dynamics, x, u):
    step_fn, params = dynamics
    return jax.vmap(lambda xi, ui: step_fn(xi, ui, params))(x, u)


def get_traj(T: int, u: jax.Array, x_init: jax.Array, dynamics) -> jax.Array:
    """Open-loop rollout (reference util.get_traj, util.py:104-127).
    u: [T, B, nu]; returns x: [T, B, nx]."""
    if isinstance(dynamics, LinDx):
        F, f = dynamics.F, dynamics.f
        fz = jnp.zeros(F.shape[:-1], F.dtype) if f is None else f

        def step(x, inp):
            F_t, f_t, u_t = inp
            return _lin_step(F_t, f_t if f is not None else None, x, u_t), x

        last, xs = lax.scan(step, x_init, (F, fz, u[: T - 1]))
    else:

        def step(x, u_t):
            return _env_step(dynamics, x, u_t), x

        last, xs = lax.scan(step, x_init, u[: T - 1])
    return jnp.concatenate([xs, last[None]], axis=0)


def get_cost(
    T: int,
    u: jax.Array,
    cost,
    dynamics=None,
    x_init: Optional[jax.Array] = None,
    x: Optional[jax.Array] = None,
) -> jax.Array:
    """Total per-example objective (reference util.get_cost, util.py:130-153)."""
    assert x is not None or x_init is not None
    if x is None:
        x = get_traj(T, u, x_init, dynamics)
    tau = jnp.concatenate([x, u], axis=-1)
    if isinstance(cost, QuadCost):
        objs = 0.5 * bquad(tau, cost.C) + bdot(tau, cost.c)
    else:
        objs = jax.vmap(jax.vmap(cost))(tau)
    return jnp.sum(objs, axis=0)


def lqr_forward(
    T: int,
    n_state: int,
    n_ctrl: int,
    x_init: jax.Array,
    cost,
    dynamics,
    x: jax.Array,
    u: jax.Array,
    K: jax.Array,
    k: jax.Array,
    u_lower=None,
    u_upper=None,
    u_zero_I: Optional[jax.Array] = None,
    delta_u=None,
    linesearch_decay: float = 0.2,
    max_linesearch_iter: int = 10,
    unroll: bool = False,
) -> Tuple[jax.Array, jax.Array, LqrForOut]:
    """Closed-loop rollout with batched backtracking line search.

    x, u: current iterate [T,B,...]; K,k: gains from lqr_backward (t
    ascending). Returns (new_x, new_u, LqrForOut). Reference
    lqr_step.py:164-261.
    """
    B = x_init.shape[0]
    dtype = x_init.dtype
    boxed = u_lower is not None
    lin = isinstance(dynamics, LinDx)

    old_cost = get_cost(T, u, cost, dynamics, x=x)

    if lin:
        F, f = dynamics.F, dynamics.f
        # pad with a zero slab so the scan can "step" at t = T-1
        # (the resulting state is discarded)
        F_pad = jnp.concatenate([F, jnp.zeros_like(F[:1])], 0)
        fz = jnp.zeros(F.shape[:-1], F.dtype) if f is None else f
        f_pad = jnp.concatenate([fz, jnp.zeros_like(fz[:1])], 0)

    uz = (
        u_zero_I
        if u_zero_I is not None
        else jnp.zeros((T, B, n_ctrl), dtype=bool)
    )

    def expand_bound(v):
        if jnp.ndim(v) == 0:
            return jnp.broadcast_to(jnp.asarray(v, dtype), (T, B, n_ctrl))
        return jnp.broadcast_to(v, (T, B, n_ctrl))

    if boxed:
        lb_all = expand_bound(u_lower)
        ub_all = expand_bound(u_upper)
    else:
        lb_all = ub_all = jnp.zeros((T, B, n_ctrl), dtype)

    if isinstance(cost, QuadCost):
        C_xs, c_xs = cost.C, cost.c
    else:
        # unused placeholders so the scan xs pytree has fixed structure
        C_xs = jnp.zeros((T, B, 1, 1), dtype)
        c_xs = jnp.zeros((T, B, 1), dtype)

    def trial(alphas):
        def step(new_xt, inp):
            Kt, kt, xt, ut, lb, ub, uzt, Ft, ft, Ct, ct = inp
            dxt = new_xt - xt
            new_ut = bmv(Kt, dxt) + ut + alphas[:, None] * kt
            # delta_u without bounds is unimplemented in the reference too
            # (lqr_step.py:195).
            new_ut = jnp.where(uzt, 0.0, new_ut)
            if boxed:
                if delta_u is not None:
                    # trust region around the current iterate
                    # (reference lqr_step.py:204-213)
                    lb_t = jnp.maximum(ut - delta_u, lb)
                    ub_t = jnp.minimum(ut + delta_u, ub)
                else:
                    lb_t, ub_t = lb, ub
                new_ut = clamp(new_ut, lb_t, ub_t)
            tau = jnp.concatenate([new_xt, new_ut], axis=-1)
            if isinstance(cost, QuadCost):
                obj = 0.5 * bquad(tau, Ct) + bdot(tau, ct)
            else:
                obj = jax.vmap(cost)(tau)
            if lin:
                nxt = _lin_step(Ft, ft if f is not None else None, new_xt, new_ut)
            else:
                nxt = _env_step(dynamics, new_xt, new_ut)
            return nxt, (new_xt, new_ut, obj)

        if lin:
            F_xs, f_xs = F_pad, f_pad
        else:
            F_xs = jnp.zeros((T, B, 1, 1), dtype)
            f_xs = jnp.zeros((T, B, 1), dtype)
        xs = (K, k, x, u, lb_all, ub_all, uz, F_xs, f_xs, C_xs, c_xs)
        _, (new_x, new_u, objs) = lax.scan(step, x_init, xs)
        return new_x, new_u, objs, jnp.sum(objs, axis=0)

    # first trial at alpha = 1
    alphas = jnp.ones(B, dtype=dtype)
    new_x, new_u, objs, current_cost = trial(alphas)
    full_du_norm = jnp.linalg.norm(
        (u - new_u).transpose(1, 0, 2).reshape(B, -1), axis=-1
    )
    alphas = jnp.where(current_cost > old_cost, alphas * linesearch_decay, alphas)

    def cond(carry):
        _, _, _, _, cc, i = carry
        return jnp.any(cc > old_cost) & (i < max_linesearch_iter)

    def body(carry):
        a, _, _, _, _, i = carry
        nx_, nu_, ob_, cc = trial(a)
        a = jnp.where(cc > old_cost, a * linesearch_decay, a)
        return a, nx_, nu_, ob_, cc, i + 1

    alphas, new_x, new_u, objs, current_cost, _ = bounded_while(
        cond,
        body,
        (alphas, new_x, new_u, objs, current_cost, jnp.int32(1)),
        max_steps=max_linesearch_iter - 1,
        unroll=unroll,
    )

    # un-decay over-shrunk alphas for the mean_alphas diagnostic
    # (reference lqr_step.py:250-252)
    alphas_rep = jnp.where(
        current_cost > old_cost, alphas / linesearch_decay, alphas
    )
    alpha_du_norm = jnp.linalg.norm(
        (u - new_u).transpose(1, 0, 2).reshape(B, -1), axis=-1
    )
    return (
        new_x,
        new_u,
        LqrForOut(
            objs, full_du_norm, alpha_du_norm, jnp.mean(alphas_rep), current_cost
        ),
    )
