"""Closed-loop receding-horizon control as one compiled program.

The reference runs receding-horizon MPC as a host Python loop -- solve,
apply the first action, re-solve (test_mpc.py:95-113, rocket.py:1120-1140;
warm-start shifting at rocket.py:1137). On a tunneled TPU each host
round-trip costs ~tens of ms, dwarfing the solve itself. Here the WHOLE
episode is one ``lax.scan`` over environment steps with the solver (and its
fused kernel) inside, so an N-step closed-loop rollout of a whole fleet is
a single dispatch.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .core.solver import solve
from .models.base import Dynamics
from .types import ILQRConfig, QuadCost


class EpisodeResult(NamedTuple):
    xs: jax.Array     # [B, n_steps+1, nx] closed-loop states
    us: jax.Array     # [B, n_steps, nu] applied actions
    costs: jax.Array  # [B, n_steps] per-step planning objective


def receding_horizon(
    cfg: ILQRConfig,
    dyn: Dynamics,
    params,
    cost: QuadCost,
    x_init: jax.Array,     # [B, nx]
    n_steps: int,
    u_lower=None,
    u_upper=None,
    env_step=None,         # optional true plant: (x[nx], u[nu], params) -> x'
    env_params=None,
) -> EpisodeResult:
    """Run ``n_steps`` of closed-loop MPC, warm-starting each solve with the
    previous plan shifted by one (reference rocket.py:1137: drop the applied
    action, repeat the last).

    ``env_step`` defaults to the model dynamics (perfect-model control); pass
    the true plant for model-mismatch experiments (e.g. learned ``dyn``
    against the real env, il_exp-style evaluation).
    """
    B = x_init.shape[0]
    T, nu = cfg.T, cfg.n_ctrl
    plant = env_step if env_step is not None else dyn.step
    plant_params = env_params if env_params is not None else params

    def step(carry, _):
        x, u_ws, prev_a = carry
        res = solve(
            cfg,
            x,
            cost,
            dyn,
            params=params,
            u_init=u_ws,
            u_lower=u_lower,
            u_upper=u_upper,
            # the previously applied action anchors the slew-rate penalty's
            # t=0 term (reference mpc.py:101, prev_ctrl); inert otherwise
            prev_ctrl=prev_a,
        )
        a = res.u[:, 0]
        u_next = jnp.concatenate([res.u[:, 1:], res.u[:, -1:]], axis=1)
        x_next = jax.vmap(lambda xi, ai: plant(xi, ai, plant_params))(x, a)
        return (x_next, u_next, a), (x, a, res.costs)

    u_ws0 = jnp.zeros((B, T, nu), x_init.dtype)
    a0 = jnp.zeros((B, nu), x_init.dtype)
    (x_last, _, _), (xs, us, costs) = lax.scan(
        step, (x_init, u_ws0, a0), None, length=n_steps
    )
    xs = jnp.concatenate([xs, x_last[None]], axis=0)
    return EpisodeResult(
        xs=jnp.swapaxes(xs, 0, 1),
        us=jnp.swapaxes(us, 0, 1),
        costs=jnp.swapaxes(costs, 0, 1),
    )


def open_loop_rollout(step_fn, params, x_init, us):
    """Execute a FIXED control plan on a plant with no feedback: the
    baseline a receding-horizon controller is compared against in
    model-mismatch experiments (the reference demo's contrast case,
    test_mpc.py:95-113). ``step_fn(x[nx], u[nu], params) -> x'``;
    ``x_init`` [B, nx]; ``us`` [B, K, nu]. Returns the visited states
    [B, K+1, nx] including the start."""

    def roll(x0, u_seq):
        def f(x, u):
            xn = step_fn(x, u, params)
            return xn, xn

        _, xs = lax.scan(f, x0, u_seq)
        return jnp.concatenate([x0[None], xs], axis=0)

    return jax.vmap(roll)(x_init, us)
