"""Closed-loop receding-horizon pendulum control.

Equivalent of the reference's gym demo (test_mpc.py:29-113): plan with MPC,
apply the first action, step the plant, re-plan with the shifted previous
solution as warm start (the rocket `__main__` pattern, rocket.py:1137).
The plant here is the env's own dynamics (gym isn't in this image, and the
reference's demo is a manual script anyway, SURVEY.md section 4).

Run: python examples/closed_loop.py [--mode swingup|spin] [--steps 100]
"""
import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import dilqr_tpu
from dilqr_tpu import ILQRConfig, QuadCost
from dilqr_tpu.models import pendulum


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="swingup", choices=["swingup", "spin"])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--T", type=int, default=20)
    args = ap.parse_args()

    dyn = pendulum.make()
    params = pendulum.default_params()
    T = args.T

    # cost presets (reference test_mpc.py:50-72)
    if args.mode == "swingup":
        goal_weights = jnp.array([1.0, 1.0, 0.1])
        goal_state = jnp.array([1.0, 0.0, 0.0])
        ctrl_penalty = 0.001
    else:  # spin
        goal_weights = jnp.array([0.1, 0.1, 1.0])
        goal_state = jnp.array([1.0, 0.0, 8.0])
        ctrl_penalty = 0.001
    q = jnp.concatenate([goal_weights, ctrl_penalty * jnp.ones(1)])
    px = -jnp.sqrt(goal_weights) * goal_state
    p = jnp.concatenate([px, jnp.zeros(1)])

    cfg = ILQRConfig(
        n_state=3,
        n_ctrl=1,
        T=T,
        lqr_iter=50,
        eps=1e-3,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False,
        backprop=False,
    )

    @jax.jit
    def plan(x, u_init):
        res = dilqr_tpu.solve(
            cfg,
            x,
            QuadCost(jnp.diag(q), p),
            dyn,
            params=params,
            u_init=u_init,
            u_lower=-2.0,
            u_upper=2.0,
        )
        return res.u, res.costs

    # plant state: near hanging down (exactly down is a symmetric stationary
    # point of the solver -- zero feedforward torque in both directions)
    th0 = jnp.pi - 0.1
    x = jnp.array([[jnp.cos(th0), jnp.sin(th0), 0.0]])
    u_init = None
    for t in range(args.steps):
        u_plan, costs = plan(x, u_init)
        a = u_plan[:, 0]  # [B=1, n_ctrl]
        x = jax.vmap(lambda xi, ui: dyn.step(xi, ui, params))(x, a)
        # shift the solution as the next warm start
        u_init = jnp.concatenate([u_plan[:, 1:], u_plan[:, -1:]], axis=1)
        th = float(jnp.arctan2(x[0, 1], x[0, 0]))
        if t % 10 == 0 or t == args.steps - 1:
            print(
                f"t={t:3d} u={float(a[0, 0]):+.3f} theta={th:+.3f} "
                f"dtheta={float(x[0,2]):+.3f} plan_cost={float(costs[0]):.3f}"
            )
    up = abs(th) < 0.15 and abs(float(x[0, 2])) < 0.5
    print("upright:", up)
    return 0 if (args.mode == "spin" or up) else 1


if __name__ == "__main__":
    raise SystemExit(main())
