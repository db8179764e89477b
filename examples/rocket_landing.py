"""Receding-horizon rocket soft landing.

Equivalent of the reference's rocket __main__ demo (env_dx/rocket.py:
1013-1155): 40 closed-loop steps, each solving a T-step box-constrained MPC
from the current state, applying the first thrust command, and shifting the
previous solution as the next warm start (rocket.py:1137). Batched: a whole
fleet of rockets lands in one program.

    python examples/rocket_landing.py [--batch 256] [--steps 40] [--plot]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dilqr_tpu import ILQRConfig, QuadCost, solve
from dilqr_tpu.models import rocket


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--lqr-iter", type=int, default=20)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    B, T = args.batch, args.horizon
    dyn = rocket.make()
    params = rocket.default_params()
    q, p = rocket.get_true_obj()
    cfg = ILQRConfig(
        n_state=13,
        n_ctrl=3,
        T=T,
        lqr_iter=args.lqr_iter,
        eps=dyn.mpc_eps,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False,
        detach_unconverged=False,
        backprop=False,
    )

    # initial conditions around the reference demo's start (rocket.py:1030):
    # 10 m up, descending, small attitude/rate perturbations
    rng = np.random.RandomState(0)
    r0 = np.array([10.0, 0.0, 0.0]) + np.array([1.0, 2.0, 2.0]) * rng.randn(B, 3)
    v0 = np.array([-2.0, 0.0, 0.0]) + 0.3 * rng.randn(B, 3)
    q0 = np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (B, 1))
    w0 = 0.05 * rng.randn(B, 3)
    x = jnp.asarray(np.concatenate([r0, v0, q0, w0], axis=1), jnp.float32)

    @jax.jit
    def plan(x, u_init):
        res = solve(
            cfg,
            x,
            QuadCost(jnp.diag(q), p),
            dyn,
            params=params,
            u_init=u_init,
            u_lower=dyn.lower,
            u_upper=dyn.upper,
        )
        # shift warm start: drop the applied action, repeat the last
        # (reference rocket.py:1137)
        u_shift = jnp.concatenate([res.u[:, 1:], res.u[:, -1:]], axis=1)
        return res.u[:, 0], u_shift, res.costs

    @jax.jit
    def env_step(x, a):
        return jax.vmap(lambda xi, ai: dyn.step(xi, ai, params))(x, a)

    u_ws = jnp.zeros((B, T, 3), jnp.float32)
    xs, us = [np.asarray(x)], []
    t0 = time.time()
    for k in range(args.steps):
        a, u_ws, costs = plan(x, u_ws)
        x = env_step(x, a)
        xs.append(np.asarray(x))
        us.append(np.asarray(a))
        if k % 10 == 0:
            alt = float(jnp.mean(x[:, 0]))
            vx = float(jnp.mean(x[:, 3]))
            print(
                f"step {k:3d}: mean alt {alt:7.3f} m, mean v_x {vx:7.3f} "
                f"m/s, mean plan cost {float(jnp.mean(costs)):9.2f}"
            )
    jax.block_until_ready(x)
    dt = time.time() - t0
    alt = np.asarray(x[:, 0])
    speed = np.linalg.norm(np.asarray(x[:, 3:6]), axis=1)
    print(
        f"\n{args.steps} closed-loop steps x {B} rockets in {dt:.2f}s "
        f"({args.steps * B / dt:,.0f} plans/s)"
    )
    print(
        f"final: mean altitude {alt.mean():.3f} m (start 10), "
        f"mean speed {speed.mean():.3f} m/s, "
        f"{float((alt < 1.0).mean()) * 100:.0f}% below 1 m"
    )

    if args.plot:
        from dilqr_tpu import viz

        path = viz.rocket_trajectory(
            np.stack(xs), np.stack(us), path="rocket_landing.png"
        )
        print("wrote", path)


if __name__ == "__main__":
    main()
