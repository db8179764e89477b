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
    ap.add_argument("--gif", action="store_true",
                    help="animated 3-D landing (viz.rocket_animation)")
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

    # the WHOLE episode (solve -> apply first action -> shift warm start ->
    # repeat) is one compiled program -- measured 285x faster than the
    # reference-style host loop on this container's tunneled TPU
    from dilqr_tpu.control import receding_horizon

    episode = jax.jit(
        lambda x0: receding_horizon(
            cfg,
            dyn,
            params,
            QuadCost(jnp.diag(q), p),
            x0,
            n_steps=args.steps,
            u_lower=dyn.lower,
            u_upper=dyn.upper,
        )
    )
    ep = episode(x)  # compile
    jax.block_until_ready(ep.xs)
    t0 = time.time()
    ep = episode(x)
    jax.block_until_ready(ep.xs)
    dt = time.time() - t0

    for k in range(0, args.steps, 10):
        print(
            f"step {k:3d}: mean alt {float(ep.xs[:, k, 0].mean()):7.3f} m, "
            f"mean v_x {float(ep.xs[:, k, 3].mean()):7.3f} m/s, "
            f"mean plan cost {float(ep.costs[:, k].mean()):9.2f}"
        )
    alt = np.asarray(ep.xs[:, -1, 0])
    speed = np.linalg.norm(np.asarray(ep.xs[:, -1, 3:6]), axis=1)
    print(
        f"\n{args.steps} closed-loop steps x {B} rockets in {dt:.2f}s "
        f"({args.steps * B / dt:,.0f} plans/s)"
    )
    print(
        f"final: mean altitude {alt.mean():.3f} m (start 10), "
        f"mean speed {speed.mean():.3f} m/s, "
        f"{float((np.abs(alt) < 1.0).mean()) * 100:.0f}% within 1 m"
    )

    if args.plot:
        from dilqr_tpu import viz

        path = viz.rocket_trajectory(
            np.swapaxes(np.asarray(ep.xs), 0, 1),
            np.swapaxes(np.asarray(ep.us), 0, 1),
            path="rocket_landing.png",
        )
        print("wrote", path)

    if args.gif:
        from dilqr_tpu import viz

        path = viz.rocket_animation(
            np.swapaxes(np.asarray(ep.xs), 0, 1),
            np.swapaxes(np.asarray(ep.us), 0, 1),
            rocket_len=1.0,
            path="rocket_landing.gif",
        )
        print("wrote", path)


if __name__ == "__main__":
    main()
