"""Closed-loop MPC against a plant the controller did NOT model.

This is the scenario the reference's gym demo exercises
(test_mpc.py:29,95-113: plan with the analytic pendulum model, step
`gym.make('Pendulum-v1')`): the true plant differs from the planning
model, and receding-horizon feedback absorbs the mismatch. Here the
plant is the 5-parameter "complex" pendulum (damping, gravity bias,
heavier and shorter arm -- reference pendulum.py:45) while the
controller plans with the nominal 3-parameter simple model; the whole
episode runs as ONE compiled lax.scan (control.receding_horizon), not
a host loop.

For contrast the script also executes the first solve's plan OPEN-LOOP
on the true plant: without replanning the mismatch accumulates and the
pendulum droops; with feedback it stabilizes upright.

Run: python examples/mismatch_loop.py [--steps 80] [--damping 0.4]
"""
import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import dilqr_tpu
from dilqr_tpu import ILQRConfig, QuadCost
from dilqr_tpu.control import receding_horizon
from dilqr_tpu.models import pendulum


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--T", type=int, default=16)
    ap.add_argument("--damping", type=float, default=0.4)
    ap.add_argument("--bias", type=float, default=0.05)
    ap.add_argument("--mass", type=float, default=1.25)
    ap.add_argument("--length", type=float, default=0.9)
    args = ap.parse_args()

    model = pendulum.make()                       # what the controller plans with
    model_params = pendulum.default_params()      # nominal (10, 1, 1)
    plant = pendulum.make(simple=False)           # what the world actually does
    plant_params = jnp.array(
        [10.0, args.mass, args.length, args.damping, args.bias], jnp.float32
    )

    q, p = pendulum.get_true_obj()
    B = 4
    rng = np.random.RandomState(0)
    th = -1.2 + 2.4 * rng.rand(B)
    x0 = jnp.stack(
        [jnp.cos(jnp.asarray(th, jnp.float32)),
         jnp.sin(jnp.asarray(th, jnp.float32)),
         jnp.zeros(B, jnp.float32)], 1
    )
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=args.T, lqr_iter=12, eps=1e-4,
        linesearch_decay=model.linesearch_decay,
        max_linesearch_iter=model.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )

    ep = jax.jit(
        lambda x: receding_horizon(
            cfg, model, model_params, QuadCost(jnp.diag(q), p), x,
            n_steps=args.steps, u_lower=model.lower, u_upper=model.upper,
            env_step=plant.step, env_params=plant_params,
        )
    )(x0)

    # open-loop contrast: first plan executed on the plant, no feedback
    res0 = dilqr_tpu.solve(
        cfg, x0, QuadCost(jnp.diag(q), p), model, params=model_params,
        u_lower=model.lower, u_upper=model.upper,
    )

    from dilqr_tpu.control import open_loop_rollout

    x_ol = open_loop_rollout(plant.step, plant_params, x0, res0.u)[:, 1:]

    n_ol = min(args.steps, cfg.T)
    final_cl = np.asarray(ep.xs[:, -1])
    at_T_cl = np.asarray(ep.xs[:, n_ol])
    at_T_ol = np.asarray(x_ol[:, n_ol - 1])
    print(f"plant mismatch: m={args.mass} l={args.length} "
          f"d={args.damping} b={args.bias} (model: m=1 l=1 d=0 b=0)")
    for i in range(B):
        print(
            f"  ep {i}: start th={th[i]:+.2f}  "
            f"closed-loop final cos={final_cl[i, 0]:+.3f} "
            f"dth={final_cl[i, 2]:+.2f}  |  at t={n_ol}: "
            f"closed cos={at_T_cl[i, 0]:+.3f} vs open {at_T_ol[i, 0]:+.3f}"
        )
    up = (final_cl[:, 0] > 0.9).all() and (np.abs(final_cl[:, 2]) < 1.5).all()
    print("closed-loop stabilized upright under mismatch:", bool(up))
    print(
        "mean |1-cos| at t=%d: closed-loop %.3f vs open-loop %.3f"
        % (
            n_ol,
            float(np.abs(1 - at_T_cl[:, 0]).mean()),
            float(np.abs(1 - at_T_ol[:, 0]).mean()),
        )
    )
    if not up:
        sys.exit(1)


if __name__ == "__main__":
    main()
