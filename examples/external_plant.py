"""Closed-loop MPC against an OPAQUE external plant (the gym pattern).

The reference's demo drives `gym.make('Pendulum-v1')` through a host
loop: plan, apply the first action to the external simulator, refresh
the state from its observation, re-plan (test_mpc.py:29, 95-113). The
plant there is a third-party black box -- not differentiable, not
JAX-traceable, possibly not even Python-vectorized.

dilqr_tpu's native pattern for closed loops is control.receding_horizon
(the WHOLE episode compiled as one lax.scan -- use it whenever the plant
is a step function you can trace). This example is the adapter for when
you CANNOT: an `ExternalPlantLoop` that jits ONE plan per episode step
and talks to the opaque plant on the host.

What the adapter does, and what it costs:
  * one jitted `plan(x, u_warm) -> (u_seq, first_action)` compiled ONCE
    (static shapes; re-used every step) -- the solve itself stays on the
    accelerator at full fused-kernel speed;
  * warm-start shifting between steps (drop the applied action, repeat
    the last -- reference rocket.py:1137) so subsequent solves converge
    in a couple of iLQR iterations;
  * per-step host<->device transfers of x [B,nx] and u [B,T,nu]. On a
    tunneled TPU each dispatch pays the ~20 ms round trip, which DWARFS
    the ~2 ms solve -- that cost is the plant's interface, not the
    solver's. Measured here and printed at the end (compare
    examples/closed_loop.py, which runs the same episode as one
    dispatch when the plant is traceable).

The opaque plant below is a numpy re-implementation of gym's
Pendulum-v1 physics (angle-wrapped, velocity-clipped -- dynamics the
planning model does NOT match exactly), driven only through
reset()/step() like any third-party simulator.

Run: python examples/external_plant.py [--steps 60] [--batch 8]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


class OpaquePendulum:
    """Stands in for `gym.make('Pendulum-v1')`: numpy-only, stateful,
    reset/step interface, observation = (cos th, sin th, th_dot).
    Physics follow gym's pendulum.py (g=10, m=1, l=1, dt=0.05,
    torque clip +-2, speed clip +-8) -- note the SPEED CLIP makes it
    deliberately different from the planning model."""

    def __init__(self, batch, seed=0):
        self.rng = np.random.RandomState(seed)
        self.batch = batch

    def reset(self):
        th = self.rng.uniform(-np.pi, np.pi, self.batch)
        thdot = self.rng.uniform(-1.0, 1.0, self.batch)
        self.state = np.stack([th, thdot], 1)
        return self._obs()

    def _obs(self):
        th, thdot = self.state[:, 0], self.state[:, 1]
        return np.stack([np.cos(th), np.sin(th), thdot], 1)

    def step(self, u):
        th, thdot = self.state[:, 0], self.state[:, 1]
        u = np.clip(np.asarray(u)[:, 0], -2.0, 2.0)
        # gym convention: th = 0 upright, gravity term 3g/(2l) sin(th)
        newthdot = thdot + (3.0 * 10.0 / 2.0 * np.sin(th) + 3.0 * u) * 0.05
        newthdot = np.clip(newthdot, -8.0, 8.0)  # gym's speed limit
        newth = th + newthdot * 0.05
        self.state = np.stack([newth, newthdot], 1)
        cost = (((th + np.pi) % (2 * np.pi) - np.pi) ** 2
                + 0.1 * thdot ** 2 + 0.001 * u ** 2)
        return self._obs(), cost


class ExternalPlantLoop:
    """Host-loop MPC adapter for an opaque plant: one jitted plan per
    step, previous solution shifted as warm start."""

    def __init__(self, cfg, dyn, params, cost, u_lower, u_upper):
        import jax
        import jax.numpy as jnp

        from dilqr_tpu import solve

        def plan(x_obs, u_warm):
            res = solve(cfg, x_obs, cost, dyn, params=params,
                        u_init=u_warm, u_lower=u_lower, u_upper=u_upper)
            # shift: drop the applied action, repeat the last
            u_next = jnp.concatenate([res.u[:, 1:], res.u[:, -1:]], axis=1)
            return res.u[:, 0], u_next, res.n_iter

        self._plan = jax.jit(plan)
        self._jnp = jnp
        self._T = cfg.T
        self._nu = cfg.n_ctrl

    def run(self, plant, n_steps):
        import jax

        obs = plant.reset()
        B = obs.shape[0]
        u_warm = self._jnp.zeros((B, self._T, self._nu), self._jnp.float32)
        total = np.zeros(B)
        iters = []
        t0 = time.time()
        for _ in range(n_steps):
            a, u_warm, n_it = self._plan(
                self._jnp.asarray(obs, self._jnp.float32), u_warm)
            a, n_it = jax.device_get((a, n_it))  # host boundary
            obs, cost = plant.step(a)
            total += cost
            iters.append(int(n_it))
        return total, (time.time() - t0) / n_steps, iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax.numpy as jnp

    from dilqr_tpu import ILQRConfig, QuadCost
    from dilqr_tpu.models import pendulum

    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    T = 20
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=10, eps=1e-3,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    loop = ExternalPlantLoop(cfg, dyn, params,
                             QuadCost(jnp.diag(q), p), -2.0, 2.0)

    plant = OpaquePendulum(args.batch)
    total, s_per_step, iters = loop.run(plant, args.steps)

    # open-loop baseline: zero torque from the same inits
    plant2 = OpaquePendulum(args.batch)
    plant2.reset()
    open_total = np.zeros(args.batch)
    for _ in range(args.steps):
        _, c = plant2.step(np.zeros((args.batch, 1)))
        open_total += c

    print(f"closed-loop mean episode cost: {total.mean():8.2f}")
    print(f"open-loop  mean episode cost: {open_total.mean():8.2f}")
    print(f"per-step wall (plan + host round-trip): {s_per_step*1e3:.1f} ms"
          f"  (mean lqr iters after warm start: {np.mean(iters[2:]):.1f})")
    assert total.mean() < 0.6 * open_total.mean(), (
        "MPC against the opaque plant should beat zero-torque open loop")
    print("OK")


if __name__ == "__main__":
    main()
