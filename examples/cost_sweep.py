"""Candidate cost-weight sweep with jax.vmap over the solver.

The controls-engineering workflow the reference supports only by
hand-batching (mpc.py solves one batch per call): try S candidate cost
weightings over the same initial states and pick the best closed-loop
candidate. Here it is literally `jax.vmap(solve)` -- the fused kernel's
custom_vmap rule folds the sweep into the lane batch, so the whole
S x B sweep is ONE kernel launch on TPU
(ops/pallas/ilqr_fused._maybe_vmap_route).

    python examples/cost_sweep.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dilqr_tpu import ILQRConfig, QuadCost
from dilqr_tpu.core.solver import solve
from dilqr_tpu.models import pendulum


def main():
    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    q = jnp.asarray(q, jnp.float32)
    p = jnp.asarray(p, jnp.float32)

    B = 64
    rng = np.random.RandomState(0)
    th = rng.uniform(-np.pi, np.pi, B).astype(np.float32)
    x_init = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)),
         jnp.zeros(B, jnp.float32)], 1
    )
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=20, lqr_iter=15, eps=1e-4,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )

    # candidate control-effort weights (the last diagonal entry of q)
    ctrl_weights = jnp.logspace(-3, 0, 8, dtype=jnp.float32)

    def solve_candidate(w):
        qw = q.at[-1].set(w)
        res = solve(cfg, x_init, QuadCost(jnp.diag(qw), p), dyn,
                    params=params, u_lower=dyn.lower, u_upper=dyn.upper)
        # judge candidates on the TRUE objective (fixed weights), not
        # their own: swing-up tracking error across the batch
        err = (res.x[:, :, 0] - 1.0) ** 2 + res.x[:, :, 1] ** 2
        return jnp.mean(err), jnp.mean(jnp.abs(res.u))

    track, effort = jax.jit(jax.vmap(solve_candidate))(ctrl_weights)
    best = int(jnp.argmin(track))
    for i, w in enumerate(np.asarray(ctrl_weights)):
        star = " <-- best tracking" if i == best else ""
        print(f"w_u={w:8.4f}  tracking={float(track[i]):.4f}  "
              f"mean|u|={float(effort[i]):.3f}{star}")


if __name__ == "__main__":
    main()
