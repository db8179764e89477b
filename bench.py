"""Headline benchmark: batched iLQR solves/s/chip, cartpole H=20 B=4096
(BASELINE.json metric). Prints ONE JSON line.

Baseline: the PyTorch reference measured 108 solves/s at B=64, T=20,
lqr_iter=20, box-constrained ANALYTIC on this container's CPU
(BASELINE.md); vs_baseline is the throughput ratio against that number.
"""
import json
import time

import jax
import jax.numpy as jnp

REF_SOLVES_PER_S = 108.0  # BASELINE.md: cartpole B=64 T=20 lqr_iter=20, CPU
B = 4096
T = 20
LQR_ITER = 20


def main():
    from dilqr_tpu import ILQRConfig, QuadCost, solve
    from dilqr_tpu.models import cartpole

    dyn = cartpole.make()
    params = cartpole.default_params()
    q, p = cartpole.get_true_obj()
    cfg = ILQRConfig(
        n_state=5,
        n_ctrl=1,
        T=T,
        lqr_iter=LQR_ITER,
        eps=dyn.mpc_eps,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False,
        detach_unconverged=False,
        backprop=False,
    )

    import numpy as np

    rng = np.random.RandomState(0)
    th = jnp.asarray(np.pi / 1.05 + 0.1 * rng.randn(B), jnp.float32)
    x_init = jnp.stack(
        [jnp.zeros(B), jnp.zeros(B), jnp.cos(th), jnp.sin(th), jnp.zeros(B)],
        axis=1,
    )

    @jax.jit
    def run(x_init):
        res = solve(
            cfg,
            x_init,
            QuadCost(jnp.diag(q), p),
            dyn,
            params=params,
            u_lower=dyn.lower,
            u_upper=dyn.upper,
        )
        return res.u, res.costs, res.n_iter

    # warmup/compile
    out = run(x_init)
    jax.block_until_ready(out)

    # steady-state pipelined throughput: submit n_rep batches back-to-back
    # and sync once -- measures chip throughput, not the host<->device
    # round-trip latency of this container's tunneled TPU (which a real
    # training/serving loop never pays per step). Best of 3 rounds to
    # damp scheduler/thermal noise.
    n_rep = 20
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run(x_init) for _ in range(n_rep)]
        jax.block_until_ready(outs)
        best_dt = min(best_dt, (time.perf_counter() - t0) / n_rep)
    solves_per_s = B / best_dt

    print(
        json.dumps(
            {
                "metric": "ilqr_solves_per_s_per_chip_cartpole_H20_B4096",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / REF_SOLVES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
