"""Scratch on-chip probe: time the fused cartpole solve at B=4096/16384.

Used to bisect kernel-time shares (edit the kernel, re-run, compare).
Not part of the suite.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dilqr_tpu import ILQRConfig, QuadCost, solve
from dilqr_tpu.models import cartpole

T, LQR_ITER = 20, 20
LS1 = bool(os.environ.get("DILQR_PROBE_LS1"))  # single line-search trial


def make_run(B):
    dyn = cartpole.make()
    params = cartpole.default_params()
    q, p = cartpole.get_true_obj()
    cfg = ILQRConfig(
        n_state=5, n_ctrl=1, T=T, lqr_iter=LQR_ITER,
        eps=dyn.mpc_eps, linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=1 if LS1 else dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    rng = np.random.RandomState(0)
    th = jnp.asarray(np.pi / 1.05 + 0.1 * rng.randn(B), jnp.float32)
    x_init = jnp.stack(
        [jnp.zeros(B), jnp.zeros(B), jnp.cos(th), jnp.sin(th), jnp.zeros(B)],
        axis=1)

    @jax.jit
    def run(x_init):
        res = solve(cfg, x_init, QuadCost(jnp.diag(q), p), dyn,
                    params=params, u_lower=dyn.lower, u_upper=dyn.upper)
        return res.u, res.costs, res.n_iter

    return run, x_init


def pipelined_ms(f, x, n=20, rounds=3):
    out = f(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [f(x) for _ in range(n)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    print("backend:", jax.default_backend())
    for B in (4096, 16384):
        run, x = make_run(B)
        ms = pipelined_ms(run, x)
        cost = float(run(x)[1].sum())
        print(f"B={B}: {ms:.3f} ms/call  {B/ms*1e3:,.0f} solves/s  "
              f"cost_sum={cost:.6g}")


if __name__ == "__main__":
    main()
