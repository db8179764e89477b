"""System identification through the differentiable MPC solver -- the
DiLQR paper's headline use case (reference il_exp.py --mode sysid/imempc
--learn_dx).

An expert controls the pendulum with the TRUE physics (g, m, l) =
(10, 1, 1); the learner starts from the reference's mis-specified init
(15, 3, 0.5) (il_exp.py:136-142) and recovers the true parameters by
differentiating the imitation loss THROUGH the iLQR fixed point
(BackwardMode.IFT).

    python examples/sysid_pendulum.py [--epochs 60] [--mode imempc|sysid]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dilqr_tpu.il.env import ILEnv
from dilqr_tpu.il.exp import ILExp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--mode", default="sysid", choices=["imempc", "sysid"])
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--work", default="/tmp/dilqr_sysid")
    args = ap.parse_args()

    env = ILEnv(env="pendulum", mpc_T=20, lqr_iter=10)
    print("generating expert demonstrations (batched true-physics MPC)...")
    env.populate_data(n_train=args.n_train, n_val=32, n_test=32, seed=0)

    exp = ILExp(
        env=env,
        mode=args.mode,
        learn_dx=True,
        n_batch=min(64, args.n_train),
        n_epoch=args.epochs,
        n_train=args.n_train,
        work=args.work,
    )
    true = np.asarray(env.true_params)
    start = np.asarray(exp.params["dx"])
    print(f"true params (g, m, l): {true}")
    print(f"init params           : {start}  "
          f"(reference's mis-specified init, il_exp.py:136-142)")

    t0 = time.time()
    best_val = exp.run(verbose=False)
    dt = time.time() - t0

    learned = np.asarray(exp.params["dx"])

    # the pendulum dynamics theta_dd = 1.5 g/l sin(theta) + 3 u/(m l^2)
    # only identify the combinations (g/l, m l^2); raw (g, m, l) lie on an
    # unidentifiable manifold, so convergence is judged on the combinations
    def combos(p):
        return np.array([p[0] / p[2], p[1] * p[2] ** 2])

    c_true, c0, c1 = combos(true), combos(start), combos(learned)
    print(f"\nlearned params        : {learned}")
    print(f"identifiable (g/l, m l^2): true {c_true}, init {c0}, "
          f"learned {c1}")
    e0 = np.abs(c0 - c_true) / c_true
    e1 = np.abs(c1 - c_true) / c_true
    print(f"rel err on identifiable combos: {e0} -> {e1}")
    print(f"best val imitation loss: {best_val:.5f}")
    print(f"{args.epochs} epochs in {dt:.1f}s "
          f"(CSV logs + best checkpoint in {exp.save})")
    assert e1.max() < 0.1, "sysid did not converge on identifiable combos"
    print("OK: physics recovered through the differentiable solver")


if __name__ == "__main__":
    main()
