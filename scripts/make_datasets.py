"""Generate expert-demonstration datasets (the reference ships these as
data/pendulum.pkl and data/cartpole.pkl pickled IL_Env objects; here they
are .npz arrays produced by the same batched expert MPC).

    python scripts/make_datasets.py --env pendulum --out data/pendulum.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dilqr_tpu.il.env import ILEnv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="pendulum",
                    choices=["pendulum", "cartpole", "pendulum-complex"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--n_train", type=int, default=100)
    ap.add_argument("--n_val", type=int, default=50)
    ap.add_argument("--n_test", type=int, default=50)
    ap.add_argument("--mpc_T", type=int, default=20)
    ap.add_argument("--lqr_iter", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--receding", action="store_true",
                    help="per-step receding-horizon expert (populate_data2)")
    args = ap.parse_args()

    env = ILEnv(env=args.env, mpc_T=args.mpc_T, lqr_iter=args.lqr_iter)
    pop = env.populate_data2 if args.receding else env.populate_data
    pop(args.n_train, args.n_val, args.n_test, seed=args.seed)
    out = args.out or f"data/{args.env}.npz"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez_compressed(
        out, train=env.train_data, val=env.val_data, test=env.test_data,
        mpc_T=args.mpc_T, lqr_iter=args.lqr_iter, env=args.env,
    )
    print(f"wrote {out}: train {env.train_data.shape}, "
          f"val {env.val_data.shape}, test {env.test_data.shape}")


if __name__ == "__main__":
    main()
