"""Imitation-learning / system-identification training harness.

TPU-native re-implementation of IL_Exp (il_exp.py:39-504):

 * modes: 'nn' (LSTM behavioral cloning, il_exp.py:97-120, 168-181 --
   including the reference's decode-from-cell-state quirk at il_exp.py:176),
   'empc' / 'imempc' (imitation through differentiable MPC), 'sysid'
   (next-state prediction loss, il_exp.py:348-357)
 * learnable cost: q = sigmoid(q_logit), p = sqrt(q) * p_hat
   (il_exp.py:330-334), with round-robin q/p updates every 10 epochs
   (il_exp.py:290-295, 375-381)
 * learnable dynamics params with the reference's mis-specified inits
   (pendulum (15, 3, 0.5); cartpole (9.8, 3, 0.1, 1), il_exp.py:136-149)
 * optax RMSprop(lr=1e-2, decay=0.5) / Adam(1e-4) (il_exp.py:222-262)
 * per-example persistent warm-start store, reset every 50 epochs
   (il_exp.py:86, 268-275, 297-301, 336-344)
 * CSV logging (train_losses.csv, val_test_losses.csv, dx_hist.csv,
   cost_hist.csv, il_exp.py:186-219) and best-validation checkpointing
   (il_exp.py:424-429) via utils.checkpoint.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import pendulum as pendulum_mod
from ..utils import checkpoint as ckpt
from .env import ILEnv
from .lstm import LSTMPolicy

RESTART_WARMSTART_EVERY = 50  # il_exp.py:86
COST_ROUND_ROBIN = 10  # il_exp.py:290


def _dx_init_params(env_name: str, seed: int) -> jnp.ndarray:
    """Mis-specified dynamics inits (il_exp.py:136-149)."""
    if env_name == "pendulum":
        return jnp.array([15.0, 3.0, 0.5])
    if env_name == "cartpole":
        return jnp.array([9.8, 3.0, 0.1, 1.0])
    if env_name == "pendulum-complex":
        rng = np.random.RandomState(seed)
        return jnp.asarray(
            np.array([5.0, 1.0, 1.0])
            + np.array([3.0, 1.0, 1.0]) * (rng.rand(3) - 0.5)
        )
    raise ValueError(env_name)


@dataclasses.dataclass
class ILExp:
    env: ILEnv
    mode: str = "sysid"  # nn | empc | imempc | sysid
    learn_cost: bool = False
    learn_dx: bool = False
    n_batch: int = 32
    n_epoch: int = 1000
    n_train: int = 100
    seed: int = 5
    work: str = "./work"
    save: Optional[str] = None

    def __post_init__(self):
        assert self.mode in ("nn", "empc", "imempc", "sysid")
        if self.mode in ("empc", "imempc"):
            assert self.learn_cost or self.learn_dx
        if self.mode == "sysid":
            self.learn_dx = True
        env_name = self.env.env
        tag = f"il.{env_name}.{self.mode}.n_train={self.n_train}"
        if self.learn_cost:
            tag += ".learn_cost"
        if self.learn_dx:
            tag += ".learn_dx"
        self.save = self.save or os.path.join(self.work, tag, str(self.seed))
        os.makedirs(self.save, exist_ok=True)

        dx = self.env.true_dx
        self.n_state, self.n_ctrl, self.T = dx.n_state, dx.n_ctrl, self.env.mpc_T
        key = jax.random.PRNGKey(self.seed)

        # learnable state
        self.params: Dict[str, Any] = {}
        if self.mode == "nn":
            self.lstm = LSTMPolicy(
                n_state=self.n_state, n_ctrl=self.n_ctrl, T=self.T
            )
            self.params["nn"] = self.lstm.init_params(key)
            self.opt = optax.adam(1e-4)
        else:
            if self.learn_cost:
                self.params["q_logit"] = jnp.zeros_like(self.env.true_q)
                self.params["p_hat"] = jnp.zeros_like(self.env.true_p)
            if self.learn_dx:
                self.params["dx"] = _dx_init_params(env_name, self.seed)
            # RMSprop(lr=1e-2, alpha=0.5) (il_exp.py:237-241)
            self.opt = optax.rmsprop(1e-2, decay=0.5)
        self.opt_state = self.opt.init(self.params)

    # -- pieces --------------------------------------------------------------
    def _cost_qp(self, params):
        """(q, p) from learnables (il_exp.py:330-334)."""
        if self.learn_cost:
            q = jax.nn.sigmoid(params["q_logit"])
            p = jnp.sqrt(q) * params["p_hat"]
            return q, p
        return self.env.true_q, self.env.true_p

    def _dx_params(self, params):
        return params["dx"] if self.learn_dx else self.env.true_params

    def _losses(self, params, xinits, xs, us, warmstart):
        """im_loss (il_exp.py:346) and sysid_loss (il_exp.py:348-357); also
        returns the new warm-start controls."""
        out = {}
        if self.mode == "nn":
            pred_u = self.lstm.apply(params["nn"], xinits)
            out["im_loss"] = jnp.mean((us - pred_u) ** 2)
            return out, None
        q, p = self._cost_qp(params)
        dxp = self._dx_params(params)
        nom_x, nom_u = self.env.mpc(dxp, xinits, q, p, u_init=warmstart)
        out["im_loss"] = jnp.mean((us - nom_u) ** 2)
        if self.learn_dx:
            dyn = self.env.true_dx
            step = jax.vmap(
                jax.vmap(lambda x, u: dyn.step(x, u, dxp)), in_axes=(0, 0)
            )
            pred_next = step(xs[:, :-1], us[:, :-1])
            out["sysid_loss"] = jnp.mean((xs[:, 1:] - pred_next) ** 2)
        return out, jax.lax.stop_gradient(nom_u)

    def _train_loss(self, params, xinits, xs, us, warmstart):
        losses, new_ws = self._losses(params, xinits, xs, us, warmstart)
        main = (
            losses["sysid_loss"] if self.mode == "sysid" else losses["im_loss"]
        )
        return main, (losses, new_ws)

    def train_step(self, params, opt_state, xinits, xs, us, warmstart, update_q):
        """One jittable optimizer step."""
        grads, (losses, new_ws) = jax.grad(self._train_loss, has_aux=True)(
            params, xinits, xs, us, warmstart
        )
        if self.learn_cost:
            # round-robin: alternate q / p updates (il_exp.py:375-381)
            grads = dict(grads)
            grads["p_hat"] = jnp.where(update_q, 0.0, 1.0) * grads["p_hat"]
            grads["q_logit"] = jnp.where(update_q, 1.0, 0.0) * grads["q_logit"]
        updates, opt_state = self.opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses, new_ws

    # -- training loop ---------------------------------------------------------
    def run(self, verbose: bool = True):
        env = self.env
        rng = np.random.RandomState(self.seed)
        train = np.asarray(env.train_data[: self.n_train])
        val = np.asarray(env.val_data)
        test = np.asarray(env.test_data)

        def split(data):
            xs = jnp.asarray(data[:, :, : self.n_state])
            us = jnp.asarray(data[:, :, -self.n_ctrl :])
            return xs[:, 0], xs, us

        tr_xinit, tr_xs, tr_us = split(train)
        n = tr_xinit.shape[0]
        ws = {
            "train": jnp.zeros((n, self.T, self.n_ctrl)),
            "val": jnp.zeros((val.shape[0], self.T, self.n_ctrl)),
            "test": jnp.zeros((test.shape[0], self.T, self.n_ctrl)),
        }

        train_f = open(os.path.join(self.save, "train_losses.csv"), "w")
        names = ["epoch", "im_loss"] + (["sysid_loss"] if self.learn_dx else [])
        train_f.write(",".join(names) + "\n")
        vt_f = open(os.path.join(self.save, "val_test_losses.csv"), "w")
        vt_f.write("epoch,im_loss_val,im_loss_test\n")
        dx_f = cost_f = None
        if self.learn_dx:
            dx_f = open(os.path.join(self.save, "dx_hist.csv"), "w")
            dx_f.write(
                ",".join(map(str, np.asarray(env.true_params).tolist())) + "\n"
            )
        if self.learn_cost:
            cost_f = open(os.path.join(self.save, "cost_hist.csv"), "w")
            cost_f.write(
                ",".join(
                    map(
                        str,
                        np.concatenate(
                            [np.asarray(env.true_q), np.asarray(env.true_p)]
                        ).tolist(),
                    )
                )
                + "\n"
            )

        # jit for all modes: the MPC modes (differentiable solve + IFT/KKT
        # backward + optimizer) compile to one program -- measured 5 ms vs
        # 141 s eager per step on the tunneled TPU (B=32 pendulum)
        step_fn = jax.jit(self.train_step)
        best_val = None
        update_q = False
        n_train_batch = max(1, n // self.n_batch)
        for epoch in range(self.n_epoch):
            if epoch > 0 and epoch % COST_ROUND_ROBIN == 0:
                update_q = not update_q
            if self.mode != "nn" and epoch % RESTART_WARMSTART_EVERY == 0:
                ws = {k: jnp.zeros_like(v) for k, v in ws.items()}

            perm = rng.permutation(n)
            for j in range(n_train_batch):
                idx = perm[j * self.n_batch : (j + 1) * self.n_batch]
                self.params, self.opt_state, losses, new_ws = step_fn(
                    self.params,
                    self.opt_state,
                    tr_xinit[idx],
                    tr_xs[idx],
                    tr_us[idx],
                    ws["train"][idx] if self.mode != "nn" else None,
                    jnp.asarray(update_q),
                )
                if new_ws is not None:
                    ws["train"] = ws["train"].at[idx].set(new_ws)
                row = [epoch + j / n_train_batch, float(losses["im_loss"])]
                if self.learn_dx:
                    row.append(float(losses["sysid_loss"]))
                train_f.write(",".join(map(str, row)) + "\n")
                if dx_f is not None:
                    dx_f.write(
                        ",".join(
                            map(str, np.asarray(self.params["dx"]).tolist())
                        )
                        + "\n"
                    )
                if cost_f is not None:
                    q, p = self._cost_qp(self.params)
                    cost_f.write(
                        ",".join(
                            map(
                                str,
                                np.concatenate(
                                    [np.asarray(q), np.asarray(p)]
                                ).tolist(),
                            )
                        )
                        + "\n"
                    )
                if verbose:
                    print(f"epoch {row[0]:.2f} losses {losses}")

            val_loss, ws["val"] = self.dataset_loss(val, ws["val"])
            test_loss, ws["test"] = self.dataset_loss(test, ws["test"])
            vt_f.write(f"{epoch},{val_loss},{test_loss}\n")
            for f in (train_f, vt_f):
                f.flush()

            if best_val is None or val_loss < best_val:
                best_val = val_loss
                # the reference pickles the whole experiment, implicitly
                # including its persistent warm starts (il_exp.py:424-429);
                # save them so a restore resumes identically
                ckpt.save(
                    os.path.join(self.save, "best.ckpt"),
                    dict(
                        params=self.params,
                        opt_state=self.opt_state,
                        epoch=epoch,
                        val_loss=val_loss,
                        warmstart=ws,
                    ),
                )
        for f in (train_f, vt_f, dx_f, cost_f):
            if f is not None:
                f.close()
        return best_val

    def restore(self, path: Optional[str] = None):
        """Load a best.ckpt (params + optimizer state; warm starts are
        returned for the caller's training loop). Reference equivalent:
        un-pickling the saved experiment (il_exp.py:424-429)."""
        path = path or os.path.join(self.save, "best.ckpt")
        state = ckpt.load(path)
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        return state

    @staticmethod
    def from_cli(argv=None) -> "ILExp":
        """CLI mirroring the reference's argparse surface (il_exp.py:40-54).
        Instead of a pickled --data fixture, --env (+ --populate) generates
        the expert dataset in-process; --data loads a .npz saved by
        scripts/make_datasets.py."""
        import argparse

        ap = argparse.ArgumentParser(description=__doc__)
        ap.add_argument("--env", default="pendulum",
                        choices=["pendulum", "cartpole", "pendulum-complex"])
        ap.add_argument("--data", default=None,
                        help=".npz dataset (scripts/make_datasets.py)")
        ap.add_argument("--work", default="./work")
        ap.add_argument("--save", default=None)
        ap.add_argument("--n_batch", type=int, default=32)
        ap.add_argument("--mode", default="sysid",
                        choices=["nn", "empc", "imempc", "sysid"])
        ap.add_argument("--learn_cost", action="store_true")
        ap.add_argument("--learn_dx", action="store_true")
        ap.add_argument("--seed", type=int, default=5)
        ap.add_argument("--n_epoch", type=int, default=1000)
        ap.add_argument("--n_train", type=int, default=100)
        ap.add_argument("--mpc_T", type=int, default=20)
        ap.add_argument("--lqr_iter", type=int, default=10)
        args = ap.parse_args(argv)

        env = ILEnv(env=args.env, mpc_T=args.mpc_T, lqr_iter=args.lqr_iter)
        if args.data is not None:
            d = np.load(args.data)
            # a dataset fixes its horizon and env (the reference's pickled
            # IL_Env carries both, il_exp.py:75-77): adopt the stored
            # mpc_T -- the expert trajectories ARE mpc_T long -- and
            # refuse a mismatched env rather than train on wrong physics
            if "env" in d and str(d["env"]) != args.env:
                raise SystemExit(
                    f"--data {args.data} was generated for env "
                    f"'{d['env']}', not '{args.env}'"
                )
            if "mpc_T" in d:
                data_T = int(d["mpc_T"])
                if data_T != args.mpc_T:
                    print(
                        f"--data horizon mpc_T={data_T} overrides "
                        f"--mpc_T {args.mpc_T} (the expert trajectories "
                        "fix the horizon)"
                    )
                    env = ILEnv(env=args.env, mpc_T=data_T,
                                lqr_iter=args.lqr_iter)
            env.train_data = d["train"]
            env.val_data = d["val"]
            env.test_data = d["test"]
        else:
            env.populate_data(
                n_train=args.n_train,
                n_val=max(8, args.n_train // 5),
                n_test=max(8, args.n_train // 5),
                seed=args.seed,
            )
        return ILExp(
            env=env,
            mode=args.mode,
            learn_cost=args.learn_cost,
            learn_dx=args.learn_dx,
            n_batch=args.n_batch,
            n_epoch=args.n_epoch,
            n_train=args.n_train,
            seed=args.seed,
            work=args.work,
            save=args.save,
        )

    def dataset_loss(self, data, warmstart):
        """Mean imitation loss over a dataset (il_exp.py:442-504)."""
        xinits = jnp.asarray(data[:, :, : self.n_state])[:, 0]
        us = jnp.asarray(data[:, :, -self.n_ctrl :])
        if self.mode == "nn":
            pred_u = self.lstm.apply(self.params["nn"], xinits)
            new_ws = warmstart
        else:
            if not hasattr(self, "_eval_fn"):

                def _eval(params, xinits, warmstart):
                    q, p = self._cost_qp(params)
                    return self.env.mpc(
                        self._dx_params(params),
                        xinits,
                        q,
                        p,
                        u_init=warmstart,
                        backprop=False,
                    )[1]

                self._eval_fn = jax.jit(_eval)
            pred_u = self._eval_fn(self.params, xinits, warmstart)
            new_ws = pred_u
        return float(jnp.mean((us - pred_u) ** 2)), new_ws


if __name__ == "__main__":
    ILExp.from_cli().run()
