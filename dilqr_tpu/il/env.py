"""Imitation-learning environment wrapper: expert-data generation + the MPC
call used during training. TPU-native re-implementation of IL_Env
(il_env.py:32-188).

Data tensors are batch-major [N, T, n_state+n_ctrl] like the reference's
pickled fixtures (il_env.py:90-94).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.solver import solve
from ..models import cartpole, pendulum
from ..models.base import Dynamics
from ..types import BackwardMode, GradMethod, ILQRConfig, QuadCost


def make_env(name: str):
    """(Dynamics, params, (q, p)) for a named env (il_env.py:36-44)."""
    if name == "pendulum":
        dyn = pendulum.make(simple=True)
        params = pendulum.default_params(simple=True)
        qp = pendulum.get_true_obj()
    elif name == "pendulum-complex":
        dyn = pendulum.make(simple=False)
        params = jnp.array([10.0, 1.0, 1.0, 1.0, 0.1])  # il_env.py:41
        qp = pendulum.get_true_obj()
    elif name == "cartpole":
        dyn = cartpole.make()
        params = cartpole.default_params()
        qp = cartpole.get_true_obj()
    else:
        raise ValueError(name)
    return dyn, params, qp


def sample_xinit(key: jax.Array, env_name: str, n_batch: int) -> jax.Array:
    """Initial-state distributions (il_env.py:58-79). NB the reference's
    cartpole branch multiplies every random term by 0, leaving the
    deterministic near-upside-down state th = pi/1.05 -- reproduced."""
    if env_name in ("pendulum", "pendulum-complex"):
        k1, k2 = jax.random.split(key)
        th = jax.random.uniform(
            k1, (n_batch,), minval=-0.5 * jnp.pi, maxval=0.5 * jnp.pi
        )
        thdot = jax.random.uniform(k2, (n_batch,), minval=-1.0, maxval=1.0)
        return jnp.stack([jnp.cos(th), jnp.sin(th), thdot], axis=1)
    if env_name == "cartpole":
        th = jnp.full((n_batch,), jnp.pi / 1.05)
        z = jnp.zeros((n_batch,))
        return jnp.stack([z, z, jnp.cos(th), jnp.sin(th), z], axis=1)
    raise ValueError(env_name)


@dataclasses.dataclass
class ILEnv:
    """Mirrors IL_Env (il_env.py:32-55): env + expert MPC configuration +
    train/val/test data arrays."""

    env: str
    lqr_iter: int = 100
    mpc_T: int = 35
    slew_rate_penalty: Optional[float] = None
    grad_method: GradMethod = GradMethod.ANALYTIC
    backward_mode: BackwardMode = BackwardMode.IFT
    # "pnqp" reproduces the reference's exact projected-Newton iterates
    # (for parity tests); "auto" is the fast closed-form 1-D QP
    qp_solver: str = "auto"

    train_data: Optional[np.ndarray] = None
    val_data: Optional[np.ndarray] = None
    test_data: Optional[np.ndarray] = None

    def __post_init__(self):
        self.true_dx, self.true_params, (self.true_q, self.true_p) = make_env(
            self.env
        )

    # -- the MPC call used by both data generation and training ------------
    def mpc(
        self,
        params,
        xinit: jax.Array,
        q: jax.Array,
        p: jax.Array,
        u_init: Optional[jax.Array] = None,
        eps_override: Optional[float] = None,
        lqr_iter_override: Optional[int] = None,
        backprop: bool = True,
    ):
        """Batched box-constrained solve with a diagonal cost
        (il_env.py:153-188). Returns (x [B,T,nx], u [B,T,nu])."""
        dx = self.true_dx
        cfg = ILQRConfig(
            n_state=dx.n_state,
            n_ctrl=dx.n_ctrl,
            T=self.mpc_T,
            lqr_iter=lqr_iter_override or self.lqr_iter,
            grad_method=self.grad_method,
            eps=eps_override or dx.mpc_eps,
            linesearch_decay=dx.linesearch_decay,
            max_linesearch_iter=dx.max_linesearch_iter,
            exit_unconverged=False,
            detach_unconverged=True,
            backward_mode=self.backward_mode,
            backprop=backprop,
            slew_rate_penalty=self.slew_rate_penalty,
            qp_solver=self.qp_solver,
        )
        res = solve(
            cfg,
            xinit,
            QuadCost(jnp.diag(q), p),
            dx,
            params=params,
            u_init=u_init,
            u_lower=dx.lower,
            u_upper=dx.upper,
        )
        return res.x, res.u

    # -- expert data generation --------------------------------------------
    def populate_data(self, n_train, n_val, n_test, seed=0):
        """One batched expert solve for all examples (il_env.py:81-94)."""
        key = jax.random.PRNGKey(seed)
        n = n_train + n_val + n_test
        xinit = sample_xinit(key, self.env, n)
        x, u = self.mpc(
            self.true_params, xinit, self.true_q, self.true_p, backprop=False
        )
        tau = np.asarray(jnp.concatenate([x, u], axis=2))
        self.train_data = tau[:n_train]
        self.val_data = tau[n_train : n_train + n_val]
        self.test_data = tau[-n_test:]

    def populate_data2(self, n_train, n_val, n_test, seed=0, xinit=None):
        """Receding-horizon expert with warm-start shifting
        (il_env.py:96-151). The reference loops per-sample in Python; here
        the whole population rolls forward together, one batched solve per
        environment step -- same trajectories, B-fold fewer solves.

        xinit: optional [n_total, n_state] initial states overriding
        sample_xinit (parity tests inject the reference's torch-RNG draws)."""
        key = jax.random.PRNGKey(seed)
        n = n_train + n_val + n_test
        dx, params = self.true_dx, self.true_params
        T = self.mpc_T
        x = sample_xinit(key, self.env, n) if xinit is None else jnp.asarray(
            xinit
        )
        u_init = None
        xs, us = [np.asarray(x)], []
        for _ in range(T):
            nom_x, nom_u = self.mpc(
                params, x, self.true_q, self.true_p, u_init=u_init, backprop=False
            )
            a0 = nom_u[:, 0]
            us.append(np.asarray(a0))
            x = jax.vmap(lambda xi, ui: dx.step(xi, ui, params))(x, a0)
            xs.append(np.asarray(x))
            # shift warm start (il_env.py:139): drop the first action,
            # append zero, and duplicate the second-to-last
            u_shift = jnp.concatenate(
                [nom_u[:, 1:], jnp.zeros_like(nom_u[:, :1])], axis=1
            )
            u_init = u_shift.at[:, -2].set(u_shift[:, -3])
        tau = np.concatenate(
            [np.stack(xs[:-1], axis=1), np.stack(us, axis=1)], axis=2
        )
        self.train_data = tau[:n_train]
        self.val_data = tau[n_train : n_train + n_val]
        self.test_data = tau[-n_test:]
