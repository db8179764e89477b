"""LSTM behavioral-cloning baseline (mode 'nn').

Replicates the reference architecture (il_exp.py:97-120): three-layer MLP
state/control embeddings (hidden 256, ReLU), an LSTMCell, and a decoder MLP
-- including the reference's quirk of decoding the control from the LSTM
*cell* state ct rather than the hidden state ht (il_exp.py:176).

Implemented as plain pytree params + pure functions (no framework dep); the
rollout over T is a lax.scan.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

N_HIDDEN = 256


def _mlp_init(key, sizes):
    params = []
    for kin, kout in zip(sizes[:-1], sizes[1:]):
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(kin)
        W = jax.random.uniform(k1, (kout, kin), minval=-bound, maxval=bound)
        b = jax.random.uniform(k2, (kout,), minval=-bound, maxval=bound)
        params.append((W, b))
    return params


def _mlp_apply(params, x):
    for i, (W, b) in enumerate(params):
        x = x @ W.T + b
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def _lstm_init(key, n_in, n_hidden):
    key, k1, k2, k3, k4 = jax.random.split(key, 5)
    bound = 1.0 / jnp.sqrt(n_hidden)
    u = lambda k, shape: jax.random.uniform(k, shape, minval=-bound, maxval=bound)
    return dict(
        Wi=u(k1, (4 * n_hidden, n_in)),
        Wh=u(k2, (4 * n_hidden, n_hidden)),
        bi=u(k3, (4 * n_hidden,)),
        bh=u(k4, (4 * n_hidden,)),
    )


def _lstm_step(p, x, h, c):
    """torch.nn.LSTMCell gate order: i, f, g, o."""
    gates = x @ p["Wi"].T + p["bi"] + h @ p["Wh"].T + p["bh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


@dataclasses.dataclass(frozen=True)
class LSTMPolicy:
    n_state: int
    n_ctrl: int
    T: int
    n_hidden: int = N_HIDDEN

    def init_params(self, key) -> Dict[str, Any]:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        h = self.n_hidden
        return dict(
            state_emb=_mlp_init(k1, [self.n_state, h, h, h]),
            ctrl_emb=_mlp_init(k2, [self.n_ctrl, h, h, h]),
            decode=_mlp_init(k3, [h, h, h, self.n_ctrl]),
            cell=_lstm_init(k4, h, h),
        )

    def apply(self, params, xinits: jax.Array) -> jax.Array:
        """xinits: [B, n_state] -> controls [B, T, n_ctrl]
        (reference lstm_forward, il_exp.py:168-181)."""
        B = xinits.shape[0]
        y0 = _mlp_apply(params["state_emb"], xinits)
        h0 = jnp.zeros((B, self.n_hidden), y0.dtype)
        c0 = jnp.zeros((B, self.n_hidden), y0.dtype)

        def step(carry, _):
            y, h, c = carry
            h, c = _lstm_step(params["cell"], y, h, c)
            u = _mlp_apply(params["decode"], c)  # decode from cell state!
            y = _mlp_apply(params["ctrl_emb"], u)
            return (y, h, c), u

        _, us = lax.scan(step, (y0, h0, c0), None, length=self.T)
        return jnp.swapaxes(us, 0, 1)
