"""MLP dynamics x' = MLP(x, u) (+ x if passthrough).

Re-implementation of the reference NNDynamics (dynamics.py:15-130):
configurable hidden sizes and activation (sigmoid / relu / elu), optional
residual passthrough. The reference hand-backpropagates through stored
activations to build grad_input (dynamics.py:81-130); here the Jacobian is
jax.jacfwd of the same pure function -- exact and stateless (the reference's
version silently depends on `self.zs` from the LAST forward call).

Params pytree: list of (W [out,in], b [out]).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .base import Dynamics

ACTS = {
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
}


def init_params(
    key: jax.Array,
    n_state: int,
    n_ctrl: int,
    hidden_sizes: Sequence[int] = (100,),
) -> List[Tuple[jax.Array, jax.Array]]:
    """torch.nn.Linear-style uniform(-1/sqrt(in), 1/sqrt(in)) init."""
    sizes = [n_state + n_ctrl] + list(hidden_sizes) + [n_state]
    params = []
    for n_in, n_out in zip(sizes[:-1], sizes[1:]):
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(n_in)
        W = jax.random.uniform(k1, (n_out, n_in), minval=-bound, maxval=bound)
        b = jax.random.uniform(k2, (n_out,), minval=-bound, maxval=bound)
        params.append((W, b))
    return params


def make(
    n_state: int,
    n_ctrl: int,
    activation: str = "sigmoid",
    passthrough: bool = True,
) -> Dynamics:
    assert activation in ACTS
    act = ACTS[activation]

    def step(x, u, params):
        z = jnp.concatenate([x, u])
        for i, (W, b) in enumerate(params):
            z = W @ z + b
            if i < len(params) - 1:
                z = act(z)
        if passthrough:
            z = z + x
        return z

    return Dynamics(n_state=n_state, n_ctrl=n_ctrl, step=step)
