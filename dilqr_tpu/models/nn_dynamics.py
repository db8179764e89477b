"""MLP dynamics x' = MLP(x, u) (+ x if passthrough).

Re-implementation of the reference NNDynamics (dynamics.py:15-130):
configurable hidden sizes and activation (sigmoid / relu / elu), optional
residual passthrough. The reference hand-backpropagates through stored
activations to build grad_input (dynamics.py:81-130); here the Jacobian is
jax.jacfwd of the same pure function -- exact and stateless (the reference's
version silently depends on `self.zs` from the LAST forward call).

Params pytree: list of (W [out,in], b [out]).

Fused-kernel support: pass ``hidden_sizes`` to ``make`` and the step
gains a second form that consumes the megakernel's FLAT scalar parameter
list (ravel_pytree order) with index-arithmetic math on lane stacks --
small MLPs (hidden <= ~16) then run inside the whole-solve Pallas kernel
instead of the XLA fallback (the dispatch flattens the pytree
automatically; see ops/pallas/ilqr_fused._flatten_pytree_params).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

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


def _is_scalar_list(params) -> bool:
    """The megakernel hands the step a python list of SMEM scalar reads."""
    return (
        isinstance(params, (list, tuple))
        and len(params) > 0
        and all(getattr(p, "ndim", None) == 0 for p in params)
    )


def make(
    n_state: int,
    n_ctrl: int,
    activation: str = "sigmoid",
    passthrough: bool = True,
    hidden_sizes: Optional[Sequence[int]] = None,
) -> Dynamics:
    """hidden_sizes: when given (static layer widths), the step also
    accepts the fused kernel's flat scalar-list params and is authored
    index-style so it traces on [d, 8, lanes] stacks -- enabling the
    whole-solve kernel for MLP dynamics (reference dynamics.py:15-130
    has no fast path at all; it always runs the autograd graph)."""
    assert activation in ACTS
    act = ACTS[activation]

    def step_arrays(x, u, params):
        z = jnp.concatenate([x, u])
        for i, (W, b) in enumerate(params):
            z = W @ z + b
            if i < len(params) - 1:
                z = act(z)
        if passthrough:
            z = z + x
        return z

    if hidden_sizes is None:
        return Dynamics(n_state=n_state, n_ctrl=n_ctrl, step=step_arrays)

    sizes = [n_state + n_ctrl] + list(hidden_sizes) + [n_state]

    def step_scalars(x, u, ps):
        # index-arithmetic MLP on axis-0 stacks: works identically for
        # per-example vectors (x[i] scalar) and lane tiles (x[i] [8,lw]).
        # ps is the ravel_pytree-ordered flat list: W row-major, then b,
        # per layer.
        z = [x[i] for i in range(n_state)] + [u[j] for j in range(n_ctrl)]
        off = 0
        for li, (nin, nout) in enumerate(zip(sizes[:-1], sizes[1:])):
            W = ps[off:off + nout * nin]
            off += nout * nin
            b = ps[off:off + nout]
            off += nout
            z = [
                sum(W[i * nin + j] * z[j] for j in range(nin)) + b[i]
                for i in range(nout)
            ]
            if li < len(sizes) - 2:
                z = [act(v) for v in z]
        if passthrough:
            z = [z[i] + x[i] for i in range(n_state)]
        return jnp.stack(z)

    def step(x, u, params):
        if _is_scalar_list(params):
            return step_scalars(x, u, params)
        return step_arrays(x, u, params)

    return Dynamics(n_state=n_state, n_ctrl=n_ctrl, step=step)
