"""Device-mesh utilities and the sharded solve wrapper.

The reference is single-process/single-device (SURVEY.md section 2.4); its
only parallel axis is the in-process batch. Here that axis is sharded over
TPU chips: one mesh axis "batch" spanning all devices (ICI within a host,
DCN across hosts), inputs sharded with P("batch") on the leading batch dim,
per-timestep Riccati blocks chip-local, and the only cross-chip collectives
the implicit reductions XLA inserts for the solver's global stopping rule
(max over full_du_norm -> pmax over ICI) and any training-loss psum --
examples are independent.

Use:
    mesh = batch_mesh()                       # all local devices
    sres = sharded_solve(mesh, cfg, ...)      # pjit'ed batched solve
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.solver import solve
from ..types import ILQRConfig, LinDx, QuadCost, SolveResult


_SOLVE_CACHE: dict = {}


def batch_mesh(devices=None, axis_name: str = "batch") -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "batch") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, tree, axis_name: str = "batch"):
    """Place every leaf with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)

    def put(a):
        if a is None:
            return None
        return jax.device_put(a, sh)

    return jax.tree_util.tree_map(put, tree)


def sharded_solve(
    mesh: Mesh,
    cfg: ILQRConfig,
    x_init,
    cost,
    dynamics,
    params=None,
    axis_name: str = "batch",
    **kwargs,
) -> SolveResult:
    """jit the batched solve with batch-sharded inputs/outputs.

    Batch-major layout makes this a pure data-parallel program: XLA keeps
    every per-example tensor chip-local and inserts collectives only for
    the scalar convergence reductions inside the outer while_loop.
    """
    sh = batch_sharding(mesh, axis_name)
    rep = NamedSharding(mesh, P())

    def put(a):
        return None if a is None else jax.device_put(a, sh)

    x_init = put(x_init)
    quad = isinstance(cost, QuadCost)
    lin = isinstance(dynamics, LinDx)
    if quad and cost.C.ndim == 4:
        cost = QuadCost(put(cost.C), put(cost.c))
    if lin:
        dynamics = LinDx(put(dynamics.F), put(dynamics.f))
    if params is not None:
        params = jax.device_put(params, rep)

    # Dynamics objects, callable costs, and scalar kwargs (e.g. bounds)
    # are closed over the jitted fn so they stay compile-time constants
    # (concrete bounds bake into the fused kernel; see
    # ops/pallas/ilqr_fused._static_bounds). The executable is cached on a
    # best-effort key: unhashable components (Dynamics carrying jax-array
    # bounds, array-valued kwargs) key by object identity, with strong
    # references kept alive in the cache so ids cannot be reused.
    def _k(v):
        try:
            hash(v)
            return v
        except TypeError:
            return ("id", id(v))

    key = (
        cfg, quad, lin,
        None if quad else _k(cost),
        None if lin else _k(dynamics),
        tuple((k, _k(v)) for k, v in sorted(kwargs.items())),
    )
    entry = _SOLVE_CACHE.get(key)
    if entry is None:

        @jax.jit
        def fn(x_init, cost_arrays, dyn_arrays, params):
            c = QuadCost(*cost_arrays) if quad else cost
            d = LinDx(*dyn_arrays) if lin else dynamics
            return solve(cfg, x_init, c, d, params=params, **kwargs)

        entry = (fn, (cost, dynamics, kwargs))  # keep-alive refs
        _SOLVE_CACHE[key] = entry

    return entry[0](
        x_init,
        tuple(cost) if quad else (),
        tuple(dynamics) if lin else (),
        params,
    )
