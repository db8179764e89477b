"""Multi-host distribution: one mesh axis "batch" spanning every chip of
every process, over ICI within a host and DCN across hosts.

The reference is single-process/single-device (SURVEY.md section 2.4); its
only parallel axis is the in-process batch. The TPU-native equivalent named
there is exactly this module: ``jax.distributed.initialize`` + a global
``Mesh`` over ``jax.devices()`` (which, after initialize, enumerates ALL
processes' devices), solver inputs sharded with ``P("batch")`` on the
leading batch dim, params replicated, and the only cross-process
collectives the scalar reductions XLA inserts (convergence ``pmax`` inside
the solver's while_loop, loss/gradient ``psum`` in training) -- examples
are independent, so per-example tensors never cross a host boundary.

Usage (same program on every host; see scripts/multihost_demo.py):

    from dilqr_tpu.parallel import multihost as mh
    mh.initialize()                    # env-driven on TPU pods; explicit
                                       # args for local CPU clusters
    mesh = mh.global_batch_mesh()
    x_init = mh.distribute_batch(mesh, x_init_local)   # [B_local,...] each
    res = mh.multihost_solve(mesh, cfg, x_init, cost, dyn, params=params)
    u_all = mh.gather(res.u)           # host-local replica for inspection

Tested by tests/test_multihost.py: a subprocess-spawned, port-coordinated
2-process CPU cluster (2 devices per process) asserting the distributed
solve and a distributed IL training step match the single-process program
bit-for-bit on every example.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.solver import solve
from ..types import ILQRConfig, LinDx, QuadCost, SolveResult

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    On Cloud TPU pods call with no arguments -- JAX fills everything from
    the TPU metadata server. For manual clusters (including the local CPU
    test cluster) pass coordinator ``host:port``, the process count, and
    this process's id. Must run before the first touch of any device.
    """
    global _INITIALIZED
    # NB do not touch jax.devices()/process_count() here -- that would
    # initialise the XLA backend and make initialize() impossible
    if _INITIALIZED or jax.distributed.is_initialized():
        _INITIALIZED = True
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        if local_device_ids is not None:
            kwargs.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def global_batch_mesh(axis_name: str = "batch", devices=None) -> Mesh:
    """A 1-D mesh over every device of every process. Device order is
    process-major (jax.devices() sorts by process index), so contiguous
    batch shards land on one host -- DCN traffic is limited to the scalar
    collectives."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis_name,))


def distribute_batch(mesh: Mesh, tree, axis_name: str = "batch"):
    """Assemble global batch-sharded arrays from per-process LOCAL shards.

    Every process passes its own [B_local, ...] leaves (B_global =
    sum over processes); returns global jax.Arrays sharded P(axis_name)
    that jit consumes without resharding. The single-process case reduces
    to a device_put over the local mesh.
    """
    sh = NamedSharding(mesh, P(axis_name))

    def put(a):
        if a is None:
            return None
        a = np.asarray(a)
        if jax.process_count() == 1:
            return jax.device_put(a, sh)
        return jax.make_array_from_process_local_data(sh, a)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully-replicated global arrays (params, opt state, compact costs).
    Every process must pass the same values (the usual deterministic-init /
    broadcast-checkpoint discipline)."""
    sh = NamedSharding(mesh, P())

    def put(a):
        if a is None:
            return None
        a = jnp.asarray(a)
        if jax.process_count() == 1:
            return jax.device_put(a, sh)
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    return jax.tree_util.tree_map(put, tree)


def gather(tree, tiled: bool = True):
    """Host-local numpy copy of a (possibly non-addressable) global array
    on every process -- for verification and logging only; O(B_global)
    DCN traffic."""
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda a: np.asarray(multihost_utils.process_allgather(a, tiled=tiled)),
        tree,
    )


def multihost_solve(
    mesh: Mesh,
    cfg: ILQRConfig,
    x_init,
    cost,
    dynamics,
    params=None,
    axis_name: str = "batch",
    **kwargs,
) -> SolveResult:
    """The batched solve over a (possibly multi-process) global mesh.

    ``x_init`` and any [B, ...] leaves of ``cost``/``dynamics`` must be
    PER-PROCESS LOCAL shards (each process its own examples); compact
    example-invariant cost/params are passed identically by every process.
    Output arrays are global, batch-sharded; use ``gather`` to materialize
    them host-locally.
    """
    quad = isinstance(cost, QuadCost)
    lin = isinstance(dynamics, LinDx)

    x_init = distribute_batch(mesh, x_init, axis_name)
    if quad:
        if cost.C.ndim == 4:  # [B_local, T, n, n]: per-example cost
            cost = QuadCost(*distribute_batch(mesh, tuple(cost), axis_name))
        else:
            cost = QuadCost(*replicate(mesh, tuple(cost)))
    if lin:
        dynamics = LinDx(*distribute_batch(mesh, tuple(dynamics), axis_name))
    if params is not None:
        params = replicate(mesh, params)

    return _jit_solve(cfg, x_init, cost, dynamics, params, kwargs)


def _jit_solve(cfg, x_init, cost, dynamics, params, kwargs):
    quad = isinstance(cost, QuadCost)
    lin = isinstance(dynamics, LinDx)
    from .mesh import _cached_jit_solve

    fn = _cached_jit_solve(
        "multihost", cfg, quad, lin, cost, dynamics, kwargs
    )
    return fn(
        x_init,
        tuple(cost) if quad else (),
        tuple(dynamics) if lin else (),
        params,
    )


def multihost_train_step(mesh: Mesh, cfg: ILQRConfig, dyn, opt):
    """Build a jitted distributed IL training step: differentiable MPC
    solve on the globally-sharded batch, imitation loss, gradients (XLA
    inserts the cross-host psum for the replicated-param gradient
    reduction), optimizer update. Returns step(params, opt_state,
    x_init, u_expert, q, p) -> (params, opt_state, loss); feed it arrays
    from distribute_batch / replicate.
    """
    import optax

    def im_loss(params, x_init, u_expert, q, p):
        res = solve(
            cfg,
            x_init,
            QuadCost(jnp.diag(q), p),
            dyn,
            params=params,
            u_lower=dyn.lower,
            u_upper=dyn.upper,
        )
        return jnp.mean((res.u - u_expert) ** 2)

    def step(params, opt_state, x_init, u_expert, q, p):
        loss, grads = jax.value_and_grad(im_loss)(
            params, x_init, u_expert, q, p
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    dp = NamedSharding(mesh, P("batch"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(rep, rep, dp, dp, rep, rep),
        out_shardings=(rep, rep, rep),
    )
