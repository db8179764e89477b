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

    Processes may own DIFFERENT numbers of mesh devices (heterogeneous
    hosts): each process's B_local must be divisible by its local device
    count, and the global shape is derived from this process's share of
    the mesh axis rather than assuming equal per-process shards. For
    per-process batches that are NOT proportional to device counts
    (dataset remainders), use :func:`distribute_batch_padded`.
    """
    sh = NamedSharding(mesh, P(axis_name))
    pid = jax.process_index()
    n_local = sum(1 for d in mesh.devices.flat if d.process_index == pid)
    n_dev = mesh.devices.size

    def put(a):
        if a is None:
            return None
        a = np.asarray(a)
        if jax.process_count() == 1:
            return jax.device_put(a, sh)
        if n_local == 0 or a.shape[0] % n_local:
            raise ValueError(
                f"local batch {a.shape[0]} not divisible by this "
                f"process's {n_local} mesh devices; for arbitrary uneven "
                "per-process batches use distribute_batch_padded"
            )
        global_shape = (a.shape[0] // n_local * n_dev,) + a.shape[1:]
        return jax.make_array_from_process_local_data(sh, a, global_shape)

    return jax.tree_util.tree_map(put, tree)


def distribute_batch_padded(mesh: Mesh, tree, axis_name: str = "batch"):
    """Assemble a global batch from ARBITRARY uneven per-process shards.

    Each process passes [B_local_p, ...] leaves with any B_local_p >= 0
    (the dataset-remainder case the strict :func:`distribute_batch`
    rejects). The global batch B = sum_p B_local_p is zero-padded up to
    the next multiple of the mesh size so the P(axis_name) sharding is
    admissible, and every process receives identical global arrays plus a
    validity mask.

    Returns ``(tree_g, valid, B)``: batch-sharded leaves with leading dim
    Bp >= B, a batch-sharded bool [Bp] mask (True for real examples), and
    the true global count. Padding rows DUPLICATE the last real example
    (not zeros): duplicates leave the solver's max-based batch-global
    reductions (the stopping rule, reference mpc.py:299-301) unchanged,
    so real examples solve bit-identically to the unpadded batch. Mask
    padding rows out of any mean-based consumer (e.g. ``loss =
    sum(where(valid, l, 0)) / B``).

    Assembly is host-side (one padded per-process all-gather per leaf,
    O(B_global) DCN) -- this is a data-loading step, not a training-step
    collective; the audit still sees zero large in-step collectives.
    Works with heterogeneous per-process device counts.
    """
    sh = NamedSharding(mesh, P(axis_name))
    n_dev = mesh.devices.size
    leaves = jax.tree_util.tree_leaves(tree)
    b_local = int(np.asarray(leaves[0]).shape[0]) if leaves else 0
    if jax.process_count() == 1:
        counts = np.asarray([b_local])
    else:
        counts = _gather_per_process(
            mesh, np.asarray([b_local], np.int32), axis_name
        ).reshape(-1)
    B = int(counts.sum())
    Bp = -(-B // n_dev) * n_dev
    mx = int(counts.max())

    def put(a):
        if a is None:
            return None
        a = np.asarray(a)
        if a.shape[0] != b_local:
            raise ValueError(
                f"inconsistent local batch dims: {a.shape[0]} vs {b_local}"
            )
        if jax.process_count() == 1:
            full = a
        else:
            pad = np.zeros((mx - a.shape[0],) + a.shape[1:], a.dtype)
            stacked = _gather_per_process(
                mesh, np.concatenate([a, pad], axis=0), axis_name
            )
            full = np.concatenate(
                [stacked[p, : counts[p]] for p in range(len(counts))], axis=0
            )
        if B > 0:
            tail = np.repeat(full[-1:], Bp - B, axis=0)
        else:
            tail = np.zeros((Bp - B,) + full.shape[1:], full.dtype)
        full = np.concatenate([full, tail], axis=0)
        return jax.make_array_from_callback(
            full.shape, sh, lambda idx: full[idx]
        )

    tree_g = jax.tree_util.tree_map(put, tree)
    valid_np = np.arange(Bp) < B
    valid = jax.make_array_from_callback(
        (Bp,), sh, lambda idx: valid_np[idx]
    )
    return tree_g, valid, B


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
    DCN traffic.

    NamedSharding-carrying arrays take a mesh-based path (replicate via a
    jit identity, read the local copy) that also works when processes own
    DIFFERENT numbers of mesh devices -- multihost_utils.process_allgather
    assumes equal per-process device counts and raises there."""
    from jax.experimental import multihost_utils

    def g(a):
        sh = getattr(a, "sharding", None)
        if isinstance(sh, NamedSharding) and jax.process_count() > 1:
            rep = jax.jit(
                lambda x: x, out_shardings=NamedSharding(sh.mesh, P())
            )(a)
            return np.asarray(rep.addressable_data(0))
        return np.asarray(
            multihost_utils.process_allgather(a, tiled=tiled)
        )

    return jax.tree_util.tree_map(g, tree)


def _gather_per_process(mesh: Mesh, a_local: np.ndarray,
                        axis_name: str = "batch") -> np.ndarray:
    """All-gather one identical-shape host array per process -> host
    [n_processes, *shape] in process-index order, via the mesh itself
    (each device carries its process's copy on the sharded axis, a jit
    identity replicates, one row per process is kept). Unlike
    multihost_utils.process_allgather this handles heterogeneous
    per-process device counts."""
    devs = list(mesh.devices.flat)
    pid = jax.process_index()
    n_local = sum(1 for d in devs if d.process_index == pid)
    sh = NamedSharding(mesh, P(axis_name))
    local = np.broadcast_to(
        a_local[None], (n_local,) + a_local.shape
    ).copy()
    glob = jax.make_array_from_process_local_data(
        sh, local, (len(devs),) + a_local.shape
    )
    rep = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(glob)
    host = np.asarray(rep.addressable_data(0))
    procs = sorted({d.process_index for d in devs})
    first = {
        p: min(i for i, d in enumerate(devs) if d.process_index == p)
        for p in procs
    }
    return np.stack([host[first[p]] for p in procs])


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

    def place_if(a, full_rank):
        # batch-major (per-process-local) only at FULL rank (see
        # core/solver.py canonicalizers); example-invariant lower ranks
        # replicate -- distributing them would shard the time axis
        if a is None:
            return None
        if a.ndim == full_rank:
            return distribute_batch(mesh, a, axis_name)
        return replicate(mesh, a)

    if quad:
        cost = QuadCost(place_if(cost.C, 4), place_if(cost.c, 3))
    if lin:
        dynamics = LinDx(place_if(dynamics.F, 4), place_if(dynamics.f, 3))
    if params is not None:
        params = replicate(mesh, params)

    return _jit_solve(cfg, x_init, cost, dynamics, params, kwargs,
                      mesh=mesh, axis_name=axis_name)


def _jit_solve(cfg, x_init, cost, dynamics, params, kwargs,
               mesh=None, axis_name="batch"):
    quad = isinstance(cost, QuadCost)
    lin = isinstance(dynamics, LinDx)
    from .mesh import _cached_jit_solve, _split_batch_kwargs

    # per-example kwargs ([B_local,T,nu] warm starts/masks/bounds) must be
    # jit ARGUMENTS sharded like x_init: closing them over would embed
    # each process's local values as constants -> per-process divergent
    # HLO on a multi-process mesh.
    _, batch_kw = _split_batch_kwargs(kwargs)
    if batch_kw and mesh is not None:
        batch_kw = {
            k: distribute_batch(mesh, v, axis_name)
            for k, v in batch_kw.items()
        }
    fn = _cached_jit_solve(
        "multihost", cfg, quad, lin, cost, dynamics, kwargs
    )
    return fn(
        x_init,
        tuple(cost) if quad else (),
        tuple(dynamics) if lin else (),
        params,
        batch_kw,
    )


def multihost_train_step(mesh: Mesh, cfg: ILQRConfig, dyn, opt,
                         axis_name: str = "batch"):
    """Build a jitted distributed IL training step: differentiable MPC
    solve on the globally-sharded batch, imitation loss, gradients,
    optimizer update. Returns step(params, opt_state, x_init, u_expert,
    q, p) -> (params, opt_state, loss); feed it arrays from
    distribute_batch / replicate.

    The per-example forward+backward runs under jax.shard_map, per device
    on its LOCAL shard, with explicit lax.pmean reductions of the scalar
    loss and the replicated-param gradient -- the same treatment
    mesh.sharded_solve gives the fused forward. Handing the whole
    differentiated while_loop to GSPMD instead makes its partitioner
    "involuntarily fully rematerialize" tiny loop-carried tensors across
    the mesh in the transpose (observed in round 3's dryrun tail), and it
    cannot partition a Pallas custom call at all. Per-device means are
    exact: P(axis) shards the batch equally over devices, so
    pmean-of-means is the global mean.
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

    def local_step(params, opt_state, x_init, u_expert, q, p):
        loss, grads = jax.value_and_grad(im_loss)(
            params, x_init, u_expert, q, p
        )
        loss = jax.lax.pmean(loss, axis_name)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, axis_name), grads
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    from .mesh import _shard_map

    dp_s, rep_s = P(axis_name), P()
    smapped = _shard_map(
        local_step, mesh,
        in_specs=(rep_s, rep_s, dp_s, dp_s, rep_s, rep_s),
        out_specs=(rep_s, rep_s, rep_s),
    )
    dp = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    jitted = jax.jit(
        smapped,
        in_shardings=(rep, rep, dp, dp, rep, rep),
        out_shardings=(rep, rep, rep),
    )
    n_dev = mesh.devices.size

    def step(params, opt_state, x_init, u_expert, q, p):
        # shard_map (unlike plain GSPMD, which pads implicitly) requires
        # the global batch divisible by the mesh -- fail with directions
        # rather than a trace-time shard_map error
        if x_init.shape[0] % n_dev:
            raise ValueError(
                f"global batch {x_init.shape[0]} not divisible by the "
                f"{n_dev}-device mesh; pad the dataset-remainder batch "
                "with distribute_batch_padded (mask the loss with its "
                "validity mask) or drop the remainder"
            )
        return jitted(params, opt_state, x_init, u_expert, q, p)

    step.lower = jitted.lower  # for HLO audits (see dryrun_multichip)
    return step
