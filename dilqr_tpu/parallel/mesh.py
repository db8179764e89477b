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


import collections

_SOLVE_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_SOLVE_CACHE_MAX = 64


def _struct_key(v, keep, _visiting=None):
    """A hashable structural key for executable caching.

    numpy arrays key by (shape, dtype, content bytes) -- host-side hash,
    no device transfer, immune to in-place mutation. jax.Arrays are
    IMMUTABLE, so they key by identity with a strong reference appended
    to ``keep`` (stored alongside the cache entry) so the id cannot be
    recycled while the entry lives -- no per-call device->host readback.
    Functions key by code object + structural closure contents, so two
    `pendulum.make()` calls produce the SAME key (fresh lambdas over the
    same code); containers recurse; objects (Dynamics) key by type +
    attributes. ``_visiting`` guards cyclic reachability (a registry dict
    holding the function that reads it, a self-referential container):
    revisited nodes key by type + id instead of recursing forever.
    """
    import types as pytypes

    if v is None or isinstance(v, (bool, int, float, str, bytes)):
        return v
    if isinstance(v, np.ndarray):
        return ("nparray", v.shape, str(v.dtype), v.tobytes())
    if isinstance(v, jax.Array):
        keep.append(v)
        return ("jaxarr", v.shape, str(v.dtype), id(v))
    if _visiting is None:
        _visiting = set()
    if id(v) in _visiting:
        keep.append(v)  # id stays valid while the entry lives
        return ("cycle", type(v).__name__, id(v))
    _visiting = _visiting | {id(v)}
    if isinstance(v, pytypes.FunctionType):
        cells = tuple(
            _struct_key(c.cell_contents, keep, _visiting)
            for c in (v.__closure__ or ())
        )
        defaults = tuple(
            _struct_key(d, keep, _visiting) for d in (v.__defaults__ or ())
        )
        # globals the code object actually references are part of the
        # function's behavior too (a module-level constant the user mutates
        # between calls must not structurally collide with the stale key).
        # Referenced functions key by code object only -- no recursion into
        # their own globals, which keeps mutually-recursive helpers finite
        # at the cost of missing second-order global mutations. Functions
        # reached THROUGH containers (a registry dict) likewise stop at the
        # code object via the _visiting guard.
        gkeys = []
        for name in v.__code__.co_names:
            if name in v.__globals__:
                g = v.__globals__[name]
                if isinstance(g, pytypes.ModuleType):
                    gkeys.append((name, "mod", g.__name__))
                elif isinstance(g, pytypes.FunctionType):
                    gkeys.append((name, "fn", g.__code__))
                elif isinstance(g, type):
                    gkeys.append((name, "type", g))
                else:
                    gkeys.append((name, _struct_key(g, keep, _visiting)))
        return ("fn", v.__code__, cells, defaults, tuple(gkeys))
    if isinstance(v, (tuple, list)):
        return (type(v).__name__,) + tuple(
            _struct_key(x, keep, _visiting) for x in v
        )
    if isinstance(v, dict):
        return (
            "dict",
            tuple(
                (k, _struct_key(x, keep, _visiting))
                for k, x in sorted(v.items())
            ),
        )
    import dataclasses as dc

    if dc.is_dataclass(v) and not isinstance(v, type):
        return (
            type(v),
            tuple(
                (f.name, _struct_key(getattr(v, f.name), keep, _visiting))
                for f in dc.fields(v)
            ),
        )
    try:
        hash(v)
        return v
    except TypeError:
        pass
    fields = getattr(v, "__dict__", None)
    if fields:
        return (type(v), _struct_key(fields, keep, _visiting))
    keep.append(v)
    return ("id", type(v), id(v))


def _shard_map(fn, mesh, in_specs, out_specs):
    """jax.shard_map across jax versions (check_rep -> check_vma rename)."""
    smap = getattr(jax, "shard_map", None)
    if smap is None:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as smap
    for kw in ({"check_vma": False}, {"check_rep": False}, {}):
        try:
            return smap(fn, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, **kw)
        except TypeError:
            continue
    raise RuntimeError("no compatible jax.shard_map signature")


# kwargs of solve() that can carry a leading batch axis, with the ndim at
# which they do (batch-major user layouts, core/solver.py:197-206):
# u_init/u_zero_I/bounds [B,T,nu], prev_ctrl [B,nu]. At lower ranks they
# are example-invariant and stay compile-time constants.
_BATCH_KW_NDIM = {
    "u_init": 3, "u_zero_I": 3, "u_lower": 3, "u_upper": 3, "prev_ctrl": 2,
}


def _split_batch_kwargs(kwargs):
    """(example-invariant kwargs, per-example kwargs). Per-example ones
    must travel as jit ARGUMENTS (sharded on their leading batch axis):
    closing them over would bake a full-B constant into the executable --
    a shape mismatch inside shard_map's per-device body, and per-process
    divergent HLO on a multi-host mesh."""
    static, batched = {}, {}
    for k, v in kwargs.items():
        nd = _BATCH_KW_NDIM.get(k)
        if nd is not None and getattr(v, "ndim", None) == nd:
            batched[k] = v
        else:
            static[k] = v
    return static, batched


def _cached_jit_solve(tag, cfg, quad, lin, cost, dynamics, kwargs,
                      smap=None):
    """Shared executable cache for sharded_solve / multihost_solve:
    structural key (see _struct_key), bounded LRU, id-keyed components
    kept alive with the entry. Returns the jitted fn, called as
    fn(x_init, cost_arrays, dyn_arrays, params, batch_kwargs) where
    batch_kwargs holds the per-example kwargs (see _split_batch_kwargs).

    smap: optional (mesh, axis_name) -- wrap the solve in jax.shard_map
    so each device runs the whole solver on its LOCAL batch shard. This
    is REQUIRED for the fused Pallas path on a multi-chip mesh (GSPMD
    cannot partition a custom call; without it the kernel would be
    replicated with the full batch). Under shard_map the batch-global
    stopping rule becomes per-shard -- the device-level analog of the
    kernel's per-tile rule, same equal-or-better-per-example semantics
    (tests/test_fused_mixed_convergence.py); n_iter is pmax'ed back to a
    replicated global max."""
    static_kw, batch_kw = _split_batch_kwargs(kwargs)
    keep: list = []
    # per-example kwargs are jit ARGUMENTS: key them by (name, shape,
    # dtype) only -- hashing their contents (or jax.Array identity) would
    # make every fresh warm-start/bounds array of an MPC loop a cache
    # miss and a full recompile
    key = (
        tag, cfg, quad, lin,
        None if quad else _struct_key(cost, keep),
        None if lin else _struct_key(dynamics, keep),
        tuple((k, _struct_key(v, keep))
              for k, v in sorted(static_kw.items())),
        tuple((k, tuple(v.shape), str(getattr(v, "dtype", "?")))
              for k, v in sorted(batch_kw.items())),
        None if smap is None else (
            tuple(smap[0].devices.flat), smap[0].axis_names, smap[1]
        ),
    )
    entry = _SOLVE_CACHE.get(key)
    if entry is None:

        def base(x_init, cost_arrays, dyn_arrays, params, bkw):
            c = QuadCost(*cost_arrays) if quad else cost
            d = LinDx(*dyn_arrays) if lin else dynamics
            return solve(cfg, x_init, c, d, params=params,
                         **static_kw, **bkw)

        if smap is None:
            fn = jax.jit(base)
        else:
            mesh_, ax = smap

            def local(x_init, cost_arrays, dyn_arrays, params, bkw):
                res = base(x_init, cost_arrays, dyn_arrays, params, bkw)
                return res._replace(
                    n_iter=jax.lax.pmax(res.n_iter, ax))

            def wrapped(x_init, cost_arrays, dyn_arrays, params, bkw):
                # user layouts are batch-major only at FULL rank
                # (core/solver.py canonicalizers): C [B,T,n,n] / F
                # [B,T-1,n,m] at ndim 4, c [B,T,n] / f [B,T-1,n] at
                # ndim 3; lower ranks are example-invariant ->
                # replicate. cost/dyn tuples are (C, c) / (F, f).
                def pair_specs(arrs, full_ranks):
                    return tuple(
                        P() if a is None else
                        (P(ax) if a.ndim == fr else P())
                        for a, fr in zip(arrs, full_ranks)
                    )

                in_specs = (
                    P(ax),
                    pair_specs(cost_arrays, (4, 3)),
                    pair_specs(dyn_arrays, (4, 3)),
                    P(),      # params: replicated
                    P(ax),    # per-example kwargs: batch-leading
                )
                out = SolveResult(
                    x=P(ax), u=P(ax), costs=P(ax), converged=P(ax),
                    full_du_norm=P(ax), n_iter=P(),
                )
                return _shard_map(local, mesh_, in_specs, out)(
                    x_init, cost_arrays, dyn_arrays, params, bkw)

            fn = jax.jit(wrapped)

        entry = (fn, tuple(keep))
        _SOLVE_CACHE[key] = entry
        while len(_SOLVE_CACHE) > _SOLVE_CACHE_MAX:
            _SOLVE_CACHE.popitem(last=False)
    else:
        _SOLVE_CACHE.move_to_end(key)
    return entry[0]


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
    use_shard_map: Optional[bool] = None,
    **kwargs,
) -> SolveResult:
    """jit the batched solve with batch-sharded inputs/outputs.

    Batch-major layout makes this a pure data-parallel program: XLA keeps
    every per-example tensor chip-local and inserts collectives only for
    the scalar convergence reductions inside the outer while_loop.

    use_shard_map (default: auto -- on when the fused Pallas path can
    engage on a multi-device mesh): run the solver per-device on local
    shards via jax.shard_map. GSPMD cannot partition a Pallas custom
    call, so this is what makes the fused kernel data-parallel on a real
    multi-chip TPU; the batch-global stopping rule becomes per-shard
    (see _cached_jit_solve). Requires the batch divisible by the mesh
    size."""
    sh = batch_sharding(mesh, axis_name)
    rep = NamedSharding(mesh, P())

    def put(a):
        return None if a is None else jax.device_put(a, sh)

    x_init = put(x_init)
    quad = isinstance(cost, QuadCost)
    lin = isinstance(dynamics, LinDx)

    def put_if(a, full_rank):
        # batch-major only at FULL rank (core/solver.py canonicalizers);
        # lower ranks are example-invariant -> replicate, never shard
        # their leading (time/state) axis
        if a is None:
            return None
        return put(a) if a.ndim == full_rank else jax.device_put(a, rep)

    if quad:
        cost = QuadCost(put_if(cost.C, 4), put_if(cost.c, 3))
    if lin:
        dynamics = LinDx(put_if(dynamics.F, 4), put_if(dynamics.f, 3))
    if params is not None:
        params = jax.device_put(params, rep)

    # Dynamics objects, callable costs, and example-invariant kwargs
    # (e.g. scalar bounds) are closed over the jitted fn so they stay
    # compile-time constants (concrete bounds bake into the fused kernel;
    # see ops/pallas/ilqr_fused._static_bounds). Per-example kwargs
    # ([B,T,nu] warm starts/masks/bounds) travel as batch-sharded
    # ARGUMENTS instead -- see _split_batch_kwargs. The executable cache
    # keys components *structurally* (see _struct_key) in a bounded LRU
    # shared with multihost_solve.
    _, batch_kw = _split_batch_kwargs(kwargs)
    batch_kw = {k: put(jnp.asarray(v)) for k, v in batch_kw.items()}
    if use_shard_map is None:
        # key on the MESH's device platform, not jax.default_backend():
        # under the axon plugin a virtual CPU mesh still reports a "tpu"
        # default backend, but the shard_map fused path compiles Pallas
        # kernels, which only lower for the devices actually in the mesh
        use_shard_map = (
            cfg.backend != "xla"
            and mesh.devices.flat[0].platform == "tpu"
            and mesh.devices.size > 1
        )
    fn = _cached_jit_solve(
        "local", cfg, quad, lin, cost, dynamics, kwargs,
        smap=(mesh, axis_name) if use_shard_map else None,
    )
    return fn(
        x_init,
        tuple(cost) if quad else (),
        tuple(dynamics) if lin else (),
        params,
        batch_kw,
    )
