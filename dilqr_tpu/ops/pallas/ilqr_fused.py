"""Whole-solve fused Pallas TPU kernel: the COMPLETE batched iLQR solve
(reference MPC.forward outer loop, mpc.py:248-301, plus every subroutine it
calls) as ONE kernel invocation per 1024-example batch tile.

Covers n_ctrl <= 8 (closed-form inverses to nu=3, unrolled lane
Gauss-Jordan beyond; pendulum/cartpole swing-up and the 13-state
rocket), QuadCost, callable Dynamics, box bounds (or none -- encoded as
+-inf), f32. Gains come from the exact closed-form 1-D box-QP when
n_ctrl == 1 and from an in-kernel projected-Newton pnqp (reference
pnqp.py:5-82 semantics: clamped active set, masked Hessian + 1e-11 ridge,
per-example Armijo with GAMMA=0.1/decay 0.1/<=10 trials, warm start from
the next timestep's k) with Cramer/adjugate solves otherwise.

Per grid cell (batch-on-lanes layout, see ops/pallas/__init__.py):

  for it in lqr_iter:                       # early-exits via a done flag
    1. open-loop rollout of u + objective   (util.get_traj/get_cost,
                                             util.py:104-153)
    2. linearization F_t = [dx'/dx | dx'/du] via jax.linearize of the env
       step at each point -- exact analytic Jacobians traced INTO the
       kernel (replaces the reference's hand-derived env_dx tensors,
       pendulum.py:127-515, cartpole.py:99-839, rocket.py:324-823)
    3. delta-space cost shift c_back = C tau + c (lqr_step.py:284-295)
    4. backward Riccati recursion (lqr_step.py:52-160)
    5. batched backtracking line search (lqr_step.py:164-261)
    6. per-example best-so-far tracking + stopping rule (mpc.py:266-301)

All intermediate state (trajectory, Jacobians, gains, cost-to-go, best
iterates) lives in VMEM scratch: the solve touches HBM once for inputs and
once for outputs. When the cost is example-invariant ([n,n] or [T,n,n] --
the common case, reference mpc.py:205-226 broadcasts exactly these), its
entries ride in as SMEM scalars: the dominant wrapper cost (transposing a
broadcast [T,B,n,n] into lanes) disappears entirely.

Semantics vs the lax.scan path (core/ilqr.py): identical per-example math;
the only deviation is that the stopping rule's reductions (`max(du) < eps`,
`any(improved)`, line-search `any(worsened)`, pnqp's Newton/Armijo exits)
run per 1024-example base tile instead of over the global batch. Extra
line-search trials are idempotent (unchanged alpha reproduces the same
trial), and extra outer iterations can only improve the best-tracked
result, so results match the global-batch rule whenever both run the same
iterations (e.g. eps=0); when tiles stop early they stop *converged*, so
accepted costs still match to f32 noise. Test-backed:
tests/test_fused_mixed_convergence.py engineers two tiles converging 8
outer iterations apart at eps>0 and asserts per-example cost parity
(<=1e-4 abs) and u-parity on the iteration-matched tile vs the global-rule
XLA path.

Lane widening (W > 1, [8, 128*W] tiles) never changes this granule: every
such reduction runs per base-tile SUBTILE (a sublane-row group, see
_subtiles), a stopped subtile's lanes run alpha=0 fixed-point trials and
accept nothing, and per-subtile counters live in SMEM -- so the widened
kernel is BITWISE equal to W separate launches at ANY eps and the
auto-picked W is not user-observable (tests/test_fused_width.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.base import Dynamics
from ...types import GradMethod, ILQRConfig, LinDx, QuadCost
from ...utils.kernel_math import kernel_context
from .layout import (BT, LaneView, bspec, expand_bound, from_lanes,
                     pad_batch, pad_cost_identity, to_lanes)

MAX_NU = 8  # nu <= 3 uses closed-form inverses, 4..8 unrolled Gauss-Jordan

# perf-bisection hook (scripts/_perf_probe.py): trace-time ablations that
# deliberately BREAK solve semantics to attribute kernel time. Never set
# in production; "" (default) is the real kernel.
#   nolin  -- F := 0 (skips the per-column jvp linearization sweep)
#   noric  -- Riccati loop body reduced to zero-gain writes
import os as _os
_KERNEL_PROBE = _os.environ.get("DILQR_KERNEL_PROBE", "")
if _KERNEL_PROBE not in ("", "nolin", "noric"):
    raise ValueError(
        f"DILQR_KERNEL_PROBE={_KERNEL_PROBE!r} is not a known ablation "
        "(expected 'nolin' or 'noric', or unset); refusing to guess -- "
        "probe values silently change solve semantics"
    )
if _KERNEL_PROBE:
    import warnings as _warnings

    _warnings.warn(
        f"DILQR_KERNEL_PROBE={_KERNEL_PROBE!r}: the fused kernel is "
        "running a timing ABLATION with broken solve semantics; results "
        "are for perf attribution only",
        stacklevel=2,
    )

# pnqp constants (reference pnqp.py:8,33-37)
PNQP_REG = 1e-11
PNQP_GAMMA = 0.1
PNQP_DECAY = 0.1
PNQP_CONV = 1e-4
PNQP_ARMIJO_ITER = 10


def _vmem_bytes(cfg: ILQRConfig, stream_k: bool = False,
                lin_dx: bool = False, lanes_cost: bool = False,
                uz: bool = False, warm: bool = False,
                dyn_bounds: bool = False, bt: int = BT,
                full_stream: bool = False) -> int:
    """Approximate per-tile VMEM footprint (f32 lanes tiles): declared
    scratch (F_t/c_back recomputed at use site, trials cost-only, so only
    trajectory, gains, and trackers persist) plus the Riccati step's live
    temporaries (Q, tmp, F, V and spill margin), which scale with n^2 --
    calibrated against a measured Mosaic allocation of 17.5 MB for the
    rocket at T=40 (10.25 MB scratch + ~7 MB temporaries).

    stream_k: the long-horizon mode keeps only a 2-slot staging buffer for
    K in VMEM and double-buffers the [T, nu, nx] gain stack through HBM
    (async DMA), so the per-timestep cost drops from 2nu+nx+nu*nx tiles to
    2nu+nx -- rocket T=40 fits with ~5 MB to spare."""
    T, nx, nu = cfg.T, cfg.n_state, cfg.n_ctrl
    n = nx + nu
    if full_stream:
        # O(1)-in-T residency: 2-slot staging for XU, TXU, B read, B
        # write (n tiles each), Kk (nu*(nx+1)), plus a 2-slot read stage
        # per present whole-T lane input + V/v/trackers
        scratch = (
            2 * (3 * n + 2 * n + nu * (nx + 1))
            + nx * nx + nx + 3
        )
        if warm:
            scratch += 2 * nu
        if lin_dx:
            scratch += 2 * (nx * n + nx)
        if lanes_cost:
            scratch += 2 * (n * n + n)
        if uz:
            scratch += 2 * nu
        if dyn_bounds:
            scratch += 4 * nu
        temps = 2 * (n * n + 2 * nx * n + nx * nx)
        return (scratch + temps) * bt * 4
    if stream_k:
        per_t = 2 * nu + nx           # u, k, x (K staged, 2 slots)
        k_tiles = 2 * nu * nx
    else:
        per_t = 2 * nu + nx + nu * nx  # u, k, x, K
        k_tiles = 0
    per_t += nx + nu                  # tx/tu trial-trajectory store
    if lin_dx:
        # F (and f) arrive as whole-T VMEM input blocks; Mosaic
        # double-buffers pipelined inputs, hence the factor 2
        per_t += 2 * (nx * n + nx)
    if lanes_cost:
        # per-example cost (cost_small unavailable): C/c whole-T lane
        # input blocks, double-buffered
        per_t += 2 * (n * n + n)
    if uz:
        per_t += 2 * nu
    if warm:
        per_t += 2 * nu
    if dyn_bounds:
        per_t += 2 * 2 * nu  # lb/ub lane inputs, double-buffered
    scratch = (
        T * per_t + k_tiles + nx * nx + nx  # V, v
        + 3                                 # du2, cc, old_cost
    )
    temps = 2 * (n * n + 2 * nx * n + nx * nx)
    return (scratch + temps) * bt * 4


VMEM_SCRATCH_LIMIT = 15 * 1024 * 1024  # of the 16 MB/core


def use_stream_k(cfg: ILQRConfig, lin_dx: bool = False,
                 lanes_cost: bool = False, uz: bool = False,
                 warm: bool = False, dyn_bounds: bool = False,
                 bt: int = BT) -> bool:
    """Long horizons whose full K stack busts the VMEM budget stream K
    through HBM instead of falling back to the ~13x slower XLA scan."""
    extras = dict(lin_dx=lin_dx, lanes_cost=lanes_cost, uz=uz, warm=warm,
                  dyn_bounds=dyn_bounds, bt=bt)
    return (
        _vmem_bytes(cfg, stream_k=False, **extras) > VMEM_SCRATCH_LIMIT
        and _vmem_bytes(cfg, stream_k=True, **extras) <= VMEM_SCRATCH_LIMIT
    )


def _full_stream_ok(extras: dict) -> bool:
    """Full streaming covers EVERY kernel-supported feature set: the
    per-timestep scratch arrays AND all whole-T lane inputs (per-example
    cost, LinDx F/f, warm start, dynamic bounds, u_zero_I) each get a
    read-only 2-slot HBM stream. Kept as a function for symmetry with
    the VMEM gates; the answer is unconditional since round 3 extended
    input streaming."""
    return True


def _mode_at_width(cfg: ILQRConfig, extras: dict, w: int) -> str:
    """Streaming mode at a FIXED lane width (tests pin lanes_width)."""
    if _vmem_bytes(cfg, stream_k=False, bt=BT * w,
                   **extras) <= VMEM_SCRATCH_LIMIT:
        return "none"
    if _vmem_bytes(cfg, stream_k=True, bt=BT * w,
                   **extras) <= VMEM_SCRATCH_LIMIT:
        return "k"
    if _full_stream_ok(extras) and _vmem_bytes(
            cfg, full_stream=True, bt=BT * w, **extras
    ) <= VMEM_SCRATCH_LIMIT:
        return "full"
    return "none"


def _pick_lanes_width(cfg: ILQRConfig, extras: dict, n_base_tiles: int):
    """Choose the lane-widening factor W and the streaming mode.

    Every [8, 128*W] tile op is W independent vregs the Mosaic scheduler
    can interleave in the otherwise single-vreg dependency chains -- but
    the round-4/5 on-chip measurements disconfirmed "prefer the largest
    W": W >= 4 LOSES everywhere (pendulum B=4096 T=20: W=4 3.21 ms vs
    W=1 2.36 ms; B=16384 W=8 9.0 ms vs W=1 5.7 ms -- the wide tiles
    blow the vreg working set and spill), and W=2 wins only for SMALL
    states (pendulum n_tau=4: 1.95 ms vs 2.36 ms at B=4096, 4.16 vs
    5.69 at B=16k) while losing for cartpole n_tau=6 (3.49 vs 2.09 ms).
    At 2 base tiles W=2 leaves a grid of ONE (no cross-tile pipelining)
    and loses even for pendulum (1.59 vs 1.49 ms at T=20).

    Policy (follows the data): W=2 iff n_tau <= 4 AND >= 4 base tiles;
    W=1 otherwise. Streaming-mode fallback order unchanged.
    Returns (W, mode) with mode in {"none", "k", "full"}."""
    if cfg.n_tau <= 4 and n_base_tiles >= 4 and n_base_tiles % 2 == 0:
        widths = (2, 1)
    else:
        widths = (1,)
    for mode, fits in (
        ("none", lambda w: _vmem_bytes(
            cfg, stream_k=False, bt=BT * w, **extras
        ) <= VMEM_SCRATCH_LIMIT),
        ("k", lambda w: _vmem_bytes(
            cfg, stream_k=True, bt=BT * w, **extras
        ) <= VMEM_SCRATCH_LIMIT),
        ("full", lambda w: _full_stream_ok(extras) and _vmem_bytes(
            cfg, full_stream=True, bt=BT * w, **extras
        ) <= VMEM_SCRATCH_LIMIT),
    ):
        for w in widths:
            if fits(w):
                return w, mode
    return 1, "k" if use_stream_k(cfg, **extras) else "none"


def _static_scalar(v):
    """Concrete scalar -> float; None/traced/array -> None."""
    if v is None or isinstance(v, jax.core.Tracer):
        return None
    import numpy as np

    a = np.asarray(v)
    return float(a) if a.ndim == 0 else None


def cost_lane_compatible(cost_fn, n: int, n_cp: int) -> bool:
    """Probe whether a callable cost traces on [n, 8, 128] lane stacks
    with list-of-scalar params, returning a per-lane [8, 128] value, and
    captures no array constants (the same authoring contract as env
    steps: index arithmetic / axis-0 ops)."""
    try:
        st = jax.ShapeDtypeStruct((n, 8, 128), jnp.float32)
        sp = [jax.ShapeDtypeStruct((), jnp.float32)] * n_cp
        closed = jax.make_jaxpr(
            lambda tau, *p: cost_fn(tau, list(p))
        )(st, *sp)
        if closed.out_avals[0].shape != (8, 128):
            return False
        for const in closed.consts:
            if getattr(const, "ndim", 0) > 0 and getattr(
                const, "size", 1
            ) > 1:
                return False
        return True
    except Exception:
        return False


def fused_supported(cfg: ILQRConfig, cost, dyn, params, u_zero_I, delta_u,
                    dtype, cost_small=None, u_init_zero: bool = False,
                    u_lower=None, u_upper=None,
                    callable_cost: bool = False) -> bool:
    lin = isinstance(dyn, LinDx)
    if lin:
        # time-varying affine (LQR) problems: F/f ride in as lane inputs;
        # no linearization, no params
        dyn_ok = True
    else:
        dyn_ok = (
            isinstance(dyn, Dynamics)
            and cfg.grad_method in (GradMethod.ANALYTIC, GradMethod.AUTO_DIFF)
            and dyn.jacobian is None
            and _is_flat_params(params)
        )
    extras = dict(
        lin_dx=lin,
        # per-example QuadCost -> lane inputs; callable costs ride as
        # SMEM scalars and are quadraticized in-kernel
        lanes_cost=cost_small is None and not callable_cost,
        uz=u_zero_I is not None,
        warm=not u_init_zero,
        # concrete bounds bake in as compile-time constants; traced or
        # per-time/per-example bounds ride as two [T, nu] lane inputs
        dyn_bounds=_static_bounds(u_lower, u_upper, cfg.n_ctrl) is None,
    )
    return (
        (isinstance(cost, QuadCost) or callable_cost)
        and dyn_ok
        and 1 <= cfg.n_ctrl <= MAX_NU
        and (delta_u is None or _static_scalar(delta_u) is not None)
        and cfg.qp_solver == "auto"
        and not cfg.unroll
        and cfg.verbose < 1
        and dtype == jnp.float32
        and (
            _vmem_bytes(cfg, stream_k=use_stream_k(cfg, **extras), **extras)
            <= VMEM_SCRATCH_LIMIT
            or (_full_stream_ok(extras)
                and _vmem_bytes(cfg, full_stream=True, **extras)
                <= VMEM_SCRATCH_LIMIT)
        )
    )


def _static_bounds(u_lower, u_upper, nu):
    """Per-control-dim (lower, upper) python-float tuples when both bounds
    are compile-time constants (None | concrete scalar | concrete [nu]);
    None when either is traced or per-time/per-example."""
    import numpy as np

    def conv(val, sign):
        if val is None:
            return (sign * float("inf"),) * nu
        if isinstance(val, jax.core.Tracer):
            return None
        v = np.asarray(val)
        if v.ndim == 0:
            return (float(v),) * nu
        if v.ndim == 1 and v.shape[0] == nu:
            return tuple(float(x) for x in v)
        return None

    lo = conv(u_lower, -1.0)
    hi = conv(u_upper, +1.0)
    if lo is None or hi is None:
        return None
    return (lo, hi)


def lane_compatible(dyn: Dynamics, params, nx: int, nu: int) -> bool:
    """Probe whether the env step traces on batch-on-lanes arrays
    [d, 8, 128] (index-arithmetic envs do; `A @ x`-style closures over
    matrices do not -- those fall back to the XLA path).

    Besides shape compatibility this inspects the probe jaxpr's closure
    constants: Pallas kernels admit scalar captures only, so a step that
    closes over a non-scalar array (e.g. ``A @ x`` with a captured matrix
    of a lane-compatible shape) is rejected here, proactively -- not by
    parsing Mosaic's "captures constants" error text at lowering time."""
    try:
        sx = jax.ShapeDtypeStruct((nx, 8, 128), jnp.float32)
        su = jax.ShapeDtypeStruct((nu, 8, 128), jnp.float32)
        # mirror the kernel exactly: params arrive as a python LIST of
        # scalars (SMEM reads), so whole-array params ops must fail here
        n_params = int(jnp.shape(jnp.asarray(params))[0])
        sp = [jax.ShapeDtypeStruct((), jnp.float32)] * n_params
        for fn in (dyn.step, dyn.linearize_point):
            closed = jax.make_jaxpr(
                lambda x, u, *p, fn=fn: fn(x, u, list(p))
            )(sx, su, *sp)
            out = closed.out_avals[0]
            if out.shape != (nx, 8, 128):
                return False
            for const in closed.consts:
                if getattr(const, "ndim", 0) > 0 and getattr(
                    const, "size", 1
                ) > 1:
                    return False
        return True
    except Exception:
        return False


def _is_flat_params(params) -> bool:
    """True iff params is a single rank-1 array (pytree params -- e.g.
    NNDynamics weight lists -- cannot ride in as SMEM scalars)."""
    if params is None:
        return False
    import numpy as np

    if isinstance(params, (jax.Array, np.ndarray)):
        return params.ndim == 1
    if isinstance(params, jax.core.Tracer):
        return getattr(params, "ndim", None) == 1
    return False


MAX_PYTREE_PARAMS = 256  # SMEM scalars; larger MLPs keep the XLA path


def _flatten_pytree_params(params):
    """Flatten a pytree of arrays (e.g. NNDynamics [(W, b), ...]) to the
    kernel's flat [P] SMEM vector (ravel_pytree order). Returns None when
    params is already flat/None, is not an array pytree, or exceeds
    MAX_PYTREE_PARAMS (each scalar is a separate SMEM read and the lane
    MLP unrolls over them -- program text scales with P). A step that
    cannot consume the scalar list (array math) is rejected downstream by
    the lane_compatible probe, not here."""
    if params is None or _is_flat_params(params):
        return None
    leaves = jax.tree_util.tree_leaves(params)
    if not leaves or not all(
        hasattr(l, "ndim") and hasattr(l, "dtype") for l in leaves
    ):
        return None
    if sum(int(np_prod(l.shape)) for l in leaves) > MAX_PYTREE_PARAMS:
        return None
    from jax.flatten_util import ravel_pytree

    flat, _ = ravel_pytree(params)
    return flat


def np_prod(shape):
    import numpy as np

    return int(np.prod(shape)) if len(shape) else 1


# ---------------------------------------------------------------------------
# subtile reductions: the semantic batch granule is the [8, 128] base tile.
# Lane widening (W > 1) only regroups W base tiles into one program
# instance for ILP -- every reduction that feeds a stopping rule (outer
# convergence, not-improved counting, pnqp Newton/Armijo exits) runs per
# 128-lane subtile so the widened kernel is BITWISE equal to W separate
# launches and the auto-picked W is never user-observable (at any eps).
# ---------------------------------------------------------------------------


def _any_lanes(pred):
    """jnp.any over a bool lanes array, reduced in f32: jnp.any's own
    reduction materializes a 64-bit intermediate under jax_enable_x64,
    and Mosaic can only squeeze 32-bit scalars."""
    return jnp.max(pred.astype(jnp.float32)) > 0.5


def _subtiles(ts):
    """Base-tile SUBLANE-row groups of a [*ts] = [8, 128*W] lanes tile.

    layout.to_lanes reshapes the flat batch row-major into (G, 8, 128*W),
    so a widened tile holds its W base [8, 128] tiles as W consecutive
    groups of 8//W sublane rows (each spanning ALL 128*W lanes) -- NOT as
    128-lane column blocks. Slices index axis -2."""
    n_sub = ts[-1] // 128
    r = ts[-2] // n_sub  # rows per base tile; W in {1,2,4,8} divides 8
    return [slice(w * r, (w + 1) * r) for w in range(n_sub)]


def _sub_mask(flags, ts):
    """Broadcast one scalar per subtile back to a [*ts] lanes array
    (concatenating along the sublane-row axis -2).

    Bool flags move as f32 0/1 and compare back: Mosaic stores i1
    vectors in mask registers and the sublane-offset relayout a W>1
    concat needs lowers to a tpu.bitcast_vreg i1->i32 that
    apply-vector-layout rejects ("Invalid vector register cast",
    surfaced at first on-device compile of the widened kernel)."""
    n_sub = len(flags)
    r = ts[-2] // n_sub
    as_bool = flags[0].dtype == jnp.bool_
    if as_bool and n_sub > 1:
        flags = [f.astype(jnp.float32) for f in flags]
    parts = [
        jnp.broadcast_to(f, tuple(ts[:-2]) + (r, ts[-1])) for f in flags
    ]
    out = parts[0] if n_sub == 1 else jnp.concatenate(parts, axis=-2)
    return out > 0.5 if (as_bool and n_sub > 1) else out


# ---------------------------------------------------------------------------
# small-matrix solves on lanes: A [m,m,8,128] (SPD), b [m,...,8,128]
# ---------------------------------------------------------------------------


def _inv_lanes(A, m):
    """Explicit inverse entries of a (regularized SPD) m x m lane matrix:
    reciprocal / Cramer / adjugate for m <= 3, unrolled Gauss-Jordan for
    4 <= m <= MAX_NU (no pivoting -- sound for the SPD-plus-ridge
    Hessians this kernel inverts, where elimination keeps the pivot
    positive, as in an unpivoted Cholesky)."""
    if m == 1:
        return (1.0 / A[0, 0])[None, None]
    if m == 2:
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        r = 1.0 / det
        return jnp.stack([
            jnp.stack([A[1, 1] * r, -A[0, 1] * r]),
            jnp.stack([-A[1, 0] * r, A[0, 0] * r]),
        ])
    if m > 3:
        a = [[A[i, j] for j in range(m)] for i in range(m)]
        shp = A.shape[2:]
        inv = [[
            jnp.full(shp, 1.0 if i == j else 0.0, A.dtype)
            for j in range(m)
        ] for i in range(m)]
        for k in range(m):
            piv = 1.0 / a[k][k]
            for j in range(m):
                a[k][j] = a[k][j] * piv
                inv[k][j] = inv[k][j] * piv
            for i in range(m):
                if i != k:
                    fct = a[i][k]
                    for j in range(m):
                        a[i][j] = a[i][j] - fct * a[k][j]
                        inv[i][j] = inv[i][j] - fct * inv[k][j]
        return jnp.stack([jnp.stack(row) for row in inv])
    # m == 3: adjugate / det
    c00 = A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1]
    c01 = A[1, 2] * A[2, 0] - A[1, 0] * A[2, 2]
    c02 = A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]
    det = A[0, 0] * c00 + A[0, 1] * c01 + A[0, 2] * c02
    r = 1.0 / det
    c10 = A[0, 2] * A[2, 1] - A[0, 1] * A[2, 2]
    c11 = A[0, 0] * A[2, 2] - A[0, 2] * A[2, 0]
    c12 = A[0, 1] * A[2, 0] - A[0, 0] * A[2, 1]
    c20 = A[0, 1] * A[1, 2] - A[0, 2] * A[1, 1]
    c21 = A[0, 2] * A[1, 0] - A[0, 0] * A[1, 2]
    c22 = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    return jnp.stack([
        jnp.stack([c00 * r, c10 * r, c20 * r]),
        jnp.stack([c01 * r, c11 * r, c21 * r]),
        jnp.stack([c02 * r, c12 * r, c22 * r]),
    ])


def _mv(A, b):
    """A [m,k,8,128] @ b [k,8,128] -> [m,8,128]."""
    return (A * b[None]).sum(1)


def _mm(A, B):
    """A [m,k,8,128] @ B [k,p,8,128] -> [m,p,8,128]."""
    return (A[:, :, None] * B[None]).sum(1)


def _mm_sym(A, B):
    """A [m,k,...] @ B [k,m,...] where the product is KNOWN symmetric
    (e.g. F^T (V F) with V symmetric, K^T (Quu K)): compute only the
    upper triangle and mirror -- saves m(m-1)/2 of the m^2 k-length
    dot products, the dominant Riccati cost at larger n."""
    m = A.shape[0]
    rows = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i, m):
            s = (A[i] * B[:, j]).sum(0)
            rows[i][j] = s
            rows[j][i] = s
    return jnp.stack([jnp.stack(r) for r in rows])


def _pnqp_lanes(H, q, lb, ub, x0, n_iter, nu):
    """In-kernel batched projected-Newton box-QP on lanes (reference
    pnqp.py:5-82; mirrors ops/pnqp.py's masked fixed-shape iteration).

    H [nu,nu,*ts], q/lb/ub/x0 [nu,*ts]. Returns (x, If, H_free)."""
    ts = H.shape[2:]
    eye = jnp.stack(
        [jnp.stack([jnp.full(ts, 1.0 if i == j else 0.0, jnp.float32)
                    for j in range(nu)]) for i in range(nu)]
    )

    def obj(x):
        return 0.5 * (x * _mv(H, x)).sum(0) + (q * x).sum(0)

    x = jnp.clip(x0, lb, ub)

    def newton(x):
        g = _mv(H, x) + q
        Ic = ((x <= lb) & (g > 0.0)) | ((x >= ub) & (g < 0.0))
        # explicit f32: two python-float branches would produce a
        # WEAK f64 lanes array under jax_enable_x64, poisoning the
        # downstream products (Mosaic rejects the f64->f32 cast)
        If = jnp.where(Ic, jnp.float32(0.0), jnp.float32(1.0))
        g_free = g * If
        H_free = H * If[:, None] * If[None] + PNQP_REG * eye
        dx = -_mv(_inv_lanes(H_free, nu), g_free)
        return g, If, H_free, dx

    subs = _subtiles(ts)

    def armijo(x, g, dx, J):
        """Per-lane backtracking (pnqp.py:61-77). J: lanes still stepping;
        inactive lanes carry the GAMMA+1e-6 sentinel (reference quirk).
        The max(armijo) > GAMMA exit runs PER 128-lane SUBTILE (carried as
        one scalar each); an exited subtile's alpha/mx freeze so a widened
        tile is bitwise-equal to W separate base tiles."""
        sentinel = jnp.full(ts, PNQP_GAMMA + 1e-6, jnp.float32)
        ox = obj(x)

        def trial(alpha):
            mx = jnp.clip(x + alpha[None] * dx, lb, ub)
            num = ox - obj(mx)
            den = (g * (x - mx)).sum(0)
            arm = jnp.where(J, num / den, sentinel)
            return mx, arm

        def cond(carry):
            _, _, max_arms, i = carry
            # exit as soon as max(armijo) > GAMMA (the reference quirk,
            # pnqp.py:61-77), per subtile; loop while ANY subtile is under
            unfinished = max_arms[0] <= PNQP_GAMMA
            for ma in max_arms[1:]:
                unfinished = unfinished | (ma <= PNQP_GAMMA)
            return unfinished & (i < PNQP_ARMIJO_ITER)

        def body(carry):
            alpha, mx, max_arms, i = carry
            nmx, arm = trial(alpha)
            act = tuple(ma <= PNQP_GAMMA for ma in max_arms)
            actm = _sub_mask(act, ts)
            mx = jnp.where(actm, nmx, mx)
            alpha = jnp.where(actm & (arm <= PNQP_GAMMA),
                              alpha * PNQP_DECAY, alpha)
            max_arms = tuple(
                jnp.where(a, jnp.max(arm[..., sl, :]), ma)
                for a, sl, ma in zip(act, subs, max_arms)
            )
            return alpha, mx, max_arms, i + 1

        a0 = jnp.ones(ts, jnp.float32)
        ma0 = tuple(
            jnp.full((), PNQP_GAMMA, jnp.float32) for _ in subs
        )
        _, mx, _, _ = lax.while_loop(cond, body, (a0, x, ma0, jnp.int32(0)))
        return mx

    def outer_cond(carry):
        _, _, _, done, i = carry
        all_done = done[0]
        for d in done[1:]:
            all_done = all_done & d
        return jnp.logical_not(all_done) & (i < n_iter)

    def outer(carry):
        x, If_prev, Hf_prev, done, i = carry
        g, If, H_free, dx = newton(x)
        J = jnp.sqrt((dx * dx).sum(0)) >= PNQP_CONV
        # per-subtile convergence; a done subtile's x freezes, so its
        # recomputed newton()/If/H_free are idempotent thereafter
        # (slice J as f32: a sublane slice of an i1 mask vreg needs a
        # bitcast relayout Mosaic rejects, same hazard as _sub_mask)
        Jf = J.astype(jnp.float32)
        done = tuple(
            d | ~_any_lanes(Jf[..., sl, :]) for d, sl in zip(done, subs)
        )
        new_x = armijo(x, g, dx, J)
        x = jnp.where(_sub_mask(done, ts), x, new_x)
        return x, If, H_free, done, i + 1

    # early-exit per SUBTILE once every lane's Newton step is small
    # (reference pnqp.py:56-59); identical iterates to the masked
    # fixed-trip version, minus the discarded work
    g0, If0, Hf0, _ = newton(x)
    x, If, H_free, _, _ = lax.while_loop(
        outer_cond, outer,
        (x, If0, Hf0, tuple(jnp.full((), False) for _ in subs),
         jnp.int32(0)),
    )
    return x, If, H_free


def _full_input_streams(cost_mode, lin_dx, f_present, u0_zero,
                        dyn_bounds, uz_present, nx, nu):
    """Ordered (name, present, small_shape) of the whole-T lane INPUTS
    the full streaming mode stages through HBM (read-only 2-slot
    double-buffering; inputs arrive grid-major [G, T, *small, *ts])."""
    n = nx + nu
    return (
        ("C", cost_mode == "lanes", (n, n)),
        ("c", cost_mode == "lanes", (n,)),
        ("F", lin_dx, (nx, n)),
        ("f", lin_dx and f_present, (nx,)),
        ("u0", not u0_zero, (nu,)),
        ("lb", dyn_bounds, (nu,)),
        ("ub", dyn_bounds, (nu,)),
        ("uz", uz_present, (nu,)),
    )


def _ilqr_kernel(
    # statics bound via partial:
    T, nx, nu, n_params, lqr_iter, pnqp_iter, eps, ls_decay, max_ls_iter,
    best_cost_eps, not_improved_lim, step_fn, lin_fn, jac_fn, cost_mode,
    u0_zero, bounds_static, stream_k, uz_present, delta_u_static, unbounded,
    lin_dx, f_present, cost_fn, n_cost_params, ts,
    *refs,
):
    """cost_mode: "lanes" (C_ref/c_ref per-example lane tensors) or "smem"
    (Cs_ref (Tc, n*n) / cs_ref (Tc, n) SMEM scalars, Tc in {1, T}).
    u0_zero: warm start is zeros -> no u0 input ref.
    stream_k: the streaming mode -- False/"none" (everything VMEM-resident),
    True/"k" (gains live in an HBM buffer, an extra raw output K_hbm,
    staged through a 2-slot VMEM buffer with async DMA -- see
    use_stream_k), or "full" (EVERY per-timestep array -- trajectory,
    gains, trial, best, AND all whole-T lane inputs: per-example cost,
    LinDx F/f, warm start, dynamic bounds, u_zero_I -- double-buffered
    through HBM, so VMEM residency is O(1) in T and any horizon fits for
    any kernel-supported feature set).
    uz_present: a [T, nu] 0/1 lane input forces u_i = 0 -- masked gains
    when unbounded (reference lqr_step.py:99-127), rollout masking always
    (lqr_step.py:197-198). delta_u_static: scalar trust region intersected
    into the QP delta bounds (lqr_step.py:132-135) and the rollout clamp
    around the current iterate (lqr_step.py:200-213)."""
    n = nx + nu
    f32 = jnp.float32
    stream = {False: "none", True: "k"}.get(stream_k, stream_k)
    full = stream == "full"

    it_r = iter(refs)
    params_ref = next(it_r)
    xi_ref = next(it_r)
    if cost_mode == "lanes":
        C_ref = next(it_r)
        c_ref = next(it_r)
    elif cost_mode == "callable":
        cp_ref = next(it_r)  # cost params, SMEM (1, max(n_cost_params, 1))
    else:
        Cs_ref = next(it_r)
        cs_ref = next(it_r)
    if lin_dx:
        # time-varying affine dynamics as lane inputs (zero F slab at
        # t = T-1 supplied by the driver)
        F_ref = next(it_r)                       # [T,nx,n,...]
        f_ref = next(it_r) if f_present else None  # [T,nx,...]
    u0_ref = None if u0_zero else next(it_r)  # full mode: raw HBM [G,T,nu,*ts]
    if bounds_static is None:
        lb_ref = next(it_r)
        ub_ref = next(it_r)
    uz_ref = next(it_r) if uz_present else None
    if full:
        bx_ref = bu_ref = None
    else:
        bx_ref = next(it_r)
        bu_ref = next(it_r)
    bc_ref = next(it_r)
    bdu_ref = next(it_r)
    it_ref = next(it_r)
    if full:
        # raw HBM buffers (outputs only because Pallas has no HBM scratch;
        # B_hbm [G,T,n,*ts] is the real bx/bu output, packed)
        B_hbm = next(it_r)
        Kk_hbm = next(it_r)    # [G,T,nu,nx+1,*ts]
        XU_hbm = next(it_r)    # [G,T,n,*ts]
        TXU_hbm = next(it_r)   # [G,T,n,*ts]
        xu_st = next(it_r)     # [2,n,*ts] staging
        txu_st = next(it_r)
        kk_st = next(it_r)     # [2,nu,nx+1,*ts]
        br_st = next(it_r)     # [2,n,*ts] best read staging
        bw_st = next(it_r)     # [2,n,*ts] best write staging
        # optional input read-streams, in _full_input_streams order
        in_st = {
            name: next(it_r)
            for name, present, _ in _full_input_streams(
                cost_mode, lin_dx, f_present, u0_zero,
                bounds_static is None, uz_present, nx, nu)
            if present
        }
        K_hbm_ref = u_ref = x_ref = K_ref = k_ref = None
        tx_ref = tu_ref = None
    else:
        K_hbm_ref = next(it_r) if stream == "k" else None
        u_ref = next(it_r)
        x_ref = next(it_r)
        K_ref = next(it_r)  # VMEM [T,nu,nx,...] or 2-slot staging
        k_ref = next(it_r)
    V_ref = next(it_r)
    v_ref = next(it_r)
    if not full:
        tx_ref = next(it_r)   # [T,nx,...] last trial's states
        tu_ref = next(it_r)   # [T,nu,...] last trial's controls
    du2s_ref = next(it_r)  # alpha=1 trial's du^2 (full_du_norm)
    cc_ref = next(it_r)
    oc_ref = next(it_r)
    flags_ref = next(it_r)
    if stream == "k":
        wsem = next(it_r)
        rsem = next(it_r)
    elif full:
        xu_sem = next(it_r)
        txu_sem = next(it_r)
        kk_sem = next(it_r)
        br_sem = next(it_r)
        bw_sem = next(it_r)
        in_sem = {
            name: next(it_r)
            for name, present, _ in _full_input_streams(
                cost_mode, lin_dx, f_present, u0_zero,
                bounds_static is None, uz_present, nx, nu)
            if present
        }

    # --- per-timestep array storage strategy --------------------------------
    # "none": direct VMEM scratch indexing. "k": only the [T,nu,nx] gain
    # stack streams through HBM. "full": trajectory (XU = x|u packed),
    # gains (Kk = K|k packed), trial (TXU), and best (B) ALL stream through
    # HBM with the same 2-slot double-buffered async-DMA pattern -- a
    # writing sweep stores t via staging slot t%2 (waiting for the copy
    # issued two steps ago before reusing the slot), a reading sweep
    # prefetches the next step's tile into the other slot while consuming
    # slot t%2 -- so DMA rides under the env-step/objective compute and
    # VMEM residency is O(1) in T (any horizon fits).
    if full:
        g_id = pl.program_id(0)

        def _mk_stream(hbm, st, sem):
            """2-slot double-buffered HBM<->VMEM staging for one [T,*elem]
            per-tile array. Sweeps must be sequential in t (d = +1/-1);
            read and write phases of one stream must not overlap (the B
            read-modify-write uses two streams on the same HBM buffer)."""

            def w(slot, t):
                return pltpu.make_async_copy(
                    st.at[slot], hbm.at[g_id, t], sem.at[slot]
                )

            def r(slot, t):
                return pltpu.make_async_copy(
                    hbm.at[g_id, t], st.at[slot], sem.at[slot]
                )

            def read_begin(t0):
                r(lax.rem(t0, 2), t0).start()

            def read_at(t, d):
                nt = t + d

                @pl.when((nt >= 0) & (nt < T))
                def _():
                    r(lax.rem(nt, 2), nt).start()

                slot = lax.rem(t, 2)
                r(slot, t).wait()
                return st[slot]

            def write(t, val, d):
                slot = lax.rem(t, 2)
                to = t - 2 * d  # this slot's previous write, two steps ago

                @pl.when((to >= 0) & (to < T))
                def _():
                    w(slot, to).wait()

                st[slot] = val
                w(slot, t).start()

            def write_flush(d):
                for tj in ((1, 0) if d < 0 else (T - 2, T - 1)):
                    if 0 <= tj < T:
                        w(tj % 2, tj).wait()

            return read_begin, read_at, write, write_flush

        xu_begin, _xu_read, _xu_put, xu_flush = _mk_stream(
            XU_hbm, xu_st, xu_sem)
        txu_begin, _txu_read, _txu_put, txu_flush = _mk_stream(
            TXU_hbm, txu_st, txu_sem)
        _kk_begin, _kk_read, _kk_put, _kk_flush = _mk_stream(
            Kk_hbm, kk_st, kk_sem)
        b_begin, _b_read, _, _ = _mk_stream(B_hbm, br_st, br_sem)
        _, _, _b_put, b_flush = _mk_stream(B_hbm, bw_st, bw_sem)

        # read-only streams over the whole-T lane INPUTS (grid-major HBM
        # refs); each sweep begins exactly the streams it will read
        _in_hbm = {
            "C": C_ref if cost_mode == "lanes" else None,
            "c": c_ref if cost_mode == "lanes" else None,
            "F": F_ref if lin_dx else None,
            "f": f_ref if (lin_dx and f_present) else None,
            "u0": u0_ref,
            "lb": lb_ref if bounds_static is None else None,
            "ub": ub_ref if bounds_static is None else None,
            "uz": uz_ref,
        }
        in_begin, in_read = {}, {}
        for _nm, _present, _ in _full_input_streams(
                cost_mode, lin_dx, f_present, u0_zero,
                bounds_static is None, uz_present, nx, nu):
            if _present:
                _rb, _ra, _, _ = _mk_stream(
                    _in_hbm[_nm], in_st[_nm], in_sem[_nm])
                in_begin[_nm], in_read[_nm] = _rb, _ra

        def begin_inputs(names, t0):
            for _nm2 in names:
                if _nm2 in in_begin:
                    in_begin[_nm2](t0)

        def xu_at(t, d):
            xu = _xu_read(t, d)
            return xu[:nx], xu[nx:]

        def xu_write(t, xt, ut, d):
            _xu_put(t, jnp.concatenate([xt, ut], axis=0), d)

        def kk_write(i, t, K, kt):
            _kk_put(t, jnp.concatenate([K, kt[:, None]], axis=1), -1)

        def kk_flush():
            _kk_flush(-1)

        def kk_begin():
            _kk_begin(0)

        def kk_at(t):
            kk = _kk_read(t, 1)
            return kk[:, :nx], kk[:, nx]

        def k_warm(t):
            # the backward step for t+1 just wrote staging slot (t+1)%2;
            # the in-flight DMA only reads it, so the value is still there
            return kk_st[lax.rem(t + 1, 2), :, nx]

        def txu_put(t, xt, ut):
            _txu_put(t, jnp.concatenate([xt, ut], axis=0), 1)

        def txu_get(t):
            txu = _txu_read(t, 1)
            return txu[:nx], txu[nx:]

        def b_accept(t, improved, xt, ut):
            old = _b_read(t, 1)
            new = jnp.concatenate([xt, ut], axis=0)
            _b_put(t, jnp.where(improved[None], new, old), 1)

    else:
        if stream == "k":
            g_id = pl.program_id(0)

            def _wdma(slot, t):
                return pltpu.make_async_copy(
                    K_ref.at[slot], K_hbm_ref.at[g_id, t], wsem.at[slot]
                )

            def _rdma(slot, t):
                return pltpu.make_async_copy(
                    K_hbm_ref.at[g_id, t], K_ref.at[slot], rsem.at[slot]
                )

            def k_write(i, t, K):
                slot = lax.rem(i, 2)

                @pl.when(i >= 2)
                def _():
                    _wdma(slot, t + 2).wait()

                K_ref[slot] = K
                _wdma(slot, t).start()

            def k_write_flush():
                for j in range(max(T - 2, 0), T):
                    _wdma(j % 2, T - 1 - j).wait()

            def k_sweep_begin():
                _rdma(0, 0).start()

            def K_at(t):
                @pl.when(t + 1 < T)
                def _():
                    _rdma(lax.rem(t + 1, 2), t + 1).start()

                slot = lax.rem(t, 2)
                _rdma(slot, t).wait()
                return K_ref[slot]
        else:

            def k_write(i, t, K):
                K_ref[t] = K

            def k_write_flush():
                pass

            def k_sweep_begin():
                pass

            def K_at(t):
                return K_ref[t]

        # uniform accessors over the VMEM scratch (no-op begins/flushes)
        def xu_at(t, d):
            return x_ref[t], u_ref[t]

        def xu_write(t, xt, ut, d):
            x_ref[t] = xt
            u_ref[t] = ut

        xu_begin = lambda t0: None
        xu_flush = lambda d: None

        def kk_write(i, t, K, kt):
            k_write(i, t, K)
            k_ref[t] = kt

        kk_flush = k_write_flush
        kk_begin = k_sweep_begin

        def kk_at(t):
            return K_at(t), k_ref[t]

        def k_warm(t):
            return k_ref[jnp.minimum(t + 1, T - 1)]

        def txu_put(t, xt, ut):
            tx_ref[t] = xt
            tu_ref[t] = ut

        def txu_get(t):
            return tx_ref[t], tu_ref[t]

        txu_begin = lambda t0: None
        txu_flush = lambda d: None
        b_begin = lambda t0: None
        b_flush = lambda d: None
        begin_inputs = lambda names, t0: None

        def b_accept(t, improved, xt, ut):
            bx_ref[t] = jnp.where(improved[None], xt, bx_ref[t])
            bu_ref[t] = jnp.where(improved[None], ut, bu_ref[t])

    if cost_mode == "lanes":
        if full:
            Cmat = lambda t, d=1: in_read["C"](t, d)   # [n,n,*ts]
            cvec = lambda t, d=1: in_read["c"](t, d)   # [n,*ts]
        else:
            Cmat = lambda t, d=1: C_ref[t]
            cvec = lambda t, d=1: c_ref[t]
    elif cost_mode == "callable":
        # user cost_fn(tau, params) -> per-lane scalar, authored with
        # index arithmetic / axis-0 ops so it traces on [n, 8, 128] lane
        # stacks just like the env steps. The true cost backs the
        # rollout/line-search objectives directly; the Riccati stage
        # quadraticizes it in-kernel (see quad_at).
        cps = [cp_ref[0, i] for i in range(n_cost_params)]
        Cmat = cvec = None

        def cost_eval(tau):
            return cost_fn(tau, cps)

        def basis_n(hot):
            return jnp.stack([
                jnp.full(ts, 1.0 if a == hot else 0.0, f32)
                for a in range(n)
            ])

        def quad_at(tau):
            """(H, g) of the cost at tau: forward-over-forward one-hot
            probes (n jvp's for g, n more of the gradient map for H --
            reference approximate_cost semantics, mpc.py:447-487; in
            delta space C tau + c collapses to g, so the Riccati only
            needs (H, g))."""

            def gradf(tv):
                _, jvp1 = jax.linearize(cost_eval, tv)
                return jnp.stack([jvp1(basis_n(i)) for i in range(n)])

            g, jvp2 = jax.linearize(gradf, tau)
            H = jnp.stack([jvp2(basis_n(j)) for j in range(n)], axis=1)
            return H, g
    else:
        per_t = Cs_ref.shape[0] > 1
        diag = cost_mode == "diag"

        def Cmat(t, d=1):
            ti = t if per_t else 0
            if diag:
                # off-diagonals are literal zeros -- Mosaic/XLA fold the
                # multiplies/adds they feed, so a diagonal cost (the common
                # get_true_obj spec) costs O(n) not O(n^2) per use
                return jnp.stack([
                    jnp.stack([
                        jnp.broadcast_to(Cs_ref[ti, i], ts)
                        if i == j else jnp.zeros(ts, f32)
                        for j in range(n)
                    ])
                    for i in range(n)
                ])
            return jnp.stack([
                jnp.stack([
                    jnp.broadcast_to(Cs_ref[ti, i * n + j], ts)
                    for j in range(n)
                ])
                for i in range(n)
            ])

        def cvec(t, d=1):
            ti = t if per_t else 0
            return jnp.stack([
                jnp.broadcast_to(cs_ref[ti, i], ts) for i in range(n)
            ])

    params = [params_ref[0, i] for i in range(n_params)]
    x_init = xi_ref[...]

    if bounds_static is None:
        if full:
            lb_at = lambda t, d=1: in_read["lb"](t, d)
            ub_at = lambda t, d=1: in_read["ub"](t, d)
        else:
            lb_at = lambda t, d=1: lb_ref[t]
            ub_at = lambda t, d=1: ub_ref[t]
    else:
        # example-invariant bounds baked in as compile-time constants
        lbc, ubc = bounds_static
        lb_const = jnp.stack([jnp.full(ts, v, f32) for v in lbc])
        ub_const = jnp.stack([jnp.full(ts, v, f32) for v in ubc])
        lb_at = lambda t, d=1: lb_const
        ub_at = lambda t, d=1: ub_const

    if uz_present:
        uz_at = (lambda t, d=1: in_read["uz"](t, d)) if full \
            else (lambda t, d=1: uz_ref[t])

    if not full:
        if u0_zero:
            u_ref[...] = jnp.zeros(u_ref.shape, f32)
        else:
            u_ref[...] = u0_ref[...]
        bx_ref[...] = jnp.zeros(bx_ref.shape, f32)
        bu_ref[...] = jnp.zeros(bu_ref.shape, f32)
    else:
        # B_hbm must be zero-initialized like bx/bu above: bc = inf does
        # NOT guarantee a first-iteration accept for a lane whose trial
        # cost is NaN (NaN <= inf is false), and b_accept is a
        # read-modify-write -- without this sweep such a lane would
        # return uninitialized HBM instead of the zeros the VMEM modes
        # return. One T-sweep of write DMAs, once per solve.
        def _b_init(t, _c):
            _b_put(t, jnp.zeros((n,) + tuple(ts), f32), 1)
            return 0

        lax.fori_loop(0, T, _b_init, 0)
        b_flush(1)
    bc_ref[...] = jnp.full(ts, jnp.inf, f32)
    bdu_ref[...] = jnp.full(ts, jnp.inf, f32)
    # flags layout: [0] all-subtiles-stopped latch (gates the outer body);
    # per base-tile subtile w of n_sub = ts[-1]//128 (a sublane-row group,
    # see _subtiles): [1+w] stopped, [1+n_sub+w] not-improved count,
    # [1+2*n_sub+w] iterations executed. The stopping rule runs per
    # subtile so W>1 is bitwise-equal to W=1.
    n_sub = ts[-1] // 128
    subs = _subtiles(ts)
    flags_ref[0] = 0
    for w in range(n_sub):
        flags_ref[1 + w] = 0
        flags_ref[1 + n_sub + w] = 0
        flags_ref[1 + 2 * n_sub + w] = 0

    if lin_dx:
        # step_t only runs in FORWARD sweeps (roll/trial); the backward
        # sweep reads F through F_at with d=-1
        F_at = (lambda t, d=1: in_read["F"](t, d)) if full \
            else (lambda t, d=1: F_ref[t])
        if f_present:
            f_at = (lambda t: in_read["f"](t, 1)) if full \
                else (lambda t: f_ref[t])

        def step_t(t, xt, ut):
            tau = jnp.concatenate([xt, ut], axis=0)
            nxt = _mv(F_at(t), tau)
            if f_present:
                nxt = nxt + f_at(t)
            return nxt
    else:
        step = lambda x, u: step_fn(x, u, params)   # clamped true dynamics
        lin_step = lambda x, u: lin_fn(x, u, params)  # linearization point
        step_t = lambda t, xt, ut: step(xt, ut)

    def obj_t(t, xt, ut):
        tau = jnp.concatenate([xt, ut], axis=0)    # [n,8,128]
        if cost_mode == "callable":
            return cost_eval(tau)  # the TRUE cost (lqr_step.py:230-239)
        Ct = Cmat(t)
        return 0.5 * (tau * _mv(Ct, tau)).sum(0) + (cvec(t) * tau).sum(0)

    # ---- 1) initial open-loop rollout + objective (once; afterwards the
    # accept pass maintains x_ref/u_ref and their cost, util.py:104-153) ----
    begin_inputs(("u0", "C", "c", "F", "f"), 0)

    def roll(t, carry):
        xt, cost = carry
        if full:
            ut = (jnp.zeros((nu,) + ts, f32) if u0_zero
                  else in_read["u0"](t, 1))
            xu_write(t, xt, ut, 1)
        else:
            x_ref[t] = xt
            ut = u_ref[t]
        cost = cost + obj_t(t, xt, ut)
        return step_t(t, xt, ut), cost

    _, oc0 = lax.fori_loop(0, T, roll, (x_init, jnp.zeros(ts, f32)))
    xu_flush(1)
    oc_ref[...] = oc0

    def outer_body(it, _):
        @pl.when(flags_ref[0] == 0)
        def _():
            old_cost = oc_ref[...]
            # per-subtile running masks: a stopped subtile's lanes run
            # with alpha = 0 (the trial reproduces the frozen iterate
            # bitwise) and accept nothing, exactly as if their base tile
            # had exited its own kernel instance
            run_w = [flags_ref[1 + w] == 0 for w in range(n_sub)]
            act = _sub_mask(tuple(run_w), ts)

            # ---- 2+3+4) backward Riccati (lqr_step.py:52-160) with the
            # linearization F_t = jax.linearize(step) and the delta-space
            # shift c_back = C tau + c (mpc.py:489-543, lqr_step.py:284-295)
            # computed AT THE USE SITE -- no [T, nx, n] Jacobian buffer ----
            V_ref[...] = jnp.zeros(V_ref.shape, f32)
            v_ref[...] = jnp.zeros(v_ref.shape, f32)

            xu_begin(T - 1)
            ric_ins = ["C", "c", "F", "lb", "ub"]
            if unbounded and uz_present:
                ric_ins.append("uz")
            begin_inputs(ric_ins, T - 1)

            def ric_body(i, _c):
                t = T - 1 - i
                if _KERNEL_PROBE == "noric":  # timing ablation only
                    kk_write(i, t, jnp.zeros((nu, nx) + ts, f32),
                             jnp.zeros((nu,) + ts, f32))
                    return 0
                V = V_ref[...]           # [nx,nx,8,128]
                v = v_ref[...]           # [nx,8,128]
                xt, ut = xu_at(t, -1)

                # F_t (zero slab at t = T-1: V_T = 0 makes it inert).
                # Inline one-hot jvp per column: a fori over columns with
                # dynamic FT writes was measured ~30% slower per iteration
                # (loop overhead + lost cross-column fusion) with no fixed-
                # cost win, so the n unrolled applications stay.
                def basis(size, hot):
                    return jnp.stack([
                        jnp.full(ts, 1.0 if a == hot else 0.0, f32)
                        for a in range(size)
                    ])

                def lin_at(xt, ut):
                    _, jvp = jax.linearize(lin_step, xt, ut)
                    cols = []
                    for j in range(n):
                        if j < nx:
                            cols.append(jvp(basis(nx, j), basis(nu, -1)))
                        else:
                            cols.append(
                                jvp(basis(nx, -1), basis(nu, j - nx)))
                    return jnp.stack(cols, axis=1)  # [nx,n,8,128]

                if lin_dx:
                    F = F_at(t, -1)  # zero slab at t = T-1 supplied as data
                elif _KERNEL_PROBE == "nolin":  # timing ablation only
                    F = jnp.zeros((nx, n) + ts, f32)
                elif jac_fn is not None:
                    # hand-derived shared-subexpression Jacobian of the
                    # ANALYTIC linearization point (models/base.py
                    # jac_lanes; jacfwd-oracle-tested) -- ~3x fewer ops
                    # than the n one-hot jvp sweeps below.
                    # f32-pinned zero: a python-float branch promotes to
                    # a strong f64 under jax_enable_x64 (no Mosaic cast)
                    F = jnp.where(t < T - 1, jac_fn(xt, ut, params),
                                  f32(0.0))
                else:
                    F = jnp.where(t < T - 1, lin_at(xt, ut), f32(0.0))
                tau = jnp.concatenate([xt, ut], axis=0)
                if cost_mode == "callable":
                    # per-iteration quadraticization (mpc.py:447-487);
                    # delta-space C tau + c = the gradient g
                    Ct, cb = quad_at(tau)
                else:
                    Ct = Cmat(t, -1)
                    cb = _mv(Ct, tau) + cvec(t, -1)

                tmp = _mm(jnp.swapaxes(V, 0, 1), F)       # V^T F = V F
                FT = jnp.swapaxes(F, 0, 1)                # [n,nx,8,128]
                # F^T V F is symmetric (V is); triangle + mirror
                Q = Ct + _mm_sym(FT, tmp)                 # [n,n,8,128]
                q = cb + _mv(FT, v)                       # [n,8,128]

                Qxx = Q[:nx, :nx]
                Qxu = Q[:nx, nx:]
                Qux = Q[nx:, :nx]
                Quu = Q[nx:, nx:]
                qx = q[:nx]
                qu = q[nx:]
                lb = lb_at(t, -1) - ut
                ub = ub_at(t, -1) - ut
                if delta_u_static is not None:
                    # trust region intersected into the delta-space QP
                    # bounds (lqr_step.py:132-135)
                    lb = jnp.maximum(lb, -delta_u_static)
                    ub = jnp.minimum(ub, delta_u_static)

                if unbounded and uz_present:
                    # zero-control equality constraints (lqr_step.py:99-127,
                    # the reference's unbounded branch; boxed solves ignore
                    # the mask in the backward): free-subspace solve with
                    # the masked Hessian + 1e-8 on frozen diagonals
                    Iz = uz_at(t, -1)                    # [nu,*ts]
                    notI = 1.0 - Iz
                    qu_ = qu * notI
                    eyeI = jnp.stack([
                        jnp.stack([
                            Iz[a] if a == b else jnp.zeros(ts, f32)
                            for b in range(nu)
                        ]) for a in range(nu)
                    ])
                    H_free = Quu * notI[:, None] * notI[None] + 1e-8 * eyeI
                    If = notI
                    if nu == 1:
                        # reference quirk (lqr_step.py:121-123): k divides
                        # by the UNmasked Quu
                        kt = -qu_ / Quu[0, 0]
                    else:
                        kt = -_mv(_inv_lanes(H_free, nu), qu_)
                elif nu == 1:
                    # exact closed-form 1-D box-QP (see ops/riccati.py)
                    H = Quu[0, 0]
                    kt = jnp.clip(-qu / H, lb, ub)
                    g = H * kt[0] + qu[0]
                    Ic = ((kt[0] <= lb[0]) & (g > 0.0)) | (
                        (kt[0] >= ub[0]) & (g < 0.0))
                    If = jnp.where(
                        Ic, jnp.float32(0.0), jnp.float32(1.0)
                    )[None]  # f32-pinned: see _pnqp_lanes.newton
                    H_free = (H * If[0] + PNQP_REG)[None, None]
                else:
                    # warm start with next timestep's k (lqr_step.py:135-137)
                    Hinv0 = _inv_lanes(Quu + PNQP_REG * jnp.stack(
                        [jnp.stack([jnp.full(ts,
                                             1.0 if a == b else 0.0, f32)
                                    for b in range(nu)]) for a in range(nu)]
                    ), nu)
                    default_init = -_mv(Hinv0, qu)
                    # warm index clamped so the t = T-1 read stays in
                    # bounds; the where() discards it there
                    warm = jnp.where(
                        t < T - 1,
                        k_warm(t),
                        jnp.clip(default_init, lb, ub),
                    )
                    kt, If, H_free = _pnqp_lanes(
                        Quu, qu, lb, ub, warm, pnqp_iter, nu
                    )

                # zero active rows of Q_ux before forming K
                # (lqr_step.py:142-148)
                Qux_m = Qux * If[:, None]
                Hinv = _inv_lanes(H_free, nu)
                K = -_mm(Hinv, Qux_m)                     # [nu,nx,8,128]

                KT = jnp.swapaxes(K, 0, 1)                # [nx,nu,8,128]
                # K^T Qux = (Qxu K)^T (Q symmetric) and K^T Quu K is
                # symmetric: one product + mirror instead of three
                M = _mm(Qxu, K)
                Vn = (Qxx + M + jnp.swapaxes(M, 0, 1)
                      + _mm_sym(KT, _mm(Quu, K)))
                # v' = qx + Qxu k + K^T (qu + Quu k)
                vn = qx + _mv(Qxu, kt) + _mv(KT, qu + _mv(Quu, kt))
                V_ref[...] = Vn
                v_ref[...] = vn
                kk_write(i, t, K, kt)
                return 0

            lax.fori_loop(0, T, ric_body, 0)
            kk_flush()

            # ---- 5) batched backtracking line search ----
            # ONE traced instance of the trial sweep (initial alpha=1 trial
            # and backtracking re-trials share it via the i==0 guard --
            # program text is the kernel's per-call fixed cost), recording
            # the candidate trajectory into tx/tu scratch so the accept
            # pass is a pure copy instead of a third env-step sweep. The
            # last executed trial's alpha IS alpha_used per lane, so the
            # stored trajectory is exactly what the old recompute produced.
            def trial_step(t, xt, xrt, urt, alpha):
                dxt = xt - xrt
                Kt, kt = kk_at(t)
                new_u = _mv(Kt, dxt) + urt + alpha[None] * kt
                if uz_present:
                    # zero masked coords BEFORE clamping (the reference's
                    # order, lqr_step.py:197-213)
                    new_u = new_u * (1.0 - uz_at(t, 1))
                lo, hi = lb_at(t, 1), ub_at(t, 1)
                if delta_u_static is not None:
                    # clamp widened around the current iterate
                    # (lqr_step.py:203-211)
                    lo = jnp.maximum(urt - delta_u_static, lo)
                    hi = jnp.minimum(urt + delta_u_static, hi)
                new_u = jnp.clip(new_u, lo, hi)
                return new_u

            def trial(alpha):
                def tbody(t, carry):
                    xt, cost, du2 = carry
                    xrt, urt = xu_at(t, 1)
                    new_u = trial_step(t, xt, xrt, urt, alpha)
                    d = urt - new_u
                    du2 = du2 + (d * d).sum(0)
                    txu_put(t, xt, new_u)
                    cost = cost + obj_t(t, xt, new_u)
                    return step_t(t, xt, new_u), cost, du2

                kk_begin()
                xu_begin(0)
                begin_inputs(
                    ("C", "c", "F", "f", "lb", "ub", "uz"), 0)
                z = jnp.zeros(ts, f32)
                _, cost, du2 = lax.fori_loop(0, T, tbody, (x_init, z, z))
                txu_flush(1)
                return cost, du2

            def ls_body(i, alpha):
                # i == 0 is the unconditional alpha=1 trial whose du2 is
                # full_du_norm (lqr_step.py:243-245); later iterations
                # re-trial only while some lane's cost worsened
                active = (i == 0) | _any_lanes(cc_ref[...] > old_cost)

                @pl.when(active)
                def _():
                    cc, du2 = trial(alpha)
                    cc_ref[...] = cc

                    @pl.when(i == 0)
                    def _():
                        du2s_ref[...] = du2

                return jnp.where(cc_ref[...] > old_cost, alpha * ls_decay,
                                 alpha)

            lax.fori_loop(0, max_ls_iter, ls_body, act.astype(f32))
            cc = cc_ref[...]
            cur_du = jnp.sqrt(du2s_ref[...])

            # ---- accept the last executed trial (lqr_step.py:247) and
            # fold in best tracking (mpc.py:266-301) in one pass: tx/tu
            # hold exactly that trial's trajectory; stopped subtiles
            # accept nothing ----
            improved = (cc <= bc_ref[...] + best_cost_eps) & act

            txu_begin(0)
            b_begin(0)

            def accept(t, _c):
                xt, new_u = txu_get(t)
                xu_write(t, xt, new_u, 1)
                b_accept(t, improved, xt, new_u)
                return 0

            lax.fori_loop(0, T, accept, 0)
            xu_flush(1)
            b_flush(1)

            oc_ref[...] = cc  # accepted iterate's cost = next old_cost
            bc_ref[...] = jnp.where(improved, cc, bc_ref[...])
            bdu_ref[...] = jnp.where(improved, cur_du, bdu_ref[...])

            # per-subtile stopping rule (mpc.py:293-301 semantics at the
            # subtile granule); stopped subtiles' counters freeze
            all_stop = jnp.int32(1)
            impf = improved.astype(f32)  # f32 slices: i1 relayout hazard
            for w in range(n_sub):
                sl = subs[w]
                running = run_w[w]
                imp_w = _any_lanes(impf[..., sl, :])
                nni_prev = flags_ref[1 + n_sub + w]
                nni_w = jnp.where((it > 0) & imp_w, 0, nni_prev + 1)
                stop_w = (jnp.max(cur_du[..., sl, :]) < eps) | (
                    nni_w > not_improved_lim)
                flags_ref[1 + n_sub + w] = jnp.where(
                    running, nni_w, nni_prev)
                new_stop = jnp.where(
                    running & stop_w, 1, flags_ref[1 + w])
                flags_ref[1 + w] = new_stop
                flags_ref[1 + 2 * n_sub + w] = (
                    flags_ref[1 + 2 * n_sub + w]
                    + jnp.where(running, 1, 0))
                all_stop = all_stop * new_stop  # both always 0/1
            flags_ref[0] = all_stop

        return 0

    lax.fori_loop(0, lqr_iter, outer_body, 0)
    it_ref[...] = _sub_mask(
        tuple(flags_ref[1 + 2 * n_sub + w].astype(f32)
              for w in range(n_sub)), ts)


# trace-count provenance (tests assert which dispatch path ran)
DISPATCH_STATS = {"fused": 0, "vmap_merged": 0, "vmap_mapped": 0}


def _is_batch_tracer(x):
    # jax 0.9 no longer re-exports BatchTracer from the public
    # jax.interpreters.batching shim; fall back to a name check so a
    # future relocation degrades to "no vmap routing", not an ImportError
    try:
        from jax._src.interpreters.batching import BatchTracer
    except ImportError:  # pragma: no cover
        return type(x).__name__ == "BatchTracer"
    return isinstance(x, BatchTracer)


def _maybe_vmap_route(cfg, dyn, params, x_init, C, c, u_init, u_lower,
                      u_upper, u_zero_I, delta_u, cost_small,
                      cost_callable, interpret, force_stream_k,
                      lanes_width):
    """jax.vmap support for the fused solve (the kernel itself has no
    batching rule). Batch-traced array args become the operands of a
    custom_vmap entry whose rule FOLDS the mapped axis into the example
    batch -- candidate-major, B' = S*B, one kernel launch, full lane
    utilization. Batched compact costs are promoted to per-example lane
    costs (a candidate sweep IS a per-example-cost batch); everything
    example-invariant (unbatched) is tiled.

    Batched per-call SMEM scalars -- dynamics params, callable-cost
    params -- cannot vary within one kernel launch; those sweeps run as
    lax.map over per-slice kernel launches instead (still fused, one
    launch per candidate).

    Returns None when no argument is batch-traced (the plain call).
    Reported n_iter of a merged sweep is the max over ALL candidates
    (one fused solve; the per-candidate count is not recoverable), and
    at eps > 0 the merged candidates share the kernel's per-tile
    stopping rule instead of stopping per candidate -- per-example
    accepted cost stays equal-or-better (test_fused_mixed_convergence),
    matching the documented per-tile deviation."""
    lin_dx = isinstance(dyn, LinDx)
    vals = {
        "params": None if lin_dx else params, "x_init": x_init,
        "C": C, "c": c, "u_init": u_init,
        "u_lower": u_lower, "u_upper": u_upper, "u_zero_I": u_zero_I,
    }
    if lin_dx:
        vals["F"], vals["f"] = dyn.F, dyn.f
    has_cs = cost_small is not None
    if has_cs:
        vals["Cs"], vals["cs"] = cost_small
    cfn = None
    if cost_callable is not None:
        cfn, cp0 = cost_callable
        if cp0 is not None and not (
            isinstance(cp0, (tuple, list)) and len(cp0) == 0
        ):
            vals["cp"] = cp0
    bnames = [k for k, v in vals.items()
              if v is not None and _is_batch_tracer(v)]
    if not bnames:
        return None

    from jax import custom_batching

    T2, nu2 = cfg.T, cfg.n_ctrl
    fixed = {k: v for k, v in vals.items() if k not in bnames}

    def core(v):
        dyn2 = LinDx(v.get("F"), v.get("f")) if lin_dx else dyn
        cs2 = ((v["Cs"], v["cs"])
               if ("Cs" in v and v.get("Cs") is not None) else None)
        cc2 = None
        if cost_callable is not None:
            cc2 = (cfn, v.get("cp", cost_callable[1]))
        # NOT _novmap=True: with nested vmaps the merged/mapped call can
        # still carry an outer batch level -- the value-based detection
        # re-routes it and terminates once no batch tracers remain
        return ilqr_fused(
            cfg, dyn2, v.get("params"), v["x_init"], v.get("C"),
            v.get("c"), v.get("u_init"), v.get("u_lower"),
            v.get("u_upper"), v.get("u_zero_I"), delta_u, cs2, cc2,
            interpret, force_stream_k, lanes_width,
        )

    @custom_batching.custom_vmap
    def entry(*bargs):
        return core({**fixed, **dict(zip(bnames, bargs))})

    @entry.def_vmap
    def _rule(axis_size, in_batched, *bargs):
        S = axis_size
        b = {k: (a, ib)
             for k, a, ib in zip(bnames, bargs, in_batched)}

        def val(k):
            if k in b:
                return b[k]
            return fixed.get(k), False

        if any(k in b and b[k][1] for k in ("params", "cp")):
            # per-call SMEM scalars differ per candidate: one launch each
            DISPATCH_STATS["vmap_mapped"] += 1
            mapped = [k for k in bnames if b[k][1]]

            def one(sl):
                vv = {**fixed,
                      **{k: a for k, (a, ib) in b.items() if not ib},
                      **dict(zip(mapped, sl))}
                return core(vv)

            outs = jax.lax.map(one, tuple(b[k][0] for k in mapped))
            return outs, (True, True, True, True, True)

        DISPATCH_STATS["vmap_merged"] += 1

        def merge(a, axis):
            # [S, ..] with the example-batch at `axis` of the INNER
            # layout -> candidate-major merged batch at `axis`
            a = jnp.moveaxis(a, 0, axis)
            sh = a.shape
            return a.reshape(sh[:axis] + (S * sh[axis + 1],)
                             + sh[axis + 2:])

        def tile(a, axis):
            return merge(jnp.broadcast_to(a[None], (S,) + a.shape), axis)

        x0a, x0b = val("x_init")
        B0 = x0a.shape[1] if x0b else x0a.shape[0]
        vv = {}
        for k in ("params", "cp"):
            a, _ = val(k)
            if a is not None:
                vv[k] = a
        vv["x_init"] = merge(x0a, 0) if x0b else tile(x0a, 0)
        for k in ("C", "c", "u_init", "u_zero_I", "F", "f"):
            a, ib = val(k)
            if a is not None:
                vv[k] = merge(a, 1) if ib else tile(a, 1)

        Csa, Csb = val("Cs")
        csa, csb = val("cs")
        if Csa is not None:
            if Csb or csb:
                # batched compact cost -> per-example lane cost
                def norm(a, ib, nd_c):
                    if ib:
                        if a.ndim == nd_c + 2:   # [S, T, ...]
                            return a
                        return jnp.broadcast_to(
                            a[:, None], (S, T2) + a.shape[1:])
                    aT = (a if a.ndim == nd_c + 1
                          else jnp.broadcast_to(a[None], (T2,) + a.shape))
                    return jnp.broadcast_to(aT[None], (S,) + aT.shape)

                CsT = norm(Csa, Csb, 2)
                csT = norm(csa, csb, 1)
                vv["C"] = merge(jnp.broadcast_to(
                    CsT[:, :, None], (S, T2, B0) + CsT.shape[2:]), 1)
                vv["c"] = merge(jnp.broadcast_to(
                    csT[:, :, None], (S, T2, B0) + csT.shape[2:]), 1)
            else:
                vv["Cs"], vv["cs"] = Csa, csa

        for k in ("u_lower", "u_upper"):
            a, ib = val(k)
            if a is None:
                continue
            if ib:
                if a.ndim == 1:
                    a4 = a[:, None, None, None]
                elif a.ndim == 2:
                    a4 = a[:, None, None, :]
                else:
                    a4 = a
                vv[k] = merge(
                    jnp.broadcast_to(a4, (S, T2, B0, nu2)), 1)
            elif getattr(a, "ndim", 0) == 3:
                vv[k] = tile(a, 1)  # per-example bounds need S copies
            else:
                vv[k] = a           # scalar/[nu]: broadcasts as-is

        x, u, costs, du, n_iter = core(vv)

        def un(a, axis):
            sh = a.shape
            a = a.reshape(sh[:axis] + (S, B0) + sh[axis + 1:])
            return jnp.moveaxis(a, axis, 0)

        return (un(x, 1), un(u, 1), un(costs, 0), un(du, 0), n_iter), (
            True, True, True, True, False)

    return entry(*[vals[k] for k in bnames])


def ilqr_fused(
    cfg: ILQRConfig,
    dyn: Dynamics,
    params,
    x_init: jax.Array,   # [B, nx]
    C: jax.Array,        # [T, B, n, n] time-major (canonicalized)
    c: jax.Array,        # [T, B, n]
    u_init: Optional[jax.Array],  # [T, B, nu]; None = zeros warm start
    u_lower=None,
    u_upper=None,
    u_zero_I: Optional[jax.Array] = None,  # [T, B, nu] bool: force u_i = 0
    delta_u=None,        # concrete scalar trust region (lqr_step.py:200-213)
    cost_small=None,     # optional pre-broadcast (C, c): [n,n]/[T,n,n] etc.
    cost_callable=None,  # (cost_fn, flat_params | ()) -> in-kernel
    #                      quadraticized module cost; C/c may be None
    interpret: bool = False,
    force_stream_k: Optional[bool] = None,  # tests only; None = auto
    lanes_width: Optional[int] = None,      # tests only; None = auto
    _novmap: bool = False,
):
    """Run the fused whole-solve kernel. ``dyn`` is a Dynamics (nonlinear
    iLQR) or a LinDx (time-varying affine LQR; F/f ride in as lane
    inputs). Returns time-major (x [T,B,nx], u [T,B,nu], costs [B],
    full_du_norm [B], n_iter []).

    jax.vmap over the solve is supported: batch-traced array arguments
    route through a custom_vmap rule (_maybe_vmap_route) that folds the
    mapped axis into the lane batch -- one kernel launch for the whole
    sweep -- instead of silently losing the fused path."""
    if not _novmap:
        routed = _maybe_vmap_route(
            cfg, dyn, params, x_init, C, c, u_init, u_lower, u_upper,
            u_zero_I, delta_u, cost_small, cost_callable, interpret,
            force_stream_k, lanes_width,
        )
        if routed is not None:
            return routed
    DISPATCH_STATS["fused"] += 1
    T, B = cfg.T, x_init.shape[0]
    nx, nu = cfg.n_state, cfg.n_ctrl
    n = nx + nu
    f32 = jnp.float32
    lin_dx = isinstance(dyn, LinDx)
    if lin_dx:
        params = jnp.zeros((1,), f32)  # SMEM dummy; kernel reads none
    else:
        params = jnp.asarray(params, f32)
    n_params = params.shape[0]

    # --- tile geometry: widen the lane axis when the batch and VMEM
    # allow (see _pick_lanes_width) ---
    extras = dict(
        lin_dx=lin_dx,
        lanes_cost=cost_small is None and cost_callable is None,
        uz=u_zero_I is not None,
        warm=u_init is not None,
        dyn_bounds=_static_bounds(u_lower, u_upper, nu) is None,
    )
    W, auto_mode = _pick_lanes_width(cfg, extras, -(-B // BT))
    if lanes_width is not None:
        W = lanes_width
        auto_mode = _mode_at_width(cfg, extras, W)
    if force_stream_k is None:
        force_stream_k = auto_mode
    lw = 128 * W
    bt = BT * W
    ts = (8, lw)

    Bp = -(-B // bt) * bt
    G = Bp // bt
    stream_mode = {False: "none", True: "k"}.get(
        force_stream_k, force_stream_k)
    full = stream_mode == "full"
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    # full mode: whole-T lane inputs move to grid-major HBM buffers the
    # kernel's input streams DMA per timestep
    g_lead = lambda a: jnp.moveaxis(a, -3, 0)

    # --- cost: SMEM scalars when example-invariant, lanes otherwise ---
    cost_mode = "lanes"
    ccall_fn = None
    n_cp = 0
    if cost_callable is not None:
        cost_mode = "callable"
        ccall_fn, cp = cost_callable
        empty = cp is None or (isinstance(cp, tuple) and len(cp) == 0)
        if empty:
            cp_arr = jnp.zeros((1, 1), f32)
        else:
            cp_arr = jnp.asarray(cp, f32).reshape(1, -1)
            n_cp = cp_arr.shape[1]
        cost_in = [cp_arr]
        cost_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    elif cost_small is not None:
        Cs, cs = cost_small
        Cs = jnp.asarray(Cs, f32)
        cs = jnp.asarray(cs, f32)

        def _concrete_diag(M):
            # concrete (non-traced) and zero off the diagonal
            if isinstance(M, jax.core.Tracer):
                return False
            import numpy as np

            Mn = np.asarray(M)
            return bool(np.all(Mn == Mn * np.eye(Mn.shape[-1], dtype=Mn.dtype)))

        if Cs.ndim == 2 and cs.ndim == 1:
            if _concrete_diag(Cs):
                cost_mode = "diag"
                Cs_in = jnp.diagonal(Cs).reshape(1, n)
            else:
                cost_mode = "smem"
                Cs_in = Cs.reshape(1, n * n)
            cs_in = cs.reshape(1, n)
        elif Cs.ndim == 3 and cs.ndim == 2 and Cs.shape[0] == T:
            if _concrete_diag(Cs):
                cost_mode = "diag"
                Cs_in = jnp.diagonal(Cs, axis1=-2, axis2=-1).reshape(T, n)
            else:
                cost_mode = "smem"
                Cs_in = Cs.reshape(T, n * n)
            cs_in = cs.reshape(T, n)

    if cost_mode == "lanes":
        C_p = pad_cost_identity(pad_batch(C.astype(f32), B, Bp), T, B, Bp, n)
        c_p = pad_batch(c.astype(f32), B, Bp)
        cost_in = [to_lanes(C_p, T, Bp, lw), to_lanes(c_p, T, Bp, lw)]
        cost_specs = [bspec(T, (n, n), lw), bspec(T, (n,), lw)]
        if full:
            cost_in = [g_lead(a) for a in cost_in]
            cost_specs = [anyspec, anyspec]
    elif cost_mode != "callable":
        cost_in = [Cs_in, cs_in]
        cost_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]

    lin_in = []
    lin_specs = []
    f_present = False
    if lin_dx:
        # pad the zero F slab at t = T-1 (V_T = 0 makes it inert) and
        # convert to lanes
        Fz = jnp.zeros((1, B, nx, n), f32)
        F_full = jnp.concatenate([dyn.F.astype(f32), Fz], axis=0)
        lin_in = [to_lanes(pad_batch(F_full, B, Bp), T, Bp, lw)]
        lin_specs = [bspec(T, (nx, n), lw)]
        if dyn.f is not None:
            f_present = True
            fz = jnp.zeros((1, B, nx), f32)
            f_full = jnp.concatenate([dyn.f.astype(f32), fz], axis=0)
            lin_in.append(to_lanes(pad_batch(f_full, B, Bp), T, Bp, lw))
            lin_specs.append(bspec(T, (nx,), lw))
        if full:
            lin_in = [g_lead(a) for a in lin_in]
            lin_specs = [anyspec] * len(lin_specs)

    u0_zero = u_init is None
    u_in = []
    u_specs = []
    if not u0_zero:
        u_p = pad_batch(u_init.astype(f32), B, Bp)
        if full:
            # grid-major HBM layout, DMA'd in-kernel by the u0 stream
            u_in = [g_lead(to_lanes(u_p, T, Bp, lw))]
            u_specs = [anyspec]
        else:
            u_in = [to_lanes(u_p, T, Bp, lw)]  # [T,nu,G,8,lw]
            u_specs = [bspec(T, (nu,), lw)]

    uz_in = []
    uz_specs = []
    uz_present = u_zero_I is not None
    if uz_present:
        uz_p = pad_batch(u_zero_I.astype(f32), B, Bp)
        uz_in = [to_lanes(uz_p, T, Bp, lw)]    # [T,nu,G,8,lw] floats 0/1
        uz_specs = [bspec(T, (nu,), lw)]
        if full:
            uz_in = [g_lead(uz_in[0])]
            uz_specs = [anyspec]

    delta_u_static = _static_scalar(delta_u)
    unbounded = u_lower is None

    bounds_static = _static_bounds(u_lower, u_upper, nu)
    if bounds_static is None:
        bound_in = [
            to_lanes(expand_bound(u_lower, T, B, Bp, nu, -1.0), T, Bp, lw),
            to_lanes(expand_bound(u_upper, T, B, Bp, nu, +1.0), T, Bp, lw),
        ]
        bound_specs = [bspec(T, (nu,), lw), bspec(T, (nu,), lw)]
        if full:
            bound_in = [g_lead(a) for a in bound_in]
            bound_specs = [anyspec, anyspec]
    else:
        bound_in = []
        bound_specs = []

    xi_p = pad_batch(x_init.astype(f32)[None], B, Bp)[0]  # [Bp, nx]
    xi_l = xi_p.T.reshape(nx, G, 8, lw)

    out = _pallas_solve(
        cfg, dyn, n_params, G, cost_mode, cost_specs, u_specs, bound_specs,
        uz_specs, u0_zero, bounds_static, uz_present, delta_u_static,
        unbounded, interpret, force_stream_k,
        lin_specs=lin_specs, lin_dx=lin_dx, f_present=f_present,
        cost_fn=ccall_fn, n_cost_params=n_cp, ts=ts,
    )(params.reshape(1, n_params), xi_l, *cost_in, *lin_in, *u_in,
      *bound_in, *uz_in)

    if stream_mode == "full":
        bc_l, bdu_l, it_l, B_raw = out[0], out[1], out[2], out[3]
        Bm = jnp.moveaxis(B_raw, 0, 2)      # [T,n,G,8,lw]
        bx_l, bu_l = Bm[:, :nx], Bm[:, nx:]
    else:
        bx_l, bu_l, bc_l, bdu_l, it_l = out[:5]
    x = from_lanes(bx_l, T, B)   # [T,B,nx]
    u = from_lanes(bu_l, T, B)   # [T,B,nu]
    costs = bc_l.reshape(-1)[:B]
    du = bdu_l.reshape(-1)[:B]
    n_iter = jnp.max(it_l).astype(jnp.int32)
    return x, u, costs, du, n_iter


def _pallas_solve(cfg, dyn, n_params, G, cost_mode, cost_specs, u_specs,
                  bound_specs, uz_specs, u0_zero, bounds_static, uz_present,
                  delta_u_static, unbounded, interpret, force_stream_k,
                  lin_specs=(), lin_dx=False, f_present=False,
                  cost_fn=None, n_cost_params=0, ts=(8, 128)):
    """Build the configured whole-solve pallas_call. Returns a callable
    (params [1,P], xi_lanes [nx,G,*ts], *cost_in, *lin_in, *u_in,
    *bound_in, *uz_in) -> (bx, bu, bc, bdu, iters[, K_hbm]) in LANE
    layout. ts is the per-entry tile shape (8, 128*W)."""
    T, nx, nu = cfg.T, cfg.n_state, cfg.n_ctrl
    f32 = jnp.float32
    lw = ts[1]

    if force_stream_k is None:
        stream = "k" if use_stream_k(
            cfg, lin_dx, lanes_cost=cost_mode == "lanes",
            uz=uz_present, warm=not u0_zero,
            dyn_bounds=bounds_static is None, bt=ts[0] * ts[1],
        ) else "none"
    else:
        stream = {False: "none", True: "k"}.get(
            force_stream_k, force_stream_k)
    full = stream == "full"
    n = nx + nu
    step_fn = None if lin_dx else dyn.step
    # same linearization-point rule as core/ilqr._linearize: AUTO_DIFF
    # differentiates the CLAMPED forward (reference mpc.py:534-549),
    # ANALYTIC the un-clamped physics
    lin_fn = None if lin_dx else (
        dyn.step if cfg.grad_method is GradMethod.AUTO_DIFF
        else dyn.linearize_point
    )
    # hand-derived lane Jacobian (ANALYTIC point only -- AUTO_DIFF must
    # chain through the clamp, which only the jvp sweep reproduces):
    # replaces the n one-hot jvp applications per Riccati step, measured
    # 38% of kernel cycles on the cartpole headline (models/base.py)
    jac_fn = None if lin_dx else (
        dyn.jac_lanes if cfg.grad_method is GradMethod.ANALYTIC else None
    )
    kernel = functools.partial(
        _ilqr_kernel, T, nx, nu, n_params, cfg.lqr_iter, cfg.pnqp_iter,
        cfg.eps, cfg.linesearch_decay, cfg.max_linesearch_iter,
        cfg.best_cost_eps, cfg.not_improved_lim, step_fn,
        lin_fn, jac_fn, cost_mode, u0_zero, bounds_static, stream,
        uz_present, delta_u_static, unbounded, lin_dx, f_present,
        cost_fn, n_cost_params, ts,
    )

    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    sds = jax.ShapeDtypeStruct
    if full:
        # bx/bu ride out packed in the raw B_hbm buffer; Kk/XU/TXU are
        # HBM working buffers (outputs only because Pallas has no HBM
        # scratch) the caller drops
        out_specs = [
            bspec(None, (), lw),     # bc
            bspec(None, (), lw),     # bdu
            bspec(None, (), lw),     # iters
            anyspec,                 # B (packed best x|u)
            anyspec,                 # Kk
            anyspec,                 # XU
            anyspec,                 # TXU
        ]
        out_shape = [
            sds((G,) + ts, f32),
            sds((G,) + ts, f32),
            sds((G,) + ts, f32),
            sds((G, T, n) + ts, f32),
            sds((G, T, nu, nx + 1) + ts, f32),
            sds((G, T, n) + ts, f32),
            sds((G, T, n) + ts, f32),
        ]
        n_raw_out = 4
        in_streams = [
            small
            for _, present, small in _full_input_streams(
                cost_mode, lin_dx, f_present, u0_zero,
                bounds_static is None, uz_present, nx, nu)
            if present
        ]
        scratch_shapes = [
            pltpu.VMEM((2, n) + ts, f32),            # xu staging
            pltpu.VMEM((2, n) + ts, f32),            # txu staging
            pltpu.VMEM((2, nu, nx + 1) + ts, f32),   # Kk staging
            pltpu.VMEM((2, n) + ts, f32),            # B read staging
            pltpu.VMEM((2, n) + ts, f32),            # B write staging
        ] + [
            pltpu.VMEM((2,) + small + ts, f32) for small in in_streams
        ] + [
            pltpu.VMEM((nx, nx) + ts, f32),          # V
            pltpu.VMEM((nx,) + ts, f32),             # v
            pltpu.VMEM(ts, f32),                     # du2 (alpha=1)
            pltpu.VMEM(ts, f32),                     # cc
            pltpu.VMEM(ts, f32),                     # old_cost
            pltpu.SMEM((1 + 3 * (lw // 128),), jnp.int32),  # flags (per-subtile)
        ] + [pltpu.SemaphoreType.DMA((2,))] * (5 + len(in_streams))
    else:
        out_specs = [
            bspec(T, (nx,), lw),     # bx
            bspec(T, (nu,), lw),     # bu
            bspec(None, (), lw),     # bc
            bspec(None, (), lw),     # bdu
            bspec(None, (), lw),     # iters
        ]
        out_shape = [
            sds((T, nx, G) + ts, f32),
            sds((T, nu, G) + ts, f32),
            sds((G,) + ts, f32),
            sds((G,) + ts, f32),
            sds((G,) + ts, f32),
        ]
        if stream == "k":
            # long-horizon mode: the [T, nu, nx] gain stack lives in
            # compiler-placed (HBM) memory, indexed [tile, t] in-kernel
            # via async DMA; an output only because Pallas has no HBM
            # scratch -- callers ignore it
            out_specs.append(anyspec)
            out_shape.append(sds((G, T, nu, nx) + ts, f32))
            k_scratch = pltpu.VMEM((2, nu, nx) + ts, f32)  # staging slots
            sem_scratch = [
                pltpu.SemaphoreType.DMA((2,)),  # write slots
                pltpu.SemaphoreType.DMA((2,)),  # read slots
            ]
            n_raw_out = 1
        else:
            k_scratch = pltpu.VMEM((T, nu, nx) + ts, f32)
            sem_scratch = []
            n_raw_out = 0
        scratch_shapes = [
            pltpu.VMEM((T, nu) + ts, f32),      # u
            pltpu.VMEM((T, nx) + ts, f32),      # x
            k_scratch,                          # K / staging
            pltpu.VMEM((T, nu) + ts, f32),      # k
            pltpu.VMEM((nx, nx) + ts, f32),     # V
            pltpu.VMEM((nx,) + ts, f32),        # v
            pltpu.VMEM((T, nx) + ts, f32),      # tx (trial x)
            pltpu.VMEM((T, nu) + ts, f32),      # tu (trial u)
            pltpu.VMEM(ts, f32),                # du2 (alpha=1)
            pltpu.VMEM(ts, f32),                # cc
            pltpu.VMEM(ts, f32),                # old_cost
            pltpu.SMEM((1 + 3 * (lw // 128),), jnp.int32),  # flags (per-subtile)
        ] + sem_scratch

    def call(*arrays):
        with kernel_context():
            return pl.pallas_call(
                _squeeze_io(
                    kernel, cost_mode, n_raw_out=n_raw_out,
                    n_scratch=len(scratch_shapes),
                    full=full,
                ),
                grid=(G,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # params (1, P)
                    bspec(None, (nx,), lw),  # x_init
                ] + cost_specs + list(lin_specs) + u_specs + bound_specs
                + uz_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                scratch_shapes=scratch_shapes,
                interpret=interpret,
            )(*arrays)

    return call


def ilqr_fused_lanes(
    cfg: ILQRConfig,
    dyn: Dynamics,
    params2d: jax.Array,   # [1, P] float32
    xi_lanes: jax.Array,   # [nx, G, 8, lw] (to_lanes of x_init^T;
    #                        lw = 128*W selects the lane-widened tile)
    Cs: jax.Array,         # [Tc, n] diag entries (diag=True) or [Tc, n*n]
    cs: jax.Array,         # [Tc, n]; Tc in {1, T}
    u_lower=None,
    u_upper=None,
    diag: bool = True,
    interpret: bool = False,
):
    """RESIDENT-LAYOUT whole-solve entry: inputs already in kernel layout,
    outputs returned raw in lane layout (bx, bu, bc, bdu, iters).

    For steady-state pipelines (training, serving) that keep data resident
    on device: skips every canonicalization/layout op of the standard
    wrapper, so the jitted program is exactly one Pallas kernel. On this
    container's tunneled runtime the measured end-to-end difference vs the
    standard path is small (a ~0.7-1.0 ms per-call floor attaches to the
    solve kernel itself regardless of surrounding ops -- probed with
    truncated kernel bodies, docs/ROADMAP.md "per-call floor"); on runtimes without
    that floor the saved transposes are the remaining per-call overhead.
    Bounds must be compile-time constants (they bake into the kernel).
    Pass every operand as a jit argument -- captured constants cost ~1 ms
    per execution to materialize on this runtime.
    """
    assert xi_lanes.ndim == 4 and xi_lanes.shape[0] == cfg.n_state
    G = xi_lanes.shape[1]
    ts = tuple(xi_lanes.shape[2:])
    assert ts[0] == 8 and ts[1] % 128 == 0, ts
    bounds_static = _static_bounds(u_lower, u_upper, cfg.n_ctrl)
    assert bounds_static is not None, "resident entry requires static bounds"
    cost_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    return _pallas_solve(
        cfg, dyn, params2d.shape[1], G, "diag" if diag else "smem",
        cost_specs, [], [], [], True, bounds_static, False, None,
        u_lower is None, interpret, None, ts=ts,
    )(params2d, xi_lanes, Cs, cs)


def _squeeze_io(kernel, cost_mode, n_raw_out=0, n_scratch=12,
                full=False):
    """Wrap lane-tensor refs in LaneView. SMEM refs, the n_raw_out
    trailing outputs (the streaming HBM buffers), and the n_scratch
    trailing scratch refs pass through untouched. In full-stream mode
    every whole-T input is a raw grid-major HBM buffer (DMA'd by the
    kernel's input streams) and only x_init + the three [G,*ts] lane
    outputs are blocked."""
    n_smem_cost = {"smem": 2, "diag": 2, "callable": 1}.get(cost_mode, 0)

    def wrapped(*refs):
        out = [refs[0]]  # params SMEM
        i = 1
        out.append(LaneView(refs[i])); i += 1  # x_init
        if full:
            # SMEM cost refs and ANY HBM input buffers: all raw, up to
            # the three lane outputs (bc, bdu, iters)
            n_raw_in = len(refs) - i - 3 - n_raw_out - n_scratch
            for _ in range(n_raw_in):
                out.append(refs[i]); i += 1
            for _ in range(3):
                out.append(LaneView(refs[i])); i += 1
            out.extend(refs[i:])  # raw outputs + scratch
            kernel(*out)
            return
        if n_smem_cost:
            for _ in range(n_smem_cost):  # Cs/cs (or cost params) SMEM
                out.append(refs[i]); i += 1
        else:
            out.append(LaneView(refs[i])); i += 1  # C lanes
            out.append(LaneView(refs[i])); i += 1  # c lanes
        # remaining lane refs: u0?, lb?, ub?, and the lane outputs
        n_tensor = len(refs) - i - n_scratch - n_raw_out
        for _ in range(n_tensor):
            out.append(LaneView(refs[i])); i += 1
        out.extend(refs[i:])  # raw outputs + scratch
        kernel(*out)

    return wrapped
