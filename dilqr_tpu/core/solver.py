"""Public batched iLQR solve: canonicalization, slew-rate augmentation, and
dispatch to the differentiation modes.

The public API is batch-major ([B, T, ...]); reference shapes are time-major
(mpc.py:185-186). Broadcast rules for QuadCost follow mpc.py:205-226; u_init
warm-start handling follows mpc.py:230-236; the slew-rate penalty becomes an
up-front problem transformation to the augmented state (u_{t-1}, x)
(reference builds the same augmented blocks per LQR call,
mpc.py:339-445).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..types import ILQRConfig, LinDx, QuadCost, SolveResult


def _to_time_major(a: Optional[jax.Array], batch_dims=2):
    """[B, T, ...] -> [T, B, ...]."""
    if a is None:
        return None
    return jnp.swapaxes(a, 0, 1)


def canonicalize_cost(cost, T: int, B: int, n_tau: int):
    """Broadcast QuadCost to time-major [T, B, ...] (mpc.py:205-226).
    Accepted: C [n,n] | [T,n,n] | [B,T,n,n]; c [n] | [T,n] | [B,T,n]."""
    if not isinstance(cost, QuadCost):
        return cost
    C, c = cost
    if C.ndim == 2:
        C = jnp.broadcast_to(C, (T, B, n_tau, n_tau))
    elif C.ndim == 3:
        C = jnp.broadcast_to(C[:, None], (T, B, n_tau, n_tau))
    else:
        C = jnp.swapaxes(C, 0, 1)
    if c.ndim == 1:
        c = jnp.broadcast_to(c, (T, B, n_tau))
    elif c.ndim == 2:
        c = jnp.broadcast_to(c[:, None], (T, B, n_tau))
    else:
        c = jnp.swapaxes(c, 0, 1)
    return QuadCost(C, c)


def canonicalize_lindx(dyn, T: int, B: int):
    """LinDx arrives batch-major [B, T-1, ...]; convert to time-major."""
    if not isinstance(dyn, LinDx):
        return dyn
    F = jnp.swapaxes(dyn.F, 0, 1) if dyn.F.ndim == 4 else jnp.broadcast_to(
        dyn.F[:, None], (T - 1, B) + dyn.F.shape[1:]
    )
    f = dyn.f
    if f is not None:
        f = jnp.swapaxes(f, 0, 1) if f.ndim == 3 else jnp.broadcast_to(
            f[:, None], (T - 1, B) + f.shape[1:]
        )
    return LinDx(F, f)


def canonicalize_u_init(u_init, T: int, B: int, n_ctrl: int, dtype):
    """None -> zeros; [T, nu] -> expand batch (mpc.py:230-236)."""
    if u_init is None:
        return jnp.zeros((T, B, n_ctrl), dtype)
    if u_init.ndim == 2:
        return jnp.broadcast_to(u_init[:, None], (T, B, n_ctrl)).astype(dtype)
    return jnp.swapaxes(u_init, 0, 1).astype(dtype)


def canonicalize_bound(v, T: int, B: int, n_ctrl: int, dtype):
    """Scalar | [nu] | [T,nu] | [B,T,nu] -> scalar/[nu] (kept compact --
    downstream broadcasting handles them) or time-major [T,B,nu].

    Concrete scalars/[nu] stay HOST (numpy) constants: jnp.asarray inside
    a trace lifts even python floats into tracers, which would defeat the
    fused kernel's bake-bounds-as-compile-time-constants fast path
    (ops/pallas/ilqr_fused._static_bounds)."""
    if v is None:
        return None
    import numpy as np

    if not isinstance(v, jax.core.Tracer) and np.ndim(v) <= 1:
        return np.asarray(v, dtype)
    v = jnp.asarray(v, dtype)
    if v.ndim <= 1:
        return v
    if v.ndim == 2:
        return jnp.broadcast_to(v[:, None], (T, B, n_ctrl))
    return jnp.swapaxes(v, 0, 1)


def augment_slew_rate(
    cfg: ILQRConfig,
    cost,
    dyn,
    params,
    x_init,
    u_init,
    prev_ctrl,
):
    """Rewrite the problem over the augmented state (u_{t-1}, x) so the
    slew-rate penalty ||u_t - u_{t-1}||^2 becomes quadratic cost blocks
    (reference mpc.py:339-445). Returns (aug_cfg, aug_cost, aug_dyn,
    params, aug_x_init)."""
    nx, nu, T = cfg.n_state, cfg.n_ctrl, cfg.T
    pen = cfg.slew_rate_penalty
    n_aug = nu + nx + nu  # (u_{t-1}, x, u)
    B = x_init.shape[0]
    dtype = x_init.dtype

    # slew blocks: 0.5 * pen * ||u - u_{t-1}||^2 expressed on (u_{t-1},x,u)
    slew_C = jnp.zeros((n_aug, n_aug), dtype)
    eye = jnp.eye(nu, dtype=dtype) * pen
    slew_C = slew_C.at[:nu, :nu].set(eye)
    slew_C = slew_C.at[-nu:, -nu:].set(eye)
    slew_C = slew_C.at[:nu, -nu:].set(-eye)
    slew_C = slew_C.at[-nu:, :nu].set(-eye)

    if isinstance(cost, QuadCost):
        C, c = cost  # time-major [T,B,n,n]
        Ca = jnp.zeros((T, B, n_aug, n_aug), dtype) + slew_C
        Ca = Ca.at[:, :, nu:, nu:].add(C)
        ca = jnp.concatenate([jnp.zeros((T, B, nu), dtype), c], axis=-1)
        aug_cost = QuadCost(Ca, ca)
    else:
        base = cost

        def aug_cost(tau_aug):
            # true cost on (x, u) plus time-invariant slew quadratic
            # (reference SlewRateCost, mpc.py:36-52)
            true = base(tau_aug[nu:])
            return true + 0.5 * tau_aug @ slew_C @ tau_aug

    if isinstance(dyn, LinDx):
        # block-build the augmented LinDx (reference mpc.py:381-395):
        # rows [u_{t-1}' = u_t | x' = Fx x + Fu u (+ f)] over the augmented
        # tau = (u_{t-1}, x, u)
        Fm = dyn.F  # time-major [T-1, B, nx, nx+nu]
        Tm1, Bb = Fm.shape[0], Fm.shape[1]
        top = jnp.concatenate(
            [
                jnp.zeros((Tm1, Bb, nu, nu + nx), dtype),
                jnp.broadcast_to(
                    jnp.eye(nu, dtype=dtype), (Tm1, Bb, nu, nu)
                ),
            ],
            axis=-1,
        )
        bot = jnp.concatenate(
            [jnp.zeros((Tm1, Bb, nx, nu), dtype), Fm], axis=-1
        )
        Fa = jnp.concatenate([top, bot], axis=-2)
        fa = dyn.f
        if fa is not None:
            fa = jnp.concatenate(
                [jnp.zeros((Tm1, Bb, nu), dtype), fa], axis=-1
            )
        aug_dyn = LinDx(Fa, fa)
    else:
        from ..models import ctrl_passthrough

        aug_dyn = ctrl_passthrough.make(dyn)

    if prev_ctrl is None:
        prev_u0 = jnp.zeros((B, nu), dtype)
    else:
        prev_u0 = jnp.broadcast_to(jnp.asarray(prev_ctrl, dtype), (B, nu))
    aug_x_init = jnp.concatenate([prev_u0, x_init], axis=-1)

    import dataclasses

    aug_cfg = dataclasses.replace(
        cfg, n_state=nu + nx, slew_rate_penalty=None
    )
    return aug_cfg, aug_cost, aug_dyn, params, aug_x_init


def solve(
    cfg: ILQRConfig,
    x_init: jax.Array,
    cost,
    dynamics,
    params=None,
    u_init: Optional[jax.Array] = None,
    u_lower=None,
    u_upper=None,
    u_zero_I: Optional[jax.Array] = None,
    delta_u=None,
    prev_ctrl=None,
) -> SolveResult:
    """Batched differentiable iLQR solve (reference MPC.forward,
    mpc.py:184-337 / mpc_explicit.py:182-358).

    Args (batch-major):
      x_init: [B, n_state]
      cost: QuadCost (broadcastable, see canonicalize_cost) or a callable
            cost_fn(tau) -> scalar (quadraticized per iteration,
            mpc.py:447-487), or (cost_fn, cost_params) for learnable costs.
      dynamics: LinDx, or a models.base.Dynamics with `params`.
      u_init: warm start [B, T, nu] (or [T, nu]); zeros otherwise.
      u_lower/u_upper: box bounds (scalar or [nu]/[T,nu]/[B,T,nu]).
      u_zero_I: [B, T, nu] bool mask forcing u coords to zero.
      delta_u: per-iteration trust region on u (mpc.py:93).
    Returns SolveResult with batch-major x [B,T,nx], u [B,T,nu].
    """
    B = x_init.shape[0]
    T, nx, nu = cfg.T, cfg.n_state, cfg.n_ctrl
    dtype = x_init.dtype

    if x_init.ndim != 2 or x_init.shape[1] != nx:
        raise ValueError(
            f"x_init must be [n_batch, n_state={nx}], got {x_init.shape}"
        )
    if (u_lower is None) != (u_upper is None):
        # both-or-neither, as the reference asserts (mpc.py:156); one-sided
        # boxes would otherwise diverge between backends
        raise ValueError("u_lower and u_upper must both be set or both None")
    if delta_u is not None and u_lower is None:
        # the reference asserts this combination unsupported
        # (lqr_step.py:195); rejecting it here keeps the XLA and fused
        # backends from silently diverging on it
        raise ValueError("delta_u requires box bounds (u_lower/u_upper)")

    # the whole solve runs in x_init's dtype (the reference type_as-es
    # everything to x_init, mpc.py:231,236)
    if isinstance(cost, QuadCost):
        cost = QuadCost(cost.C.astype(dtype), cost.c.astype(dtype))
    if isinstance(dynamics, LinDx):
        dynamics = LinDx(
            dynamics.F.astype(dtype),
            None if dynamics.f is None else dynamics.f.astype(dtype),
        )

    # forward-only hints for the fused Pallas path: the user's compact
    # example-invariant cost ([n,n]+[n] or [T,n,n]+[T,n]) and a known-zeros
    # warm start. Only the exactly-conforming pairs qualify -- mixed ranks
    # (e.g. C [n,n] with c [T,n]) take the lanes path, and the VMEM gate
    # must agree with that dispatch (fused_supported keys on
    # cost_small is None)
    cost_small = None
    if isinstance(cost, QuadCost):
        Cs_, cs_ = cost.C, cost.c
        if (Cs_.ndim == 2 and cs_.ndim == 1) or (
            Cs_.ndim == 3 and cs_.ndim == 2
            and Cs_.shape[0] == T and cs_.shape[0] == T
        ):
            cost_small = (Cs_, cs_)
    u_init_zero = u_init is None

    cost = canonicalize_cost(cost, T, B, cfg.n_tau)
    dynamics = canonicalize_lindx(dynamics, T, B)
    u_init_tm = canonicalize_u_init(u_init, T, B, nu, dtype)
    lb = canonicalize_bound(u_lower, T, B, nu, dtype)
    ub = canonicalize_bound(u_upper, T, B, nu, dtype)
    uz = _to_time_major(u_zero_I) if u_zero_I is not None else None

    unaug = None
    if cfg.slew_rate_penalty is not None:
        cfg, cost, dynamics, params, x_init = augment_slew_rate(
            cfg, cost, dynamics, params, x_init, u_init_tm, prev_ctrl
        )
        unaug = nu  # strip the first nu state coords on return
        cost_small = None  # the augmented cost is rebuilt at [T,B,...]

    from ..diff.modes import solve_with_grad

    res = solve_with_grad(
        cfg, cost, dynamics, params, x_init, u_init_tm, lb, ub, uz, delta_u,
        cost_small=cost_small, u_init_zero=u_init_zero,
    )
    x, u, costs, full_du_norm, n_iter = res

    if unaug is not None:
        x = x[:, :, unaug:]

    converged = full_du_norm < cfg.eps
    if cfg.exit_unconverged:
        # reference asserts (mpc.py:323-324); a jitted program cannot abort
        # on traced values, so honor the flag's intent with a host-side
        # warning -- callers that need a hard stop raise on
        # jax.device_get(result.converged).
        def _warn_unconverged(conv):
            import warnings

            n_bad = int((~conv).sum())
            if n_bad:
                warnings.warn(
                    f"iLQR did not converge for {n_bad}/{conv.shape[0]} "
                    "examples (exit_unconverged is set; the reference "
                    "asserts here, mpc.py:323-324)"
                )

        from ..utils.callbacks import supports_host_callback

        if supports_host_callback():
            jax.debug.callback(_warn_unconverged, converged)

    return SolveResult(
        x=jnp.swapaxes(x, 0, 1),
        u=jnp.swapaxes(u, 0, 1),
        costs=jax.lax.stop_gradient(costs),
        converged=converged,
        full_du_norm=jax.lax.stop_gradient(full_du_norm),
        n_iter=n_iter,
    )
