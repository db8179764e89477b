"""Differentiation-mode dispatch: wires the forward iLQR solve to its
backward pass via jax.custom_vjp.

Three modes (types.BackwardMode):
  KKT    -- O(T) module-KKT VJP of the last LQR subproblem
            (reference lqr_step.py:311-407 + the diff=True linearization
            chain at mpc.py:308-319);
  IFT    -- DiLQR fixed-point implicit differentiation, matrix-free
            (reference lqr_step_explicit.py:652-716, see diff/ift.py);
  UNROLL -- plain reverse-mode autodiff through a fixed-trip-count solver
            (cfg.unroll must be True); the gradient oracle.

The custom_vjp primal takes every traced array as an explicit argument
(closing over tracers is illegal); non-differentiable inputs (warm start,
bounds, masks) receive zero cotangents, mirroring the reference's detached
bounds (mpc.py:156-163).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.ilqr import ilqr_loop
from ..core.linearize import approximate_cost, linearize_dynamics
from ..utils.batch import bmv as bmv_ein
from ..utils.platform import target_platform
from ..models.base import Dynamics
from ..types import BackwardMode, ILQRConfig, LinDx, QuadCost
from .ift import solve_adjoint_dense, solve_adjoint_fixed_point
from .kkt import make_kkt_vjp

ACTIVE_TOL = 1e-8  # reference lqr_step.py:325-326


def _build_cost(quad: bool, cost_fn, cost_in):
    if quad:
        return QuadCost(*cost_in)
    if cost_fn is None:
        raise ValueError("callable cost requires cost_fn")
    return lambda tau: cost_fn(tau, cost_in)


def _build_dyn(lin: bool, dyn_static: Optional[Dynamics], dyn_in):
    if lin:
        return LinDx(*dyn_in), None
    return dyn_static, dyn_in


def _active_set(u, lb, ub):
    """Frozen box active set (reference lqr_step.py:322-326). The reference
    derives it from the bounds only, ignoring any forward u_zero_I -- we
    reproduce that."""
    if lb is None:
        return None
    return (jnp.abs(u - lb) <= ACTIVE_TOL) | (jnp.abs(u - ub) <= ACTIVE_TOL)


def _linearize_for_vjp(cfg: ILQRConfig, dyn_static: Dynamics):
    """The differentiable linearization map (X, U, params) -> (F, f) used
    for the backward chains. Matches the forward linearization
    (core/linearize.py) with the env's preferred jacobian."""

    def lin(x, u, params):
        # FINITE_DIFF is kept as-is: the reference's diff=True FD path also
        # chains gradients through the central-difference evaluations
        # (mpc.py:568-582 only detaches when diff=False), and jax.vjp
        # through the FD stencil reproduces that.
        return linearize_dynamics(
            dyn_static.step,
            params,
            x,
            u,
            method=cfg.grad_method,
            jacobian_fn=dyn_static.jacobian,
            fd_eps=cfg.fd_eps,
            linearize_fn=dyn_static.linearize_point,
        )

    return lin


def solve_with_grad(
    cfg: ILQRConfig,
    cost,
    dyn,
    params,
    x_init,
    u_init,
    lb,
    ub,
    uz,
    delta_u,
    cost_small=None,
    u_init_zero: bool = False,
):
    """Returns time-major (x, u, costs, full_du_norm, n_iter).

    cost_small / u_init_zero: forward-only hints for the fused Pallas path
    (see core/ilqr.ilqr_loop); cost_small receives zero cotangents -- the
    backward differentiates the canonical broadcast cost tensors."""
    lin = isinstance(dyn, LinDx)
    quad = isinstance(cost, QuadCost)

    cost_fn = None
    if quad:
        cost_in = tuple(cost)
    elif isinstance(cost, tuple):
        cost_fn, cost_in = cost
    else:
        # parameterless callable: no cost gradients to report
        base = cost
        cost_fn = lambda tau, _p: base(tau)
        cost_in = ()

    dyn_in = tuple(dyn) if lin else params
    dyn_static = None if lin else dyn

    def primal(x_init, cost_in, dyn_in, u_init, lb, ub, uz, delta_u,
               cost_small):
        cost_obj = _build_cost(quad, cost_fn, cost_in)
        dyn_obj, p = _build_dyn(lin, dyn_static, dyn_in)
        out = ilqr_loop(
            cfg,
            cost_obj,
            dyn_obj,
            p,
            x_init,
            u_init,
            u_lower=lb,
            u_upper=ub,
            u_zero_I=uz,
            delta_u=delta_u,
            cost_small=cost_small,
            u_init_zero=u_init_zero,
            # structured callable cost for the fused kernel's in-kernel
            # quadraticization (the closure above serves the XLA path)
            cost_struct=None if quad else (cost_fn, cost_in),
        )
        return (out.x, out.u, out.costs, out.full_du_norm, out.n_iter)

    if cfg.backward_mode is BackwardMode.UNROLL or not cfg.backprop:
        if cfg.backward_mode is BackwardMode.UNROLL and not cfg.unroll:
            raise ValueError("BackwardMode.UNROLL requires cfg.unroll=True")
        x, u, costs, du, n_iter = primal(
            x_init, cost_in, dyn_in, u_init, lb, ub, uz, delta_u, cost_small
        )
        if not cfg.backprop:
            x, u = jax.lax.stop_gradient((x, u))
        elif cfg.detach_unconverged:
            conv = jax.lax.stop_gradient(du) < cfg.eps
            m = conv[None, :, None]
            x = jnp.where(m, x, jax.lax.stop_gradient(x))
            u = jnp.where(m, u, jax.lax.stop_gradient(u))
        return x, u, costs, du, n_iter

    @jax.custom_vjp
    def solve_cv(x_init, cost_in, dyn_in, u_init, lb, ub, uz, delta_u,
                 cost_small):
        return primal(x_init, cost_in, dyn_in, u_init, lb, ub, uz, delta_u,
                      cost_small)

    def fwd(x_init, cost_in, dyn_in, u_init, lb, ub, uz, delta_u,
            cost_small):
        out = primal(x_init, cost_in, dyn_in, u_init, lb, ub, uz, delta_u,
                     cost_small)
        x, u, costs, du, n_iter = out
        res = (x, u, du, cost_in, dyn_in,
               (u_init, lb, ub, uz, delta_u, cost_small))
        return out, res

    def bwd(res, g):
        x, u, du_norm, cost_in, dyn_in, nondiff = res
        u_init, lb, ub, uz, delta_u, cost_small = nondiff
        g_x, g_u = g[0], g[1]

        if cfg.detach_unconverged:
            # mask gradients of non-converged examples (mpc.py:321-334)
            conv = (du_norm < cfg.eps)[None, :, None]
            g_x = jnp.where(conv, g_x, 0.0)
            g_u = jnp.where(conv, g_u, 0.0)

        nx, nu = cfg.n_state, cfg.n_ctrl

        # --- problem data at the solution ---
        if quad:
            C, c = cost_in
            cost_pullback = None
        else:
            (C, c), cost_pullback = jax.vjp(
                lambda cp: approximate_cost(
                    lambda tau: cost_fn(tau, cp), x, u
                )[:2],
                cost_in,
            )

        if lin:
            F, f = dyn_in
            lin_pullback = None
        else:
            lin_map = _linearize_for_vjp(cfg, dyn_static)
            if (
                cfg.backward_mode is not BackwardMode.IFT
                and not cfg.kkt_grad_through_F
            ):
                # reference-compat KKT chain (see ILQRConfig
                # .kkt_grad_through_F): F enters as a constant; the params
                # chain of f is only the new_x evaluation. f_ref = f +
                # (F - sg(F)) tau has the same value but its params
                # cotangent drops the dF/dtheta term, exactly like
                # autograd.grad-without-create_graph at mpc.py:538-549.
                base_lin = lin_map

                def lin_map(x, u, p):
                    F_, f_ = base_lin(x, u, p)
                    Fc = jax.lax.stop_gradient(F_)
                    tau = jnp.concatenate([x, u], axis=-1)[:-1]
                    return Fc, f_ + bmv_ein(F_ - Fc, tau)

            (F, f), lin_pullback = jax.vjp(lin_map, x, u, dyn_in)

        I = _active_set(u, lb, ub)

        # build the KKT-VJP operator ONCE: the fused TPU path pre-lanes
        # the cotangent-invariant problem data here, outside the GMRES
        # while_loop (diff/kkt.make_kkt_vjp)
        vjp_fn = make_kkt_vjp(
            nx, nu, C, c, F, x, u, u_zero_I=I, with_f=True,
            backend=cfg.backward_backend or cfg.backend,
            parallel=cfg.riccati_parallel,
        )

        def sT(w):
            return vjp_fn(w[0], w[1])

        if cfg.backward_mode is BackwardMode.IFT and not lin:

            def sT_Ff(w):
                # "Ff": each GMRES iteration consumes only dF/df; the
                # dC/dc outer products are skipped
                kg = vjp_fn(w[0], w[1], wants="Ff")
                return kg.dF, kg.df

            def lT_xu(dF, df):
                dX, dU, _ = lin_pullback((dF, df))
                return dX, dU

            if cfg.ift_solver == "dense":
                w = solve_adjoint_dense(sT_Ff, lT_xu, (g_x, g_u))
            else:
                w, res_b, b_norm_b = solve_adjoint_fixed_point(
                    sT_Ff,
                    lT_xu,
                    (g_x, g_u),
                    tol=cfg.backward_tol,
                    restart=cfg.ift_restart,
                    maxiter=cfg.ift_maxiter,
                )
                # per-example accounting: the adjoint operator is block-
                # diagonal across examples and the Krylov solve runs per
                # example, so one ill-conditioned example in an otherwise
                # easy batch is detected (and repaired) individually
                bad_b = res_b > cfg.backward_tol * (b_norm_b + 1e-30)
                bad = jnp.any(bad_b)

                def _warn(bad_b_, res_b_, b_b_):
                    import numpy as np

                    n_bad = int(np.sum(bad_b_))
                    if n_bad:
                        import warnings

                        i = int(np.argmax(res_b_ / (b_b_ + 1e-30)))
                        warnings.warn(
                            "IFT GMRES adjoint did not converge for "
                            f"{n_bad}/{len(bad_b_)} examples (worst: "
                            f"example {i}, residual {float(res_b_[i]):.3e} "
                            f"vs tol {cfg.backward_tol:.1e} * "
                            f"||b||={float(b_b_[i]):.3e})"
                            + (
                                "; falling back to the dense probing solve"
                                " for those examples"
                                if cfg.ift_fallback
                                else "; gradients may be inaccurate -- set "
                                "ift_solver='dense' or raise ift_maxiter"
                            )
                        )

                from ..utils.callbacks import supports_host_callback

                if supports_host_callback():
                    jax.debug.callback(_warn, bad_b, res_b, b_norm_b)
                # lax.cond compiles BOTH branches, and the dense probe's
                # batched jnp.linalg.solve on [B, D, D] has no f64 LU on
                # TPU (the Mosaic gotcha riccati.py also guards) -- so
                # the auto-fallback is limited to configurations where
                # the dense branch can lower; f64-on-TPU users get the
                # warning and can set ift_solver="dense" off-device.
                fb_ok = cfg.ift_fallback and not (
                    g_x.dtype == jnp.float64
                    and target_platform(g_x) == "tpu"
                )
                if fb_ok:
                    # a weakly-contracting fixed point (under-converged
                    # forward solve) defeats GMRES(m); the dense probe is
                    # exact. lax.cond executes only the taken branch, and
                    # the merge keeps the converged examples' Krylov
                    # solutions -- only the failing examples are repaired.
                    def _dense_repair(w_):
                        wd = solve_adjoint_dense(sT_Ff, lT_xu, (g_x, g_u))
                        m = bad_b[None, :, None]
                        return (
                            jnp.where(m, wd[0], w_[0]),
                            jnp.where(m, wd[1], w_[1]),
                        )

                    w = jax.lax.cond(bad, _dense_repair, lambda w_: w_, w)
            kg = sT(w)
        else:
            kg = sT((g_x, g_u))

        # --- chain to the differentiable inputs ---
        d_x_init = kg.dx_init
        if quad:
            d_cost_in = (kg.dC, kg.dc)
        else:
            (d_cost_in,) = cost_pullback((kg.dC, kg.dc))

        if lin:
            dF_out = kg.dF
            df_out = kg.df if dyn_in[1] is not None else None
            d_dyn_in = (dF_out, df_out)
        else:
            _, _, d_dyn_in = lin_pullback((kg.dF, kg.df))

        zeros = lambda a: jax.tree_util.tree_map(jnp.zeros_like, a)
        return (
            d_x_init,
            d_cost_in,
            d_dyn_in,
            zeros(u_init),
            zeros(lb),
            zeros(ub),
            zeros(uz),
            zeros(delta_u),
            zeros(cost_small),
        )

    solve_cv.defvjp(fwd, bwd)
    return solve_cv(
        x_init, cost_in, dyn_in, u_init, lb, ub, uz, delta_u, cost_small
    )
