"""Reference-compatible MPC wrapper class.

Mirrors the constructor surface of the reference `mpc.MPC` /
`mpc_explicit.MPC` (mpc.py:123-181) on top of the functional solver
(core/solver.py), so users of the reference can switch with minimal edits.
Differences by design:

 * arrays are batch-major [B, T, ...] (the reference is time-major);
 * dynamics are a models.base.Dynamics + separate params pytree (or LinDx);
 * grad_method selects the linearization, backward_mode selects the
   differentiation (KKT = mpc.py stack, IFT = mpc_explicit.py/DiLQR stack,
   UNROLL = full autodiff oracle the reference does not have);
 * `exit_unconverged` surfaces a per-example `converged` flag instead of
   asserting inside jit (mpc.py:323-324).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp

from .core.solver import solve
from .types import BackwardMode, GradMethod, ILQRConfig, LinDx, QuadCost


class MPC:
    def __init__(
        self,
        n_state: int,
        n_ctrl: int,
        T: int,
        u_lower=None,
        u_upper=None,
        u_zero_I=None,
        u_init=None,
        lqr_iter: int = 10,
        grad_method: GradMethod = GradMethod.ANALYTIC,
        delta_u=None,
        verbose: int = 0,
        eps: float = 1e-7,
        back_eps: Optional[float] = None,
        n_batch: Optional[int] = None,
        linesearch_decay: float = 0.2,
        max_linesearch_iter: int = 10,
        exit_unconverged: bool = True,
        detach_unconverged: bool = True,
        backprop: bool = True,
        slew_rate_penalty: Optional[float] = None,
        prev_ctrl=None,
        not_improved_lim: int = 5,
        best_cost_eps: float = 1e-4,
        backward_mode: BackwardMode = BackwardMode.KKT,
        unroll: bool = False,
    ):
        assert (u_lower is None) == (u_upper is None)
        assert max_linesearch_iter > 0
        self.cfg = ILQRConfig(
            n_state=n_state,
            n_ctrl=n_ctrl,
            T=T,
            lqr_iter=lqr_iter,
            grad_method=grad_method,
            eps=eps,
            back_eps=back_eps,
            linesearch_decay=linesearch_decay,
            max_linesearch_iter=max_linesearch_iter,
            exit_unconverged=exit_unconverged,
            detach_unconverged=detach_unconverged,
            backprop=backprop,
            not_improved_lim=not_improved_lim,
            best_cost_eps=best_cost_eps,
            backward_mode=backward_mode,
            slew_rate_penalty=slew_rate_penalty,
            unroll=unroll or backward_mode is BackwardMode.UNROLL,
            verbose=verbose,
        )
        self.u_lower = u_lower
        self.u_upper = u_upper
        self.u_zero_I = u_zero_I
        self.u_init = u_init
        self.delta_u = delta_u
        self.prev_ctrl = prev_ctrl
        self.verbose = verbose
        self.n_batch = n_batch

    def _check_batch(self, x_init):
        """n_batch semantics: the reference uses it to pin the batch size
        when shapes can't infer it (mpc.py:102,193-196). Here the batch is
        always x_init.shape[0]; when given, n_batch validates it."""
        if self.n_batch is not None and x_init.shape[0] != self.n_batch:
            raise ValueError(
                f"x_init batch {x_init.shape[0]} != n_batch={self.n_batch} "
                "passed to MPC(...)"
            )

    def __call__(self, x_init, cost, dx, params=None, u_init=None):
        """Solve. Returns (x [B,T,nx], u [B,T,nu], costs [B]) like the
        reference forward (mpc.py:337), batch-major. ``u_init`` overrides
        the constructor warm start for this call (the reference mutates
        ``self.u_init`` between receding-horizon calls, rocket.py:1137)."""
        self._check_batch(x_init)
        res = solve(
            self.cfg,
            x_init,
            cost,
            dx,
            params=params,
            u_init=u_init if u_init is not None else self.u_init,
            u_lower=self.u_lower,
            u_upper=self.u_upper,
            u_zero_I=self.u_zero_I,
            delta_u=self.delta_u,
            prev_ctrl=self.prev_ctrl,
        )
        return res.x, res.u, res.costs

    def solve(self, x_init, cost, dx, params=None, u_init=None):
        """Full-result variant returning types.SolveResult."""
        self._check_batch(x_init)
        return solve(
            self.cfg,
            x_init,
            cost,
            dx,
            params=params,
            u_init=u_init if u_init is not None else self.u_init,
            u_lower=self.u_lower,
            u_upper=self.u_upper,
            u_zero_I=self.u_zero_I,
            delta_u=self.delta_u,
            prev_ctrl=self.prev_ctrl,
        )
