"""Dynamics model interface.

The reference's dynamics are stateful nn.Modules carrying params and
hand-written Jacobian methods (dynamics.py:15-202, env_dx/*). Here a model
is a frozen (hashable, jit-static) bundle of pure functions plus a separate
params pytree -- the functional JAX idiom:

    step(x, u, params) -> x'          single-sample pure step
    step_unclamped                    optional: the un-clamped physics used
                                      for linearization (the reference's
                                      analytic Jacobians differentiate the
                                      un-clamped dynamics, e.g.
                                      env_dx/pendulum.py:444-475, while
                                      forward clamps u, pendulum.py:81)
    jacobian(x, u, params) -> (R, S)  optional hand-written/Pallas Jacobian;
                                      default is jax.jacfwd of the step.

Env-specific solver hyper-parameters ride along (mpc_eps etc., reference
pendulum.py:56-58, cartpole.py:60-62, rocket.py:68-70).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Dynamics:
    n_state: int
    n_ctrl: int
    step: Callable  # (x[nx], u[nu], params) -> x'[nx]
    step_unclamped: Optional[Callable] = None
    jacobian: Optional[Callable] = None
    # Optional hand-derived Jacobian of the ANALYTIC linearization point
    # (step_unclamped) in kernel-lane form: (x [nx,...], u [nu,...],
    # params) -> D [nx, n, ...], broadcasting over trailing tile dims.
    # Used ONLY by the fused Pallas kernel (grad_method=ANALYTIC): it
    # replaces the n one-hot jvp sweeps -- measured 38% of kernel cycles
    # on the cartpole headline -- with the ~3x-cheaper shared-
    # subexpression form. The XLA path keeps jax.jacfwd (its f64 goldens
    # are pinned bitwise against the reference); jacfwd-vs-jac_lanes
    # agreement is oracle-tested per env (tests/test_envs.py).
    jac_lanes: Optional[Callable] = None
    # box bounds on u (None = unconstrained); scalars or [nu] arrays
    lower: Any = None
    upper: Any = None
    # per-env MPC hyper-parameters
    mpc_eps: float = 1e-3
    linesearch_decay: float = 0.2
    max_linesearch_iter: int = 10

    @property
    def linearize_point(self) -> Callable:
        return self.step_unclamped if self.step_unclamped is not None else self.step
