"""dilqr_tpu -- a TPU-native differentiable iLQR / MPC framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
josef-w/Differentiable-iLQR (DiLQR, ICML 2025) -- batched box-constrained
iLQR with module-KKT and fixed-point implicit differentiation, analytic
physics environments, and an imitation-learning harness -- built for SPMD
execution over TPU device meshes.

Public API:
    ILQRConfig, solve            functional batched solver
    MPC                          reference-compatible class wrapper
    QuadCost, LinDx              problem types
    GradMethod, BackwardMode     enums
    receding_horizon             jitted closed-loop episode driver
    models.{pendulum,cartpole,rocket,affine,nn_dynamics,ctrl_passthrough}
    parallel.mesh                batch-sharded multi-chip solve
    il.{env,exp,lstm}            imitation-learning / sysid harness
    viz                          rendering hooks (lazy matplotlib)
"""

from .control import receding_horizon
from .core.solver import solve
from .mpc import MPC
from .types import (
    BackwardMode,
    GradMethod,
    ILQRConfig,
    LinDx,
    QuadCost,
    SolveResult,
)

__version__ = "0.1.0"

__all__ = [
    "solve",
    "MPC",
    "receding_horizon",
    "ILQRConfig",
    "QuadCost",
    "LinDx",
    "GradMethod",
    "BackwardMode",
    "SolveResult",
]
