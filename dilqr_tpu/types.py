"""Problem and result types for the TPU-native differentiable iLQR framework.

Mirrors the *capabilities* of the reference problem types (QuadCost/LinDx
namedtuples, reference: definitions.py:1-4) but is designed for JAX: every
type here is a pytree, and all arrays are batch-major ``[B, T, ...]`` at the
public API boundary (the reference uses time-major ``[T, B, ...]``,
mpc.py:185-186; we transpose so that the batch axis -- the axis sharded over
TPU chips -- is leading).
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class QuadCost(NamedTuple):
    """Quadratic cost ``sum_t 0.5 tau_t^T C_t tau_t + c_t^T tau_t``.

    C: [B, T, n_tau, n_tau] (or broadcastable: [n_tau,n_tau], [T,n_tau,n_tau])
    c: [B, T, n_tau]        (or broadcastable)

    C must be SYMMETRIC (only its symmetric part enters the quadratic
    form; the reference assumes this too, and the fused kernels exploit
    it via triangle-and-mirror products -- an asymmetric C would make
    the pallas and xla backends diverge).

    Reference: definitions.py:3, broadcast rules mpc.py:205-226.
    """

    C: jax.Array
    c: jax.Array


class LinDx(NamedTuple):
    """Time-varying affine dynamics ``x_{t+1} = F_t tau_t + f_t``.

    F: [B, T-1, n_state, n_tau]
    f: [B, T-1, n_state] or None

    Reference: definitions.py:4.
    """

    F: jax.Array
    f: Optional[jax.Array] = None


class GradMethod(enum.Enum):
    """How to linearize non-linear dynamics (reference: mpc.py:29-33).

    ANALYTIC here means "the env provides a jacobian function"; by default
    envs derive it with jax.jacfwd of their forward function, which is both
    analytic and exact -- replacing the reference's ~2300 lines of
    hand-transcribed symbolic Jacobians (env_dx/pendulum.py:127-515 etc.).
    """

    AUTO_DIFF = 1
    FINITE_DIFF = 2
    ANALYTIC = 3
    ANALYTIC_CHECK = 4


class BackwardMode(enum.Enum):
    """How gradients flow through the solver.

    KKT: O(T) module-KKT VJP of the last LQR subproblem
         (reference: lqr_step.py:311-407).
    IFT: DiLQR fixed-point implicit differentiation; gradients w.r.t. cost
         and dynamics parameters through the iLQR fixed point
         (reference: lqr_step_explicit.py:458-716). Implemented matrix-free
         here: a few VJP applications of the fixed-point map replace the
         reference's dense (T*d)^2 probing solve.
    UNROLL: plain reverse-mode autodiff through the (fixed-trip-count)
         solver; the validation oracle. The reference cannot do this cheaply.
    """

    KKT = 1
    IFT = 2
    UNROLL = 3


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
    """Static solver configuration (hashable; safe to close over under jit).

    Mirrors the reference MPC knobs (mpc.py:123-144). Bounds are passed at
    call time (they may be traced arrays); everything here shapes the
    compiled program.
    """

    n_state: int
    n_ctrl: int
    T: int
    lqr_iter: int = 10
    grad_method: GradMethod = GradMethod.ANALYTIC
    eps: float = 1e-7
    # Backward-pass solve tolerance (reference mpc.py:137 back_eps,
    # consumed as the nested backward LQR solver's eps at
    # lqr_step.py:330-338). Here the only iterative backward solve is the
    # IFT adjoint (BackwardMode.IFT): back_eps sets its GMRES tolerance
    # unless ift_tol overrides it. KKT/UNROLL backwards are exact direct
    # solves with no tolerance, so passing back_eps there is a config
    # error (the reference silently ignores it in some paths; we refuse
    # rather than no-op).
    back_eps: Optional[float] = None
    linesearch_decay: float = 0.2
    max_linesearch_iter: int = 10
    # reference mpc.py:323-324 hard-asserts on non-convergence; a jitted
    # program cannot abort on traced values, so this flag emits a host-side
    # warning via jax.debug.callback -- which is UNAVAILABLE on runtimes
    # without host callbacks (e.g. the axon TPU plugin), where the flag is
    # a no-op. Callers that need the reference's hard stop must check the
    # always-populated SolveResult.converged, e.g.
    # ``assert jax.device_get(res.converged).all()`` outside jit.
    exit_unconverged: bool = False
    detach_unconverged: bool = True
    backprop: bool = True
    not_improved_lim: int = 5
    best_cost_eps: float = 1e-4
    # per-iteration console table (reference mpc.py:95-98, 287-297):
    # 0 = silent, >= 1 prints iter / mean(cost) / ||du||_max / mean(alpha)
    # via jax.debug.callback (XLA path only; the fused kernel is excluded)
    verbose: int = 0
    backward_mode: BackwardMode = BackwardMode.KKT
    # pnqp box-QP controls (reference: pnqp.py:5, lqr_step.py:135-137)
    pnqp_iter: int = 20
    # Box-QP solver selection: "auto" uses the exact closed-form minimizer
    # clamp(-q/H, l, u) when n_ctrl == 1 (the 1-D box-QP has a closed form;
    # pnqp's Newton iteration converges to it to its 1e-4 tolerance) and
    # pnqp otherwise; "pnqp" forces the reference's projected-Newton path,
    # reproducing its iteration trajectory bit-for-bit (for exact-parity
    # golden tests).
    qp_solver: str = "auto"
    # Compute backend for the hot solver stages: "auto" uses the fused
    # Pallas TPU kernels (ops/pallas) when lowering for TPU and the config
    # supports them -- the whole-solve megakernel covers n_ctrl <= 8,
    # QuadCost, callable Dynamics AND LinDx problems, u_zero_I masks,
    # concrete-scalar delta_u trust regions, f32, VMEM-fitting horizons
    # (longer ones stream K through HBM); see
    # ops/pallas/ilqr_fused.fused_supported -- and falls back to the
    # pure-XLA lax.scan path otherwise (f64, module costs, unrolled
    # autodiff). Concrete bounds bake into the kernel as constants;
    # traced or per-time/per-example bounds ride in as lane inputs.
    # "pallas" forces the kernels (interpret-mode off TPU -- tests);
    # "xla" disables them.
    backend: str = "auto"
    # Backend for the KKT/IFT BACKWARD pass specifically (the fused
    # whole-VJP kernel, ops/pallas/kkt_fused.py). None inherits
    # ``backend``. Lets the backward be ablated (or forced off) without
    # changing the forward dispatch.
    backward_backend: Optional[str] = None
    # Use a differentiable fixed-trip-count outer loop (lax.scan with masks)
    # instead of lax.while_loop. Required for BackwardMode.UNROLL; the
    # while_loop build exits early and is faster for inference.
    unroll: bool = False
    # Finite-difference epsilon for GradMethod.FINITE_DIFF
    # (reference: mpc.py:571-575 uses 1e-4).
    fd_eps: float = 1e-4
    # Slew-rate penalty on ||u_t - u_{t-1}||^2 (reference: mpc.py:339-445).
    slew_rate_penalty: Optional[float] = None
    # Matrix-free IFT (BackwardMode.IFT) GMRES controls; total matvecs is
    # bounded by ift_restart * ift_maxiter, each one O(T) scan work. The
    # fixed-point operator is a strong contraction at a converged solve:
    # measured gradients match the unrolled-autodiff oracle to ~1e-7
    # relative even at tol=1e-3, restart=4 (TPU, pendulum B=256 T=20), so
    # these defaults carry ample margin at ~2x the cost of the minimum.
    # None = inherit back_eps when given, else 1e-4 (see backward_tol).
    ift_tol: Optional[float] = None
    ift_restart: int = 10
    ift_maxiter: int = 2
    # "gmres" (matrix-free, default) or "dense" -- materialize the adjoint
    # fixed-point system by probing (the reference's mechanism,
    # lqr_step_explicit.py:664-702); O(T*(nx+nu)) LQR solves per backward,
    # exact, for ill-conditioned fixed points.
    ift_solver: str = "gmres"
    # With ift_solver="gmres": when the adjoint residual exceeds
    # ift_tol * ||b|| after all restarts (weakly-contracting fixed point,
    # e.g. an under-converged forward solve), emit a host warning and
    # lax.cond into the exact dense probing solve. False = warn only.
    ift_fallback: bool = True
    # Module-KKT backward, nonlinear dynamics only: chain the dF cotangent
    # into the dynamics params (the complete derivative of the last LQR
    # subproblem). The reference does NOT -- its AUTO_DIFF diff=True
    # linearization calls torch.autograd.grad without create_graph
    # (mpc.py:538-549), so its dtheta flows only through
    # f = new_x - F tau with F held constant. False reproduces the
    # reference's gradients exactly (golden-tested,
    # tests/test_grad_modes.py::test_kkt_nonlinear_golden).
    kkt_grad_through_F: bool = True
    # Use the associative-scan Riccati (ops/parallel_riccati.py, O(log T)
    # depth) for UNCONSTRAINED backward passes -- a large-T / small-B
    # option; box/zero-masked solves always use the sequential recursion.
    riccati_parallel: bool = False

    def __post_init__(self):
        if self.back_eps is not None and self.backward_mode is not BackwardMode.IFT:
            raise ValueError(
                "back_eps sets the iterative backward-solve tolerance and "
                "only BackwardMode.IFT has one (the GMRES adjoint); the "
                f"{self.backward_mode.name} backward is an exact direct "
                "solve. Drop back_eps or use backward_mode=BackwardMode.IFT."
            )

    @property
    def backward_tol(self) -> float:
        """Effective IFT adjoint GMRES tolerance: ift_tol if set, else
        back_eps (the reference's knob name), else 1e-4."""
        if self.ift_tol is not None:
            return self.ift_tol
        if self.back_eps is not None:
            return self.back_eps
        return 1e-4

    @property
    def n_tau(self) -> int:
        return self.n_state + self.n_ctrl


class SolveResult(NamedTuple):
    """Output of a batched iLQR solve.

    x: [B, T, n_state] optimal state trajectory
    u: [B, T, n_ctrl] optimal controls
    costs: [B] per-example objective of the best-so-far trajectory
        (reference: mpc.py:336, best-tracking at mpc.py:271-285)
    converged: [B] bool, per-example ||full_du|| < eps at exit
    full_du_norm: [B] the alpha=1 control-step norm at the last iteration
        (reference: lqr_step.py:243-245)
    n_iter: [] int32, outer iLQR iterations executed
    """

    x: jax.Array
    u: jax.Array
    costs: jax.Array
    converged: jax.Array
    full_du_norm: jax.Array
    n_iter: jax.Array


def tree_batch_size(x_init: jax.Array) -> int:
    return x_init.shape[0]


CostFn = Callable[..., Any]  # callable cost: cost_fn(tau_t[n_tau]) -> scalar
DynFn = Callable[..., Any]  # callable dynamics: f(x[nx], u[nu], params) -> x'
