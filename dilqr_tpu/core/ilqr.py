"""The batched iLQR outer loop.

TPU-native re-implementation of the reference MPC.forward outer loop
(mpc.py:248-301 / mpc_explicit.py:246-299) as a bounded ``lax.while_loop``
(or a fixed-trip masked scan for reverse-mode differentiability):

 * each iteration: open-loop rollout of the current u, linearization,
   delta-space cost shift ``c_back = C tau + c`` (lqr_step.py:284-295), one
   Riccati backward + line-searched forward (lqr_step.py:303-305)
 * per-example best-so-far tracking with best_cost_eps tolerance
   (mpc.py:271-285)
 * stop when max(full_du_norm) < eps or no improvement for
   not_improved_lim iterations (mpc.py:299-301)

All arrays time-major [T, B, ...] here; the public API (solver.py)
transposes from batch-major.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..models.base import Dynamics
from ..ops.riccati import lqr_backward
from ..ops.rollout import get_traj, lqr_forward
from ..types import GradMethod, ILQRConfig, LinDx, QuadCost
from ..utils.batch import bmv
from ..utils.loops import bounded_while
from .linearize import approximate_cost, linearize_dynamics


from ..utils.platform import target_platform as _target_platform  # noqa: E402
# (re-exported under the historical name; see utils/platform.py for the
# committed-platform-vs-default-backend dispatch rationale)


class ILQRInternal(NamedTuple):
    x: jax.Array  # [T, B, nx] best trajectory
    u: jax.Array  # [T, B, nu]
    costs: jax.Array  # [B]
    full_du_norm: jax.Array  # [B] of the best iterate
    n_iter: jax.Array  # []


def _linearize(cfg: ILQRConfig, dyn, params, x, u):
    if isinstance(dyn, LinDx):
        return dyn.F, dyn.f
    # ANALYTIC differentiates the UN-clamped physics (the reference's
    # hand-derived packs do, env_dx/pendulum.py:444-475); AUTO_DIFF must
    # differentiate the CLAMPED forward instead -- the reference's
    # autograd path (mpc.py:534-549) takes d(dynamics(x,u)) through the
    # torque clamp, so saturated controls get ZERO Jacobian columns.
    # Differential-fuzzed vs the live reference (scripts/
    # fuzz_vs_reference.py): unbounded pendulum-complex diverged by O(1)
    # in u before this distinction.
    lin_fn = (None if cfg.grad_method is GradMethod.AUTO_DIFF
              else dyn.linearize_point)
    return linearize_dynamics(
        dyn.step,
        params,
        x,
        u,
        method=cfg.grad_method,
        jacobian_fn=dyn.jacobian,
        fd_eps=cfg.fd_eps,
        linearize_fn=lin_fn,
    )


def _quadraticize(cfg: ILQRConfig, cost, x, u):
    if isinstance(cost, QuadCost):
        return cost.C, cost.c
    C, c, _ = approximate_cost(cost, x, u)
    return C, c


def lqr_step(
    cfg: ILQRConfig,
    cost,
    dyn,
    params,
    x_init: jax.Array,
    x: jax.Array,
    u: jax.Array,
    u_lower=None,
    u_upper=None,
    u_zero_I=None,
    delta_u=None,
    backend: Optional[str] = None,
):
    """One backward+forward iLQR sweep (reference LQRStepFn.forward,
    lqr_step.py:277-309). Returns (new_x, new_u, LqrForOut, n_qp_iter).

    ``backend``: resolved execution backend for the Riccati dispatch --
    callers that can see the committed platform of eager inputs (e.g.
    ilqr_loop via _target_platform(x_init)) pass "xla" for CPU execution
    so the scan body (where everything is a tracer) never hands a
    compiled Pallas kernel to a CPU device. Defaults to cfg.backend."""
    if backend is None:
        backend = cfg.backend
    T = cfg.T
    F, f = _linearize(cfg, dyn, params, x, u)
    C, c = _quadraticize(cfg, cost, x, u)
    tau = jnp.concatenate([x, u], axis=-1)
    c_back = bmv(C, tau) + c  # delta-space shift (lqr_step.py:284-295)
    ric = lqr_backward(
        cfg.n_state,
        cfg.n_ctrl,
        C,
        c_back,
        F,
        None,  # f_back is None in delta space (lqr_step.py:296)
        u,
        u_lower=u_lower,
        u_upper=u_upper,
        u_zero_I=u_zero_I,
        delta_u=delta_u,
        pnqp_iter=cfg.pnqp_iter,
        unroll=cfg.unroll,
        qp_solver=cfg.qp_solver,
        # Pallas kernels have no autodiff rules; the unrolled-autodiff
        # oracle must stay on the pure-XLA path
        backend="xla" if cfg.unroll else backend,
        parallel=cfg.riccati_parallel,
    )
    dyn_roll = dyn if isinstance(dyn, LinDx) else (dyn.step, params)
    new_x, new_u, out = lqr_forward(
        T,
        cfg.n_state,
        cfg.n_ctrl,
        x_init,
        cost,
        dyn_roll,
        x,
        u,
        ric.K,
        ric.k,
        u_lower=u_lower,
        u_upper=u_upper,
        u_zero_I=u_zero_I,
        delta_u=delta_u,
        linesearch_decay=cfg.linesearch_decay,
        max_linesearch_iter=cfg.max_linesearch_iter,
        unroll=cfg.unroll,
    )
    return new_x, new_u, out, ric.n_total_qp_iter


def ilqr_loop(
    cfg: ILQRConfig,
    cost,
    dyn,
    params,
    x_init: jax.Array,
    u_init: jax.Array,
    u_lower=None,
    u_upper=None,
    u_zero_I=None,
    delta_u=None,
    cost_small=None,
    u_init_zero: bool = False,
    cost_struct=None,
) -> ILQRInternal:
    """Run up to cfg.lqr_iter iterations with best-tracking and the
    reference's stopping rule. u_init: [T, B, nu] (already broadcast).

    cost_small: the user's pre-broadcast QuadCost arrays ([n,n]/[T,n,n]),
    if example-invariant -- lets the fused kernel skip the [T,B,n,n]
    lanes transpose. u_init_zero: the warm start is known to be zeros.
    cost_struct: for callable costs, the structured (cost_fn, cost_params)
    pair -- lets the fused kernel quadraticize the cost in-kernel when
    the fn is lane-compatible and the params are a flat array (or empty).
    """
    T, B = cfg.T, x_init.shape[0]
    dtype = x_init.dtype

    use_fused = False
    if cfg.backend != "xla":
        from ..ops.pallas.ilqr_fused import (_flatten_pytree_params,
                                             cost_lane_compatible,
                                             fused_supported, ilqr_fused,
                                             lane_compatible)

        # pytree dynamics params (NNDynamics weight lists) flatten into
        # the kernel's SMEM scalar vector; the step sees the scalar list
        # (models/nn_dynamics.py step_scalars). The XLA path below keeps
        # the original pytree.
        kparams = params
        if not isinstance(dyn, LinDx):
            flat = _flatten_pytree_params(params)
            if flat is not None:
                kparams = flat

        quad = isinstance(cost, QuadCost)
        cost_callable = None
        if not quad and cost_struct is not None:
            cfn, cin = cost_struct
            empty = isinstance(cin, (tuple, list)) and len(cin) == 0
            flat = empty or getattr(cin, "ndim", None) == 1
            n_cp = 0 if empty else (int(cin.shape[0]) if flat else 0)
            if flat and cost_lane_compatible(cfn, cfg.n_tau, n_cp):
                cost_callable = (cfn, None if empty else cin)

        use_fused = fused_supported(
            cfg, cost, dyn, kparams, u_zero_I, delta_u, dtype,
            cost_small=cost_small, u_init_zero=u_init_zero,
            u_lower=u_lower, u_upper=u_upper,
            callable_cost=cost_callable is not None,
        ) and (
            isinstance(dyn, LinDx)  # F/f ride in as data; nothing to probe
            or lane_compatible(dyn, kparams, cfg.n_state, cfg.n_ctrl)
        )

        def fused_call(interpret):
            return ILQRInternal(
                *ilqr_fused(
                    cfg,
                    dyn,
                    kparams,
                    x_init,
                    cost.C if quad else None,
                    cost.c if quad else None,
                    None if u_init_zero else u_init,
                    u_lower=u_lower,
                    u_upper=u_upper,
                    u_zero_I=u_zero_I,
                    delta_u=delta_u,
                    cost_small=cost_small if quad else None,
                    cost_callable=cost_callable,
                    interpret=interpret,
                )
            )

        if use_fused and cfg.backend == "pallas":
            # forced: compiled on TPU, interpreter elsewhere (tests)
            return fused_call(interpret=_target_platform(x_init) != "tpu")

    dyn_roll = dyn if isinstance(dyn, LinDx) else (dyn.step, params)

    # Resolve the Riccati backend HERE, where x_init may still be a
    # committed eager array: inside the while_loop body everything is a
    # tracer, so lqr_backward's own platform sniff would fall back to
    # jax.default_backend() (== "tpu" under the axon plugin) and compile a
    # Pallas kernel for a CPU execution (ADVICE r4: reproduced for the
    # eager nu==1/f32 case).
    eff_backend = cfg.backend
    if eff_backend == "auto" and _target_platform(x_init) != "tpu":
        eff_backend = "xla"

    def iteration(u):
        x = get_traj(T, u, x_init, dyn_roll)
        return lqr_step(
            cfg,
            cost,
            dyn,
            params,
            x_init,
            x,
            u,
            u_lower=u_lower,
            u_upper=u_upper,
            u_zero_I=u_zero_I,
            delta_u=delta_u,
            backend=eff_backend,
        )

    inf = jnp.full((B,), jnp.inf, dtype)

    def cond(carry):
        (u, bx, bu, bc, bdu, nni, cur_du, i) = carry
        stop = (jnp.max(cur_du) < cfg.eps) | (nni > cfg.not_improved_lim)
        return (i < cfg.lqr_iter) & ~stop

    def body(carry):
        (u, bx, bu, bc, bdu, nni, cur_du, i) = carry
        new_x, new_u, out, n_qp = iteration(u)
        from ..utils.callbacks import supports_host_callback

        if cfg.verbose >= 1 and supports_host_callback():
            from ..utils.logging import debug_table_log

            debug_table_log(
                "ilqr",
                iter=i,
                mean_cost=jnp.mean(out.costs),
                du_max=jnp.max(out.full_du_norm),
                mean_alpha=out.mean_alphas,
            )
        improved = out.costs <= bc + cfg.best_cost_eps
        bx = jnp.where(improved[None, :, None], new_x, bx)
        bu = jnp.where(improved[None, :, None], new_u, bu)
        bc = jnp.where(improved, out.costs, bc)
        bdu = jnp.where(improved, out.full_du_norm, bdu)
        # reference increments then resets if any example improved, except
        # on the very first iteration (mpc.py:266, 281)
        nni = jnp.where((i > 0) & jnp.any(improved), 0, nni + 1)
        return (new_u, bx, bu, bc, bdu, nni, out.full_du_norm, i + 1)

    def xla_loop():
        carry0 = (
            u_init,
            jnp.zeros((T, B, cfg.n_state), dtype),
            jnp.zeros((T, B, cfg.n_ctrl), dtype),
            inf,
            inf,
            jnp.int32(0),
            inf,
            jnp.int32(0),
        )
        (_, bx, bu, bc, bdu, _, _, i) = bounded_while(
            cond, body, carry0, max_steps=cfg.lqr_iter, unroll=cfg.unroll
        )
        return ILQRInternal(bx, bu, bc, bdu, i)

    if use_fused and _target_platform(x_init) == "tpu":
        # backend="auto" keys on the committed platform of the (eager)
        # x_init when it has one, else jax.default_backend() at trace
        # time. A lowering-time platform switch (lax.platform_dependent)
        # does not work here: it lowers ALL branches and pallas_call has
        # no compiled CPU lowering. Programs that trace for CPU devices
        # under jit while a TPU plugin is registered (e.g. a virtual CPU
        # mesh -- tracers carry no device) must pass backend="xla"
        # explicitly; EAGER calls on CPU-committed arrays dispatch
        # correctly without it.
        try:
            return fused_call(interpret=False)
        except ValueError as e:
            if "captures constants" not in str(e):
                raise
            # the env step closes over array constants -- Pallas kernels
            # only admit scalar captures (lane_compatible catches shape
            # incompatibilities; this catches shape-compatible captures)
    return xla_loop()
