"""Whole-solve fused Pallas TPU kernel: the COMPLETE batched iLQR solve
(reference MPC.forward outer loop, mpc.py:248-301, plus every subroutine it
calls) as ONE kernel invocation per 1024-example batch tile.

Covers the hot configuration: n_ctrl == 1, QuadCost, callable Dynamics,
box bounds (or none -- encoded as +-inf), f32, closed-form 1-D box-QP.

Per grid cell (batch-on-lanes layout, see ops/pallas/__init__.py):

  for it in lqr_iter:                       # early-exits via a done flag
    1. open-loop rollout of u + objective   (util.get_traj/get_cost,
                                             util.py:104-153)
    2. linearization F_t = [dx'/dx | dx'/du] via jax.linearize of the env
       step at each point -- exact analytic Jacobians traced INTO the
       kernel (replaces the reference's hand-derived env_dx tensors,
       pendulum.py:127-515 etc.)
    3. delta-space cost shift c_back = C tau + c (lqr_step.py:284-295)
    4. backward Riccati recursion with closed-form QP (lqr_step.py:52-160)
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
`any(improved)`, line-search `any(worsened)`) run per 1024-example tile
instead of over the global batch. Extra line-search trials are idempotent
(unchanged alpha reproduces the same trial), and extra outer iterations can
only improve the best-tracked result, so results match the global-batch
rule whenever both run the same iterations (e.g. eps=0) and are otherwise
equal-or-better per example.
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
from ...types import GradMethod, ILQRConfig, QuadCost
from ...utils.kernel_math import kernel_context
from .riccati_fused import BT, _from_lanes, _pad_batch, _to_lanes


def fused_supported(cfg: ILQRConfig, cost, dyn, params, u_zero_I, delta_u,
                    dtype) -> bool:
    return (
        isinstance(cost, QuadCost)
        and isinstance(dyn, Dynamics)
        and cfg.n_ctrl == 1
        and u_zero_I is None
        and delta_u is None
        and cfg.qp_solver == "auto"
        and not cfg.unroll
        and cfg.grad_method in (GradMethod.ANALYTIC, GradMethod.AUTO_DIFF)
        and dyn.jacobian is None
        and dtype == jnp.float32
        and params is not None
        and getattr(jnp.asarray(params), "ndim", None) == 1
    )


def _ilqr_kernel(
    # statics bound via partial:
    T, nx, n_params, lqr_iter, eps, ls_decay, max_ls_iter, best_cost_eps,
    not_improved_lim, step_fn, lin_fn, cost_mode, u0_zero,
    *refs,
):
    """cost_mode: "lanes" (C_ref/c_ref are per-example lane tensors) or
    "smem" (Cs_ref (Tc, n*n) / cs_ref (Tc, n) SMEM scalars, Tc in {1, T}).
    u0_zero: warm start is zeros -> no u0 input ref.
    """
    n = nx + 1
    f32 = jnp.float32

    it_r = iter(refs)
    params_ref = next(it_r)
    xi_ref = next(it_r)
    if cost_mode == "lanes":
        C_ref = next(it_r)
        c_ref = next(it_r)
    else:
        Cs_ref = next(it_r)
        cs_ref = next(it_r)
    u0_ref = None if u0_zero else next(it_r)
    lb_ref = next(it_r)
    ub_ref = next(it_r)
    bx_ref = next(it_r)
    bu_ref = next(it_r)
    bc_ref = next(it_r)
    bdu_ref = next(it_r)
    it_ref = next(it_r)
    u_ref = next(it_r)
    x_ref = next(it_r)
    F_ref = next(it_r)
    cb_ref = next(it_r)
    K_ref = next(it_r)
    k_ref = next(it_r)
    V_ref = next(it_r)
    v_ref = next(it_r)
    nxt_ref = next(it_r)
    nut_ref = next(it_r)
    cc_ref = next(it_r)
    flags_ref = next(it_r)

    if cost_mode == "lanes":
        Cat = lambda t, i, j: C_ref[t, i, j]
        cat = lambda t, i: c_ref[t, i]
    else:
        per_t = Cs_ref.shape[0] > 1
        Cat = lambda t, i, j: Cs_ref[t if per_t else 0, i * n + j]
        cat = lambda t, i: cs_ref[t if per_t else 0, i]

    params = [params_ref[0, i] for i in range(n_params)]
    x_init = xi_ref[...]

    if u0_zero:
        u_ref[...] = jnp.zeros(u_ref.shape, f32)
    else:
        u_ref[...] = u0_ref[...]
    F_ref[...] = jnp.zeros(F_ref.shape, f32)
    bc_ref[...] = jnp.full((8, 128), jnp.inf, f32)
    bdu_ref[...] = jnp.full((8, 128), jnp.inf, f32)
    bx_ref[...] = jnp.zeros(bx_ref.shape, f32)
    bu_ref[...] = jnp.zeros(bu_ref.shape, f32)
    flags_ref[0] = 0
    flags_ref[1] = 0
    flags_ref[2] = 0

    step = lambda x, u: step_fn(x, u, params)      # clamped true dynamics
    lin_step = lambda x, u: lin_fn(x, u, params)   # linearization point

    def obj_t(t, xt, ut):
        """0.5 tau^T C_t tau + c_t^T tau, tau = (xt, ut). [8,128]."""
        tau = [xt[i] for i in range(nx)] + [ut]
        acc = None
        for i in range(n):
            row = cat(t, i)
            for j in range(n):
                row = row + 0.5 * Cat(t, i, j) * tau[j]
            term = tau[i] * row
            acc = term if acc is None else acc + term
        return acc

    def outer_body(it, _):
        @pl.when(flags_ref[0] == 0)
        def _():
            # ---- 1) open-loop rollout + objective (util.py:104-153) ----
            def roll(t, carry):
                xt, cost = carry
                x_ref[t] = xt
                ut = u_ref[t]
                cost = cost + obj_t(t, xt, ut)
                xn = step(xt, ut[None])
                return xn, cost

            _, old_cost = lax.fori_loop(
                0, T, roll, (x_init, jnp.zeros((8, 128), f32))
            )

            # ---- 2+3) linearize + delta-space shift (mpc.py:489-543,
            # lqr_step.py:284-295). One jax.linearize per timestep; n
            # tangent probes build F_t exactly. ----
            def basis(size, hot):
                return jnp.stack(
                    [
                        jnp.full((8, 128), 1.0 if a == hot else 0.0, f32)
                        for a in range(size)
                    ]
                )

            def lin_body(t, _c):
                xt = x_ref[t]
                ut = u_ref[t]
                _, jvp = jax.linearize(lin_step, xt, ut[None])
                for j in range(n):
                    if j < nx:
                        tj = jvp(basis(nx, j), basis(1, -1))
                    else:
                        tj = jvp(basis(nx, -1), basis(1, 0))
                    for a in range(nx):
                        F_ref[t, a, j] = tj[a]
                return 0

            lax.fori_loop(0, T - 1, lin_body, 0)

            def cb_body(t, _c):
                xt = x_ref[t]
                ut = u_ref[t]
                tau = [xt[i] for i in range(nx)] + [ut]
                for i in range(n):
                    acc = cat(t, i) + Cat(t, i, 0) * tau[0]
                    for j in range(1, n):
                        acc = acc + Cat(t, i, j) * tau[j]
                    cb_ref[t, i] = acc
                return 0

            lax.fori_loop(0, T, cb_body, 0)

            # ---- 4) backward Riccati with closed-form 1-D box-QP
            # (lqr_step.py:52-160; see riccati_fused.py) ----
            V_ref[...] = jnp.zeros(V_ref.shape, f32)
            v_ref[...] = jnp.zeros(v_ref.shape, f32)

            def ric_body(i, _c):
                t = T - 1 - i
                V = [[V_ref[a, b] for b in range(nx)] for a in range(nx)]
                v = [v_ref[a] for a in range(nx)]
                Ft = F_ref[t]
                F = [[Ft[a, j] for j in range(n)] for a in range(nx)]
                tmp = [
                    [
                        functools.reduce(
                            lambda acc, b: acc + V[a][b] * F[b][j],
                            range(1, nx),
                            V[a][0] * F[0][j],
                        )
                        for j in range(n)
                    ]
                    for a in range(nx)
                ]
                Q = [[None] * n for _ in range(n)]
                for i_ in range(n):
                    for j in range(i_, n):
                        acc = Cat(t, i_, j) + F[0][i_] * tmp[0][j]
                        for a in range(1, nx):
                            acc = acc + F[a][i_] * tmp[a][j]
                        Q[i_][j] = acc
                        Q[j][i_] = acc
                q = []
                for i_ in range(n):
                    acc = cb_ref[t, i_]
                    for a in range(nx):
                        acc = acc + F[a][i_] * v[a]
                    q.append(acc)

                Quu = Q[nx][nx]
                qu = q[nx]
                lb = lb_ref[t] - u_ref[t]
                ub = ub_ref[t] - u_ref[t]
                kt = jnp.clip(-qu / Quu, lb, ub)
                g = Quu * kt + qu
                Ic = ((kt <= lb) & (g > 0.0)) | ((kt >= ub) & (g < 0.0))
                If = jnp.where(Ic, 0.0, 1.0)
                H_free = Quu * If + 1e-11
                K = [-(Q[nx][j] * If) / H_free for j in range(nx)]

                qu_plus = qu + Quu * kt
                for a in range(nx):
                    for b in range(a, nx):
                        Vn = Q[a][b] + Q[a][nx] * K[b] + K[a] * Q[b][nx] \
                            + Quu * K[a] * K[b]
                        V_ref[a, b] = Vn
                        if b != a:
                            V_ref[b, a] = Vn
                    v_ref[a] = q[a] + Q[a][nx] * kt + K[a] * qu_plus
                    K_ref[t, a] = K[a]
                k_ref[t] = kt
                return 0

            lax.fori_loop(0, T, ric_body, 0)

            # ---- 5) batched backtracking line search
            # (lqr_step.py:164-261) ----
            def trial(alpha, record_du):
                def tbody(t, carry):
                    xt, cost, du2 = carry
                    dxt = xt - x_ref[t]
                    Kt = K_ref[t]
                    new_u = jnp.sum(Kt * dxt, axis=0) + u_ref[t] \
                        + alpha * k_ref[t]
                    new_u = jnp.clip(new_u, lb_ref[t], ub_ref[t])
                    if record_du:
                        d = u_ref[t] - new_u
                        du2 = du2 + d * d
                    nxt_ref[t] = xt
                    nut_ref[t] = new_u
                    cost = cost + obj_t(t, xt, new_u)
                    xn = step(xt, new_u[None])
                    return xn, cost, du2

                z = jnp.zeros((8, 128), f32)
                _, cost, du2 = lax.fori_loop(0, T, tbody, (x_init, z, z))
                return cost, du2

            ones = jnp.ones((8, 128), f32)
            cc0, du2 = trial(ones, record_du=True)
            cc_ref[...] = cc0
            cur_du = jnp.sqrt(du2)
            alpha0 = jnp.where(cc0 > old_cost, ls_decay, 1.0)

            def ls_body(i, alpha):
                @pl.when(jnp.any(cc_ref[...] > old_cost))
                def _():
                    cc, _ = trial(alpha, record_du=False)
                    cc_ref[...] = cc
                return jnp.where(cc_ref[...] > old_cost, alpha * ls_decay,
                                 alpha)

            lax.fori_loop(1, max_ls_iter, ls_body, alpha0)
            cc = cc_ref[...]

            # accept the last trial (lqr_step.py:247 semantics)
            u_ref[...] = nut_ref[...]

            # ---- 6) best tracking + stopping rule (mpc.py:266-301) ----
            improved = cc <= bc_ref[...] + best_cost_eps
            impx = improved[None, None]
            bx_ref[...] = jnp.where(impx, nxt_ref[...], bx_ref[...])
            bu_ref[...] = jnp.where(improved[None], nut_ref[...], bu_ref[...])
            bc_ref[...] = jnp.where(improved, cc, bc_ref[...])
            bdu_ref[...] = jnp.where(improved, cur_du, bdu_ref[...])

            nni = flags_ref[1]
            nni = jnp.where((it > 0) & jnp.any(improved), 0, nni + 1)
            flags_ref[1] = nni
            stop = (jnp.max(cur_du) < eps) | (nni > not_improved_lim)
            flags_ref[0] = jnp.where(stop, 1, 0)
            flags_ref[2] = flags_ref[2] + 1

        return 0

    lax.fori_loop(0, lqr_iter, outer_body, 0)
    it_ref[...] = jnp.full((8, 128), 1.0, f32) * flags_ref[2].astype(f32)


def ilqr_fused(
    cfg: ILQRConfig,
    dyn: Dynamics,
    params,
    x_init: jax.Array,   # [B, nx]
    C: jax.Array,        # [T, B, n, n] time-major (canonicalized)
    c: jax.Array,        # [T, B, n]
    u_init: Optional[jax.Array],  # [T, B, 1]; None = zeros warm start
    u_lower=None,
    u_upper=None,
    cost_small=None,     # optional pre-broadcast (C, c): [n,n]/[T,n,n] etc.
    interpret: bool = False,
):
    """Run the fused whole-solve kernel. Returns time-major
    (x [T,B,nx], u [T,B,1], costs [B], full_du_norm [B], n_iter [])."""
    T, B = cfg.T, x_init.shape[0]
    nx, n = cfg.n_state, cfg.n_state + 1
    f32 = jnp.float32
    params = jnp.asarray(params, f32)
    n_params = params.shape[0]

    Bp = -(-B // BT) * BT
    G = Bp // BT

    # --- cost: SMEM scalars when example-invariant, lanes otherwise ---
    cost_mode = "lanes"
    if cost_small is not None:
        Cs, cs = cost_small
        Cs = jnp.asarray(Cs, f32)
        cs = jnp.asarray(cs, f32)
        if Cs.ndim == 2 and cs.ndim == 1:
            cost_mode = "smem"
            Cs_in = Cs.reshape(1, n * n)
            cs_in = cs.reshape(1, n)
        elif Cs.ndim == 3 and cs.ndim == 2 and Cs.shape[0] == T:
            cost_mode = "smem"
            Cs_in = Cs.reshape(T, n * n)
            cs_in = cs.reshape(T, n)

    if cost_mode == "lanes":
        C_p = _pad_batch(C.astype(f32), B, Bp)
        if Bp != B:
            eye = jnp.broadcast_to(jnp.eye(n, dtype=f32), (T, Bp - B, n, n))
            C_p = C_p.at[:, B:].set(eye)
        c_p = _pad_batch(c.astype(f32), B, Bp)
        cost_in = [_to_lanes(C_p, T, Bp), _to_lanes(c_p, T, Bp)]
        cost_specs = [_bspec(T, (n, n)), _bspec(T, (n,))]
    else:
        cost_in = [Cs_in, cs_in]
        cost_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]

    u0_zero = u_init is None
    u_in = []
    u_specs = []
    if not u0_zero:
        u_p = _pad_batch(u_init.astype(f32), B, Bp)
        u_in = [_to_lanes(u_p[..., 0], T, Bp)]
        u_specs = [_bspec(T, ())]

    def expand_bound(val, sign):
        if val is None:
            return jnp.full((T, Bp), sign * jnp.inf, f32)
        if jnp.ndim(val) == 0:
            return jnp.broadcast_to(jnp.asarray(val, f32), (T, Bp))
        return _pad_batch(jnp.broadcast_to(val, (T, B, 1)), B, Bp)[..., 0]

    lb_l = _to_lanes(expand_bound(u_lower, -1.0), T, Bp)
    ub_l = _to_lanes(expand_bound(u_upper, +1.0), T, Bp)

    xi_p = _pad_batch(x_init.astype(f32)[None], B, Bp)[0]  # [Bp, nx]
    xi_l = xi_p.T.reshape(nx, G, 8, 128)

    kernel = functools.partial(
        _ilqr_kernel, T, nx, n_params, cfg.lqr_iter, cfg.eps,
        cfg.linesearch_decay, cfg.max_linesearch_iter, cfg.best_cost_eps,
        cfg.not_improved_lim, dyn.step, dyn.linearize_point, cost_mode,
        u0_zero,
    )

    with kernel_context():
        out = pl.pallas_call(
            _squeeze_io(kernel, cost_mode),
            grid=(G,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # params (1, P)
                _bspec(None, (nx,)),  # x_init
            ] + cost_specs + u_specs + [
                _bspec(T, ()),        # lb
                _bspec(T, ()),        # ub
            ],
            out_specs=[
                _bspec(T, (nx,)),     # bx
                _bspec(T, ()),        # bu
                _bspec(None, ()),     # bc
                _bspec(None, ()),     # bdu
                _bspec(None, ()),     # iters
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, nx, G, 8, 128), f32),
                jax.ShapeDtypeStruct((T, G, 8, 128), f32),
                jax.ShapeDtypeStruct((G, 8, 128), f32),
                jax.ShapeDtypeStruct((G, 8, 128), f32),
                jax.ShapeDtypeStruct((G, 8, 128), f32),
            ],
            scratch_shapes=[
                pltpu.VMEM((T, 8, 128), f32),          # u
                pltpu.VMEM((T, nx, 8, 128), f32),      # x
                pltpu.VMEM((T, nx, n, 8, 128), f32),   # F
                pltpu.VMEM((T, n, 8, 128), f32),       # cb
                pltpu.VMEM((T, nx, 8, 128), f32),      # K
                pltpu.VMEM((T, 8, 128), f32),          # k
                pltpu.VMEM((nx, nx, 8, 128), f32),     # V
                pltpu.VMEM((nx, 8, 128), f32),         # v
                pltpu.VMEM((T, nx, 8, 128), f32),      # nxt
                pltpu.VMEM((T, 8, 128), f32),          # nut
                pltpu.VMEM((8, 128), f32),             # cc
                pltpu.SMEM((4,), jnp.int32),           # flags
            ],
            interpret=interpret,
        )(params.reshape(1, n_params), xi_l, *cost_in, *u_in, lb_l, ub_l)

    bx_l, bu_l, bc_l, bdu_l, it_l = out
    x = _from_lanes(bx_l, T, B)             # [T,B,nx]
    u = _from_lanes(bu_l, T, B)[..., None]  # [T,B,1]
    costs = bc_l.reshape(-1)[:B]
    du = bdu_l.reshape(-1)[:B]
    n_iter = jnp.max(it_l).astype(jnp.int32)
    return x, u, costs, du, n_iter


def _bspec(T, small):
    """BlockSpec for a lanes array [*lead, *small, G, 8, 128] blocked to
    group g. T=None means no leading time dim."""
    lead = () if T is None else (T,)
    m = len(lead) + len(small)
    return pl.BlockSpec(
        lead + small + (1, 8, 128),
        lambda g, m=m: (0,) * m + (g, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _squeeze_io(kernel, cost_mode):
    """View away the size-1 grid-blocked batch-group dim on tensor refs
    (SMEM refs and scratch refs pass through untouched)."""

    class _V:
        __slots__ = ("r",)

        def __init__(self, r):
            self.r = r

        @property
        def shape(self):
            s = self.r.shape
            return s[:-3] + s[-2:]

        def _fix(self, idx):
            if idx is Ellipsis:
                idx = ()
            elif not isinstance(idx, tuple):
                idx = (idx,)
            n_small = len(self.r.shape) - 3
            assert len(idx) <= n_small
            return idx + (slice(None),) * (n_small - len(idx)) + (0,)

        def __getitem__(self, idx):
            return self.r[self._fix(idx)]

        def __setitem__(self, idx, val):
            self.r[self._fix(idx)] = val

    n_smem_cost = 2 if cost_mode == "smem" else 0

    def wrapped(*refs):
        out = [refs[0]]  # params SMEM
        i = 1
        out.append(_V(refs[i])); i += 1  # x_init
        if n_smem_cost:
            out.append(refs[i]); i += 1  # Cs SMEM
            out.append(refs[i]); i += 1  # cs SMEM
        else:
            out.append(_V(refs[i])); i += 1  # C lanes
            out.append(_V(refs[i])); i += 1  # c lanes
        # remaining tensor refs (u0?, lb, ub, 5 outputs) are lane tensors;
        # scratch refs (the final 12) pass through raw
        n_tensor = len(refs) - i - 12
        for _ in range(n_tensor):
            out.append(_V(refs[i])); i += 1
        out.extend(refs[i:])
        kernel(*out)

    return wrapped
