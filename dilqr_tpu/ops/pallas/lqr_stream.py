"""Streaming (time-blocked) Pallas kernels for horizons too long for the
whole-solve megakernel's VMEM budget (ops/pallas/ilqr_fused.py).

Instead of keeping [T, ...] state resident in VMEM, these kernels grid over
(batch-tile, time): the sequential carry (Riccati cost-to-go / rollout
state) lives in scratch, which Pallas persists across the sequential grid,
while the per-timestep arrays (x, u, K, k) stream through t-blocked HBM
refs -- Pallas double-buffers the DMA against compute automatically. The
iLQR outer loop, line-search alpha updates, and best-tracking run in XLA
on the lanes-layout arrays between kernel launches (elementwise, cheap; no
layout transposes between stages).

Per iLQR iteration (plus one initial zero-gain rollout):
  riccati_stream  grid (G, T), t descending: F_t = jax.linearize(step) at
                  the use site; closed-form 1-D QP / in-kernel pnqp gains;
                  streams K_t, k_t out
  forward_stream  grid (G, T), t ascending: closed-loop sweep for a given
                  per-example alpha; cost-only (line-search trials) or
                  trajectory-writing (the accept pass / initial rollout --
                  gains zeroed make it the open-loop rollout)

Supported: QuadCost with a concrete time-invariant DIAGONAL cost (the
get_true_obj spec; a general cost would overflow SMEM at large T),
n_ctrl <= 3, f32, static bounds, flat params. Anything else falls back.
Semantics deviations from the XLA path are the same per-tile-reduction
ones as the megakernel (see ilqr_fused.py docstring).
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
from .ilqr_fused import (PNQP_REG, _inv_lanes, _is_flat_params, _mm,
                         _mv, _pnqp_lanes, _static_bounds)
from .layout import BT, from_lanes, pad_batch, to_lanes


def stream_supported(cfg: ILQRConfig, cost, dyn, params, u_zero_I, delta_u,
                     dtype, cost_small, u_lower, u_upper) -> bool:
    if not (
        isinstance(cost, QuadCost)
        and isinstance(dyn, Dynamics)
        # pinned independently of the megakernel's MAX_NU: this
        # EXPERIMENTAL backend is only exercised by tests at nu <= 3
        and 1 <= cfg.n_ctrl <= 3
        and u_zero_I is None
        and delta_u is None
        and cfg.qp_solver == "auto"
        and not cfg.unroll
        and cfg.verbose < 1
        and cfg.grad_method in (GradMethod.ANALYTIC, GradMethod.AUTO_DIFF)
        and dyn.jacobian is None
        and dtype == jnp.float32
        and _is_flat_params(params)
        and _static_bounds(u_lower, u_upper, cfg.n_ctrl) is not None
        and cost_small is not None
    ):
        return False
    import numpy as np

    Cs, cs = cost_small
    if isinstance(Cs, jax.core.Tracer) or isinstance(cs, jax.core.Tracer):
        return False
    Cs = np.asarray(Cs)
    if Cs.ndim != 2:  # time-invariant diagonal only
        return False
    return bool(np.all(Cs == Cs * np.eye(Cs.shape[-1], dtype=Cs.dtype)))


def _tspec(small, rev_t, T):
    """One t-slab per grid step of [T, *small, G, 8, 128]."""
    m = len(small)
    if rev_t:
        imap = lambda g, i, m=m, T=T: (T - 1 - i,) + (0,) * m + (g, 0, 0)
    else:
        imap = lambda g, i, m=m: (i,) + (0,) * m + (g, 0, 0)
    return pl.BlockSpec((1,) + small + (1, 8, 128), imap,
                        memory_space=pltpu.VMEM)


def _gspec(small):
    """t-invariant per-batch-tile block of [*small, G, 8, 128]."""
    m = len(small)
    return pl.BlockSpec(small + (1, 8, 128),
                        lambda g, i, m=m: (0,) * m + (g, 0, 0),
                        memory_space=pltpu.VMEM)


def _const_vec(vals):
    return jnp.stack([jnp.full((8, 128), v, jnp.float32) for v in vals])


def _diag_obj(qd, pd, xt, ut, nx, nu):
    """0.5 sum q_i tau_i^2 + sum p_i tau_i (diagonal cost) on lanes."""
    acc = None
    for i in range(nx):
        term = xt[i] * (0.5 * qd[i] * xt[i] + pd[i])
        acc = term if acc is None else acc + term
    for j in range(nu):
        i = nx + j
        acc = acc + ut[j] * (0.5 * qd[i] * ut[j] + pd[i])
    return acc


def _sq(ref):
    """Squeeze the t- and g- block dims of a _tspec ref slab."""
    idx = (0,) + (slice(None),) * (len(ref.shape) - 4) + (0,)
    return ref[idx]


def _sq_set(ref, val):
    idx = (0,) + (slice(None),) * (len(ref.shape) - 4) + (0,)
    ref[idx] = val


def _riccati_kernel(T, nx, nu, n_params, pnqp_iter, bounds, lin_step,
                    params_ref, qd_ref, pd_ref, x_ref, u_ref,
                    K_ref, k_ref, V_ref, v_ref, kwarm_ref):
    """Grid (G, T), i ascending = t descending; V/v persist in scratch."""
    n = nx + nu
    f32 = jnp.float32
    i = pl.program_id(1)
    t = T - 1 - i
    params = [params_ref[0, a] for a in range(n_params)]
    qd = [qd_ref[0, a] for a in range(n)]
    pd = [pd_ref[0, a] for a in range(n)]
    lb_c = _const_vec(bounds[0])
    ub_c = _const_vec(bounds[1])

    @pl.when(i == 0)
    def _():
        V_ref[...] = jnp.zeros(V_ref.shape, f32)
        v_ref[...] = jnp.zeros(v_ref.shape, f32)

    xt = _sq(x_ref)
    ut = _sq(u_ref)
    V = V_ref[...]
    v = v_ref[...]

    def basis(size, hot):
        return jnp.stack([
            jnp.full((8, 128), 1.0 if a == hot else 0.0, f32)
            for a in range(size)
        ])

    _, jvp = jax.linearize(lambda a, b: lin_step(a, b, params), xt, ut)
    cols = []
    for j in range(n):
        if j < nx:
            cols.append(jvp(basis(nx, j), basis(nu, -1)))
        else:
            cols.append(jvp(basis(nx, -1), basis(nu, j - nx)))
    F = jnp.where(t < T - 1, jnp.stack(cols, axis=1), 0.0)

    tau = jnp.concatenate([xt, ut], axis=0)
    qvec = jnp.stack(
        [jnp.broadcast_to(qd[a], (8, 128)) for a in range(n)]
    )
    pvec = jnp.stack([jnp.broadcast_to(pd[a], (8, 128)) for a in range(n)])
    cb = qvec * tau + pvec  # delta-space c (diagonal C)

    tmp = _mm(jnp.swapaxes(V, 0, 1), F)
    FT = jnp.swapaxes(F, 0, 1)
    Q = _mm(FT, tmp)
    eye_n = jnp.stack(
        [jnp.stack([jnp.full((8, 128), 1.0 if a == b else 0.0, f32)
                    for b in range(n)]) for a in range(n)]
    )
    Q = Q + qvec[:, None] * eye_n  # diagonal cost added on the diagonal
    q = cb + _mv(FT, v)

    Qxx = Q[:nx, :nx]
    Qxu = Q[:nx, nx:]
    Qux = Q[nx:, :nx]
    Quu = Q[nx:, nx:]
    qx = q[:nx]
    qu = q[nx:]
    lb = lb_c - ut
    ub = ub_c - ut

    if nu == 1:
        H = Quu[0, 0]
        kt = jnp.clip(-qu / H, lb, ub)
        g = H * kt[0] + qu[0]
        Ic = ((kt[0] <= lb[0]) & (g > 0.0)) | ((kt[0] >= ub[0]) & (g < 0.0))
        If = jnp.where(Ic, 0.0, 1.0)[None]
        H_free = (H * If[0] + PNQP_REG)[None, None]
    else:
        eye_u = jnp.stack(
            [jnp.stack([jnp.full((8, 128), 1.0 if a == b else 0.0, f32)
                        for b in range(nu)]) for a in range(nu)]
        )
        Hinv0 = _inv_lanes(Quu + PNQP_REG * eye_u, nu)
        default_init = -_mv(Hinv0, qu)
        warm = jnp.where(t < T - 1, kwarm_ref[...],
                         jnp.clip(default_init, lb, ub))
        kt, If, H_free = _pnqp_lanes(Quu, qu, lb, ub, warm, pnqp_iter, nu)

    Qux_m = Qux * If[:, None]
    Hinv = _inv_lanes(H_free, nu)
    K = -_mm(Hinv, Qux_m)

    KT = jnp.swapaxes(K, 0, 1)
    V_ref[...] = Qxx + _mm(Qxu, K) + _mm(KT, Qux) + _mm(KT, _mm(Quu, K))
    v_ref[...] = qx + _mv(Qxu, kt) + _mv(KT, qu) + _mv(KT, _mv(Quu, kt))
    kwarm_ref[...] = kt
    _sq_set(K_ref, K)
    _sq_set(k_ref, kt)


def _forward_kernel(T, nx, nu, n_params, bounds, step, write_xu, do_clip,
                    params_ref, qd_ref, pd_ref, alpha_ref,
                    x_ref, u_ref, K_ref, k_ref, *refs):
    """Grid (G, T), t ascending; closed-loop state/cost/du2 in scratch.
    write_xu: also stream the new (x, u) out (accept pass; with zero gains
    and alpha = 0 it is the open-loop rollout). do_clip=False for that
    initial rollout: like the XLA get_traj, the warm-start ITERATE is not
    clipped (the env step clamps u internally for the physics)."""
    n = nx + nu
    f32 = jnp.float32
    i = pl.program_id(1)
    if write_xu:
        nx_ref, nu_ref, cc_ref, du_ref, xc_ref, cost_ref, du2_ref = refs
    else:
        cc_ref, du_ref, xc_ref, cost_ref, du2_ref = refs
    params = [params_ref[0, a] for a in range(n_params)]
    qd = [qd_ref[0, a] for a in range(n)]
    pd = [pd_ref[0, a] for a in range(n)]
    lb_c = _const_vec(bounds[0])
    ub_c = _const_vec(bounds[1])

    @pl.when(i == 0)
    def _():
        cost_ref[...] = jnp.zeros((8, 128), f32)
        du2_ref[...] = jnp.zeros((8, 128), f32)
        xc_ref[...] = _sq(x_ref)  # x_0 (= x_init of the iterate)

    x_prev = _sq(x_ref)
    u_prev = _sq(u_ref)
    xt = xc_ref[...]
    alpha = alpha_ref[0]

    new_u = _mv(_sq(K_ref), xt - x_prev) + u_prev + alpha[None] * _sq(k_ref)
    if do_clip:
        new_u = jnp.clip(new_u, lb_c, ub_c)
    d = u_prev - new_u
    du2_ref[...] = du2_ref[...] + (d * d).sum(0)
    cost_ref[...] = cost_ref[...] + _diag_obj(qd, pd, xt, new_u, nx, nu)
    xc_ref[...] = step(xt, new_u, params)
    if write_xu:
        _sq_set(nx_ref, xt)
        _sq_set(nu_ref, new_u)

    @pl.when(i == T - 1)
    def _():
        cc_ref[0] = cost_ref[...]
        du_ref[0] = jnp.sqrt(du2_ref[...])


def _launch_riccati(cfg, dyn, bounds, params2d, qd, pd, x_l, u_l, G,
                    interpret):
    T, nx, nu = cfg.T, cfg.n_state, cfg.n_ctrl
    f32 = jnp.float32
    kern = functools.partial(
        _riccati_kernel, T, nx, nu, params2d.shape[1], cfg.pnqp_iter,
        bounds, dyn.linearize_point,
    )
    with kernel_context():
        K_l, k_l = pl.pallas_call(
            kern,
            grid=(G, T),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # params
                pl.BlockSpec(memory_space=pltpu.SMEM),  # qd
                pl.BlockSpec(memory_space=pltpu.SMEM),  # pd
                _tspec((nx,), True, T),                 # x
                _tspec((nu,), True, T),                 # u
            ],
            out_specs=[
                _tspec((nu, nx), True, T),              # K
                _tspec((nu,), True, T),                 # k
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, nu, nx, G, 8, 128), f32),
                jax.ShapeDtypeStruct((T, nu, G, 8, 128), f32),
            ],
            scratch_shapes=[
                pltpu.VMEM((nx, nx, 8, 128), f32),      # V
                pltpu.VMEM((nx, 8, 128), f32),          # v
                pltpu.VMEM((nu, 8, 128), f32),          # k warm start
            ],
            interpret=interpret,
        )(params2d, qd, pd, x_l, u_l)
    return K_l, k_l


def _launch_forward(cfg, dyn, bounds, params2d, qd, pd, alpha_l,
                    x_l, u_l, K_l, k_l, G, write_xu, interpret,
                    do_clip=True):
    T, nx, nu = cfg.T, cfg.n_state, cfg.n_ctrl
    f32 = jnp.float32
    kern = functools.partial(
        _forward_kernel, T, nx, nu, params2d.shape[1], bounds, dyn.step,
        write_xu, do_clip,
    )
    out_specs = [_gspec(()), _gspec(())]
    out_shape = [
        jax.ShapeDtypeStruct((G, 8, 128), f32),  # cost
        jax.ShapeDtypeStruct((G, 8, 128), f32),  # du
    ]
    if write_xu:
        out_specs = [_tspec((nx,), False, T), _tspec((nu,), False, T)] \
            + out_specs
        out_shape = [
            jax.ShapeDtypeStruct((T, nx, G, 8, 128), f32),
            jax.ShapeDtypeStruct((T, nu, G, 8, 128), f32),
        ] + out_shape
    with kernel_context():
        outs = pl.pallas_call(
            kern,
            grid=(G, T),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # params
                pl.BlockSpec(memory_space=pltpu.SMEM),  # qd
                pl.BlockSpec(memory_space=pltpu.SMEM),  # pd
                _gspec(()),                             # alpha
                _tspec((nx,), False, T),                # x
                _tspec((nu,), False, T),                # u
                _tspec((nu, nx), False, T),             # K
                _tspec((nu,), False, T),                # k
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((nx, 8, 128), f32),          # closed-loop x
                pltpu.VMEM((8, 128), f32),              # cost acc
                pltpu.VMEM((8, 128), f32),              # du2 acc
            ],
            interpret=interpret,
        )(params2d, qd, pd, alpha_l, x_l, u_l, K_l, k_l)
    if write_xu:
        nx_l, nu_l, cc, du = outs
        return nx_l, nu_l, cc, du
    cc, du = outs
    return cc, du


def ilqr_stream(
    cfg: ILQRConfig,
    dyn: Dynamics,
    params,
    x_init: jax.Array,            # [B, nx]
    cost_small,                   # (diag C [n,n], c [n]) -- concrete
    u_init: Optional[jax.Array],  # [T, B, nu] or None
    u_lower=None,
    u_upper=None,
    interpret: bool = False,
):
    """iLQR outer loop over the streaming kernels. Returns time-major
    (x [T,B,nx], u [T,B,nu], costs [B], full_du_norm [B], n_iter [])."""
    import numpy as np

    T, B = cfg.T, x_init.shape[0]
    nx, nu = cfg.n_state, cfg.n_ctrl
    f32 = jnp.float32
    params = jnp.asarray(params, f32)
    params2d = params.reshape(1, -1)
    Cs, cs = cost_small
    qd = jnp.asarray(np.diagonal(np.asarray(Cs)), f32).reshape(1, -1)
    pd = jnp.asarray(cs, f32).reshape(1, -1)
    bounds = _static_bounds(u_lower, u_upper, nu)

    Bp = -(-B // BT) * BT
    G = Bp // BT
    # x_init rides in the t=0 slab of the x stream for the initial rollout
    u0 = jnp.zeros((T, B, nu), f32) if u_init is None else u_init.astype(f32)
    u_l = to_lanes(pad_batch(u0, B, Bp), T, Bp)
    x_init = x_init.astype(f32)  # the stream kernels are f32-only
    xi_l = to_lanes(
        pad_batch(jnp.broadcast_to(x_init[None], (T, B, nx)), B, Bp), T, Bp
    )
    Kz = jnp.zeros((T, nu, nx, G, 8, 128), f32)
    kz = jnp.zeros((T, nu, G, 8, 128), f32)
    a0 = jnp.zeros((G, 8, 128), f32)

    ric = functools.partial(_launch_riccati, cfg, dyn, bounds, params2d,
                            qd, pd, G=G, interpret=interpret)
    fwd = functools.partial(_launch_forward, cfg, dyn, bounds, params2d,
                            qd, pd, G=G, interpret=interpret)

    # initial open-loop rollout: zero gains, alpha = 0, no clipping of the
    # raw warm-start iterate (parity with util.get_traj)
    x_l, u_l, old_cost, _ = fwd(a0, xi_l, u_l, Kz, kz, write_xu=True,
                                do_clip=False)

    inf = jnp.full((G, 8, 128), jnp.inf, f32)

    def cond(carry):
        (x_l, u_l, oc, bx, bu, bc, bdu, nni, cur_du, i) = carry
        stop = (jnp.max(cur_du) < cfg.eps) | (nni > cfg.not_improved_lim)
        return (i < cfg.lqr_iter) & ~stop

    def body(carry):
        (x_l, u_l, old_cost, bx, bu, bc, bdu, nni, cur_du, i) = carry
        K_l, k_l = ric(x_l, u_l)

        ones = jnp.ones((G, 8, 128), f32)
        cc0, du0 = fwd(ones, x_l, u_l, K_l, k_l, write_xu=False)
        # pin the branch dtypes: under jax_enable_x64 weak python floats
        # would promote alpha to f64 (the kernels are f32)
        alpha0 = jnp.where(
            cc0 > old_cost, f32(cfg.linesearch_decay), f32(1.0)
        )

        def ls_cond(c):
            _, cc, _, j = c
            return jnp.any(cc > old_cost) & (j < cfg.max_linesearch_iter)

        def ls_body(c):
            alpha, cc, a_used, j = c
            ncc, _ = fwd(alpha, x_l, u_l, K_l, k_l, write_xu=False)
            a_used = alpha
            alpha = jnp.where(ncc > old_cost,
                              alpha * cfg.linesearch_decay, alpha)
            return alpha, ncc, a_used, j + 1

        _, cc, a_used, _ = lax.while_loop(
            ls_cond, ls_body, (alpha0, cc0, ones, jnp.int32(1))
        )
        nx_l, nu_l, cc_f, _ = fwd(a_used, x_l, u_l, K_l, k_l, write_xu=True)

        improved = cc_f <= bc + cfg.best_cost_eps
        bx = jnp.where(improved[None, None], nx_l, bx)
        bu = jnp.where(improved[None, None], nu_l, bu)
        bc = jnp.where(improved, cc_f, bc)
        bdu = jnp.where(improved, du0, bdu)
        nni = jnp.where((i > 0) & jnp.any(improved), 0, nni + 1)
        return (nx_l, nu_l, cc_f, bx, bu, bc, bdu, nni, du0, i + 1)

    carry0 = (
        x_l, u_l, old_cost,
        jnp.zeros_like(x_l), jnp.zeros_like(u_l), inf, inf,
        jnp.int32(0), inf, jnp.int32(0),
    )
    (_, _, _, bx, bu, bc, bdu, _, _, i) = lax.while_loop(cond, body, carry0)

    x = from_lanes(bx, T, B)
    u = from_lanes(bu, T, B)
    costs = bc.reshape(-1)[:B]
    du = bdu.reshape(-1)[:B]
    return x, u, costs, du, i
