"""Fused Pallas TPU kernel for the backward Riccati recursion (n_ctrl == 1).

Replaces ops/riccati.lqr_backward's lax.scan (reference lqr_step.py:52-160)
for the hot configuration: single control, box constraints handled by the
exact closed-form 1-D box-QP (see ops/riccati.py), f32.

Design (SURVEY.md section 7.2 "keep the whole per-example Riccati state
resident in VMEM across the scan"):

 * batch-on-lanes layout: each scalar entry of the per-example [n, n]
   matrices is an [8, 128] f32 tile spanning BT = 1024 examples -- one full
   VPU vector register. The small-dimension arithmetic (Q = C + F^T V F,
   block partition, gains, cost-to-go update) unrolls into ~400 elementwise
   VPU ops per timestep, each processing 1024 examples.
 * the full T-step reverse recursion runs inside ONE kernel invocation per
   batch tile; the cost-to-go (V [nx,nx], v [nx]) lives in VMEM scratch, so
   there is zero HBM traffic between timesteps (the lax.scan version writes
   V/v to HBM every step).
 * grid = (B / 1024,), sequential on the core; Pallas pipelines the input
   DMA of tile g+1 against compute of tile g.

The kernel computes EXACTLY the same math as ops/riccati.py's
qp_solver="auto" path (closed-form QP: k = clamp(-q_u/Q_uu, lb, ub),
H_free = Q_uu * If + 1e-11, K = -(Q_ux * If)/H_free, reference
lqr_step.py:61-158 semantics); tests assert bit-level agreement with the
jnp path in interpret mode and on-device.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layout import (BT, LaneView, bspec, from_lanes, pad_batch,
                     pad_cost_identity, to_lanes)


def pallas_supported(n_ctrl: int, dtype, u_zero_I, qp_solver: str,
                     boxed: bool) -> bool:
    """The fused kernel covers nu==1, f32, closed-form QP ("auto"), in
    three gain modes: free, box-constrained, and u_zero_I-masked (the
    KKT/IFT backward's frozen active set, reference lqr_step.py:99-127 --
    the reference applies it only to the unconstrained solve, as here)."""
    return (
        n_ctrl == 1
        and dtype == jnp.float32
        and (u_zero_I is None or not boxed)
        and qp_solver == "auto"
    )


def _riccati_kernel(T, nx, mode, C_ref, c_ref, F_ref, lb_ref, ub_ref,
                    K_ref, k_ref, V_ref, v_ref):
    """One batch tile: full reverse-time recursion with V, v in VMEM.

    Ref shapes (leading grid-blocked batch dim of size 1 squeezed by
    BlockSpec): C [T,n,n,8,128], c [T,n,8,128], F [T,nx,n,8,128] (last slab
    zero), lb/ub [T,8,128], K [T,nx,8,128], k [T,8,128]; scratch
    V [nx,nx,8,128], v [nx,8,128].
    """
    n = nx + 1

    # V_T = 0, v_T = 0
    V_ref[...] = jnp.zeros(V_ref.shape, V_ref.dtype)
    v_ref[...] = jnp.zeros(v_ref.shape, v_ref.dtype)

    def body(i, _):
        t = T - 1 - i

        # ---- load (python-unrolled over the tiny dims) ----
        V = [[V_ref[a, b] for b in range(nx)] for a in range(nx)]
        v = [v_ref[a] for a in range(nx)]
        F = [[F_ref[t, a, j] for j in range(n)] for a in range(nx)]
        c = [c_ref[t, i_] for i_ in range(n)]

        # ---- Q = C + F^T V F ; q = c + F^T v (V_T=0 slab makes t=T-1 a
        # pure copy, reference lqr_step.py:61-74) ----
        # tmp[a][j] = sum_b V[a][b] * F[b][j]
        tmp = [
            [
                functools.reduce(
                    lambda acc, b: acc + V[a][b] * F[b][j], range(1, nx),
                    V[a][0] * F[0][j],
                )
                for j in range(n)
            ]
            for a in range(nx)
        ]
        # Q[i][j] = C[i][j] + sum_a F[a][i] * tmp[a][j]  (symmetric: j >= i)
        Q = [[None] * n for _ in range(n)]
        for i_ in range(n):
            for j in range(i_, n):
                acc = C_ref[t, i_, j]
                for a in range(nx):
                    acc = acc + F[a][i_] * tmp[a][j]
                Q[i_][j] = acc
                Q[j][i_] = acc
        q = []
        for i_ in range(n):
            acc = c[i_]
            for a in range(nx):
                acc = acc + F[a][i_] * v[a]
            q.append(acc)

        # ---- partition; gains via exact closed-form 1-D box-QP ----
        Quu = Q[nx][nx]
        Qux = [Q[nx][j] for j in range(nx)]
        qu = q[nx]

        kt_free = -qu / Quu
        if mode == "box":
            lb = lb_ref[t]
            ub = ub_ref[t]
            kt = jnp.clip(kt_free, lb, ub)
            g = Quu * kt + qu
            # active set: at a bound AND gradient pushing outward
            # (reference pnqp.py:32-33)
            Ic = ((kt <= lb) & (g > 0.0)) | ((kt >= ub) & (g < 0.0))
            # f32-pinned: two python-float branches would make a weak f64
            # array under jax_enable_x64 (Mosaic rejects f64->f32 casts)
            If = jnp.where(Ic, jnp.float32(0.0), jnp.float32(1.0))
            H_free = Quu * If + 1e-11
            K = [-(Qux[j] * If) / H_free for j in range(nx)]
        elif mode == "zero":
            # equality constraints u = 0 on the mask (lb_ref carries the
            # float mask; reference lqr_step.py:99-127 incl. the quirk that
            # k uses the UNmasked Quu, lqr_step.py:121-123)
            uz = lb_ref[t]
            notI = 1.0 - uz
            Quu_m = Quu * notI + 1e-8 * uz
            kt = -(qu * notI) / Quu
            K = [-(Qux[j] * notI) / Quu_m for j in range(nx)]
        else:
            kt = kt_free
            K = [-Qux[j] / Quu for j in range(nx)]

        # ---- cost-to-go update (reference lqr_step.py:155-158):
        # V' = Qxx + Qxu K^T + K Qux + Quu K K^T (nu=1, symmetric)
        # v' = qx + Qxu k + K qu + Quu K k ----
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

    lax.fori_loop(0, T, body, 0)


def lqr_backward_pallas(
    n_state: int,
    C: jax.Array,
    c: jax.Array,
    F: Optional[jax.Array],
    u: jax.Array,
    u_lower=None,
    u_upper=None,
    u_zero_I=None,
    delta_u=None,
    interpret: bool = False,
):
    """Drop-in fused version of ops/riccati.lqr_backward for nu == 1 with
    the closed-form QP. Returns (K [T,B,1,nx], k [T,B,1]).

    C: [T,B,n,n], c: [T,B,n], F: [T-1,B,nx,n] or None, u: [T,B,1];
    u_zero_I: optional [T,B,1] mask (unconstrained solves only).
    """
    T, B = C.shape[0], C.shape[1]
    nx, n = n_state, n_state + 1
    dtype = C.dtype
    boxed = u_lower is not None
    mode = "box" if boxed else ("zero" if u_zero_I is not None else "free")

    Bp = -(-B // BT) * BT
    G = Bp // BT

    # pad the time axis of F with a zero slab (V_T = 0 makes it inert)
    if F is None:
        F_full = jnp.zeros((T, B, nx, n), dtype)
    else:
        F_full = jnp.concatenate([F, jnp.zeros((1, B, nx, n), dtype)], 0)

    # pad batch; padded examples get C = I so Quu = 1 (no div-by-zero; their
    # outputs are sliced away)
    C_p = pad_cost_identity(pad_batch(C, B, Bp), T, B, Bp, n)
    c_p = pad_batch(c, B, Bp)
    F_p = pad_batch(F_full, B, Bp)

    def expand_bound(val):
        if jnp.ndim(val) == 0:
            return jnp.broadcast_to(jnp.asarray(val, dtype), (T, Bp, 1))
        return pad_batch(jnp.broadcast_to(val, (T, B, 1)), B, Bp)

    if boxed:
        u_p = pad_batch(u, B, Bp)
        lb = expand_bound(u_lower) - u_p
        ub = expand_bound(u_upper) - u_p
        if delta_u is not None:
            lb = jnp.maximum(lb, -delta_u)
            ub = jnp.minimum(ub, delta_u)
        lb_l = to_lanes(lb[..., 0], T, Bp)
        ub_l = to_lanes(ub[..., 0], T, Bp)
    elif mode == "zero":
        uz = pad_batch(u_zero_I.astype(dtype), B, Bp)
        lb_l = to_lanes(uz[..., 0], T, Bp)
        ub_l = jnp.zeros((T, G, 8, 128), dtype)
    else:
        lb_l = ub_l = jnp.zeros((T, G, 8, 128), dtype)

    C_l = to_lanes(C_p, T, Bp)  # [T,n,n,G,8,128]
    c_l = to_lanes(c_p, T, Bp)  # [T,n,G,8,128]
    F_l = to_lanes(F_p, T, Bp)  # [T,nx,n,G,8,128]

    kernel = functools.partial(_riccati_kernel, T, nx, mode)

    K_l, k_l = pl.pallas_call(
        # squeeze the size-1 grid-blocked dim via index tricks: refs keep a
        # leading block of 1 on the batch-group axis, so index [..., 0, :, :]
        _squeeze_wrap(kernel, nx),
        grid=(G,),
        in_specs=[bspec(T, (n, n)), bspec(T, (n,)), bspec(T, (nx, n)),
                  bspec(T, ()), bspec(T, ())],
        out_specs=[bspec(T, (nx,)), bspec(T, ())],
        out_shape=[
            jax.ShapeDtypeStruct((T, nx, G, 8, 128), dtype),
            jax.ShapeDtypeStruct((T, G, 8, 128), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nx, nx, 8, 128), dtype),
            pltpu.VMEM((nx, 8, 128), dtype),
        ],
        interpret=interpret,
    )(C_l, c_l, F_l, lb_l, ub_l)

    K = from_lanes(K_l, T, B)  # [T,B,nx]
    k = from_lanes(k_l, T, B)  # [T,B]
    return K[:, :, None, :], k[..., None]


def _squeeze_wrap(kernel, nx):
    """Wrap the lane refs in layout.LaneView (scratch refs pass raw)."""

    def wrapped(C_ref, c_ref, F_ref, lb_ref, ub_ref, K_ref, k_ref, V_ref,
                v_ref):
        kernel(
            LaneView(C_ref), LaneView(c_ref), LaneView(F_ref),
            LaneView(lb_ref), LaneView(ub_ref),
            LaneView(K_ref), LaneView(k_ref),
            V_ref, v_ref,
        )

    return wrapped
