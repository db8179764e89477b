"""Parallel (associative-scan) Riccati recursion for the unconstrained LQR
subproblem -- O(log T) depth instead of the sequential scan's O(T)
(SURVEY.md section 5: "optional associative-scan Riccati is the only
principled way to parallelize T"; cf. the parallel Riccati / parallel LQT
literature, e.g. arXiv:1809.06360 referenced in PAPERS.md).

Derivation (self-contained). Eliminate the control and its cross/linear
cost terms per step (u = u- - Cuu^{-1}(Cxu^T x + c_u)), leaving

    dynamics  x' = A x + B u- + d
    cost      1/2 x^T Q x + q^T x + 1/2 u-^T R u-

with A = F_x - F_u R^{-1} C_xu^T, d = f - F_u R^{-1} c_u,
Q = C_xx - C_xu R^{-1} C_xu^T, q = c_x - C_xu R^{-1} c_u, R = C_uu.
Partial minimization over u- maps the value function V'(y) = 1/2 y^T P y
+ p^T y through

    P_new = Q + A^T P (I + S P)^{-1} A,          S = B R^{-1} B^T
    p_new = q + A^T (I + P S)^{-1} (P d + p)

i.e. every timestep is an element e = (A, S, Q, d, l=q) of a family of
maps CLOSED under composition. Writing the quadratic part in projective
coordinates (P = W U^{-1}) shows the family is a matrix group; refactoring
the product into the same parameterization gives the stable combine
(e1 earlier in time, e2 the accumulated future; E = (I + S1 Q2)^{-1}):

    A12 = A2 E A1
    S12 = S2 + A2 E S1 A2^T
    Q12 = Q1 + A1^T Q2 E A1
    d12 = A2 E (d1 - S1 l2) + d2
    l12 = l1 + A1^T E^T (Q2 d1 + l2)

(the affine rules follow by matching the composed map at P = 0 and to
first order in P; exactness then follows from the group structure).
Unlike the raw projective product, every combine renormalizes through a
well-conditioned (I + S1 Q2) solve, so magnitudes stay bounded -- and no
A inverse is ever required (the t = T-1 "no dynamics" element is simply
A = 0). The cost-to-go at t is the combined suffix element applied to
(P, p) = (0, 0): V_t = Q_[t..T-1], v_t = l_[t..T-1].

Gains then come per-timestep (parallel) from (V_{t+1}, v_{t+1}) exactly as
in the sequential recursion (ops/riccati.py, reference lqr_step.py:61-94),
and the closed-loop rollout is an affine-map prefix scan.

Validated against the sequential scan to ~1e-12 (f64) up to T = 512 on
random well-conditioned problems. The sequential path remains the default
(it fuses into the Pallas megakernel for batched workloads); this is a
large-T / small-B option for unconstrained solves (e.g. the module-KKT
backward's auxiliary LQR, LinDx problems).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.batch import bmm, bmv, btr, inv_small, solve_psd


class PLQRResult(NamedTuple):
    K: jax.Array  # [T, B, nu, nx]
    k: jax.Array  # [T, B, nu]
    x: jax.Array  # [T, B, nx]
    u: jax.Array  # [T, B, nu]


def _pad_dynamics(T, B, nx, nu, F, f, dtype):
    """Zero-slab padding of (F, f) at t = T-1 (the terminal step has no
    dynamics; zero A/S/d make the element inert)."""
    Fz = jnp.zeros((1, B, nx, nx + nu), dtype)
    F_pad = Fz if F is None else jnp.concatenate([F, Fz], 0)
    fz = jnp.zeros((T, B, nx), dtype)
    f_pad = fz if f is None else jnp.concatenate(
        [f, jnp.zeros((1, B, nx), dtype)], 0
    )
    return F_pad, f_pad


def _masked_H(Cuu, free):
    """Free-subspace Hessian: zero frozen rows/columns, unit frozen
    diagonal. Masked right-hand sides have zero frozen rows, so the
    solve returns exactly the free-block solution with zeros on frozen
    coords -- the same values as the sequential path's 1e-8-regularized
    masked Hessian (ops/riccati._zero_constrained_gains)."""
    nu = Cuu.shape[-1]
    eyeu = jnp.eye(nu, dtype=Cuu.dtype)
    fo = free[..., :, None] * free[..., None, :]
    return Cuu * fo + eyeu * (1.0 - free)[..., None, :]


def _eliminated_steps(n_state, n_ctrl, C, c, F, f, u_zero_I=None):
    """Per-step eliminated elements (A, S, Q, d, l) [T,B,...]; the t = T-1
    element has A = 0, S = 0, d = 0 (no dynamics: V_{T-1} = cost alone).

    u_zero_I [T,B,nu] (1/True = frozen): zero-control equality
    constraints (reference lqr_step.py:99-127) -- the per-step control
    elimination simply runs on the free subspace (masked Hessian + masked
    right-hand sides); the combine itself acts on the state space only
    and is unchanged."""
    T, B = C.shape[0], C.shape[1]
    nx, nu = n_state, n_ctrl
    dtype = C.dtype

    Cxx = C[..., :nx, :nx]
    Cxu = C[..., :nx, nx:]
    Cuu = C[..., nx:, nx:]
    cx = c[..., :nx]
    cu = c[..., nx:]

    if u_zero_I is None:
        H = Cuu
        CxuT = btr(Cxu)
        cu_m = cu
    else:
        free = 1.0 - u_zero_I.astype(dtype)
        H = _masked_H(Cuu, free)
        CxuT = free[..., :, None] * btr(Cxu)
        cu_m = free * cu

    RiCxuT = solve_psd(H, CxuT)                  # R^{-1} Cxu^T [T,B,nu,nx]
    Ricu = solve_psd(H, cu_m)                    # R^{-1} c_u   [T,B,nu]
    Q = Cxx - bmm(Cxu, RiCxuT)
    l = cx - bmv(Cxu, Ricu)

    F_pad, f_pad = _pad_dynamics(T, B, nx, nu, F, f, dtype)
    Fx = F_pad[..., :nx]
    Fu = F_pad[..., nx:]

    A = Fx - bmm(Fu, RiCxuT)
    d = f_pad - bmv(Fu, Ricu)
    FuT = btr(Fu) if u_zero_I is None else free[..., :, None] * btr(Fu)
    S = bmm(Fu, solve_psd(H, FuT))
    # t = T-1: no dynamics (the F slab is already zero, making A, S, d zero
    # there automatically)
    return A, S, Q, d, l


def _combine(e1, e2):
    """e1 earlier in time, e2 = accumulated future segment.

    The combine requires (I + S1 Q2) invertible -- mildly stronger than the
    sequential recursion's Quu > 0 (an indefinite segment cost from a
    quadraticized nonconvex module cost can defeat it); see the
    riccati_parallel knob docs. n <= 3 uses the closed-form inverse (one
    adjugate reused for all four applications; also the only path that
    works for f64 on TPU, where batched LuDecomposition is f32-only)."""
    A1, S1, Q1, d1, l1 = e1
    A2, S2, Q2, d2, l2 = e2
    n = A1.shape[-1]
    eye = jnp.eye(n, dtype=A1.dtype)
    # E = (I + S1 Q2)^{-1}
    M = eye + bmm(S1, Q2)
    z = bmv(Q2, d1) + l2
    if n <= 3:
        Minv = inv_small(M)
        E_A1 = bmm(Minv, A1)
        E_S1 = bmm(Minv, S1)
        E_dSl = bmv(Minv, d1 - bmv(S1, l2))
        ETz = bmv(btr(Minv), z)
    else:
        rhs = jnp.concatenate(
            [A1, S1, (d1 - bmv(S1, l2))[..., None]], axis=-1
        )
        sol = jnp.linalg.solve(M, rhs)  # one factorization, 2n+1 rhs
        E_A1 = sol[..., :n]
        E_S1 = sol[..., n:2 * n]
        E_dSl = sol[..., -1]
        ETz = jnp.linalg.solve(btr(M), z[..., None])[..., 0]
    A12 = bmm(A2, E_A1)
    S12 = S2 + bmm(A2, bmm(E_S1, btr(A2)))
    Q12 = Q1 + bmm(btr(A1), bmm(Q2, E_A1))
    d12 = bmv(A2, E_dSl) + d2
    l12 = l1 + bmv(btr(A1), ETz)
    return (A12, S12, Q12, d12, l12)


def plqr_backward(
    n_state: int,
    n_ctrl: int,
    C: jax.Array,           # [T, B, n, n]
    c: jax.Array,           # [T, B, n]
    F: Optional[jax.Array],  # [T-1, B, nx, n]
    f: Optional[jax.Array],  # [T-1, B, nx]
    u_zero_I: Optional[jax.Array] = None,  # [T, B, nu] frozen mask
) -> Tuple[jax.Array, jax.Array]:
    """LQR gains via associative scan -- unconstrained, or with the
    u_zero_I zero-control equality constraints (free-subspace
    elimination; frozen coords get zero gain rows, matching
    ops/riccati._zero_constrained_gains). Returns (K [T,B,nu,nx],
    k [T,B,nu]) matching ops/riccati.lqr_backward."""
    T, B = C.shape[0], C.shape[1]
    nx, nu = n_state, n_ctrl
    dtype = C.dtype

    elems = _eliminated_steps(n_state, n_ctrl, C, c, F, f, u_zero_I)
    # reverse=True hands the combine (later, earlier) operands; _combine
    # takes (earlier, accumulated-future)
    combined = lax.associative_scan(
        lambda a, b: _combine(b, a), elems, reverse=True, axis=0
    )
    # V_t, v_t = combined element applied to (0, 0)
    V = combined[2]
    v = combined[4]
    Vz = jnp.zeros((1, B, nx, nx), dtype)
    vz = jnp.zeros((1, B, nx), dtype)
    V_next = jnp.concatenate([V[1:], Vz], 0)
    v_next = jnp.concatenate([v[1:], vz], 0)

    # per-timestep gains from (V_{t+1}, v_{t+1}) and the ORIGINAL step data
    # (reference lqr_step.py:61-94)
    F_pad, f_pad = _pad_dynamics(T, B, nx, nu, F, f, dtype)
    FT = btr(F_pad)
    Qt = C + bmm(FT, bmm(V_next, F_pad))
    qt = c + bmv(FT, bmv(V_next, f_pad) + v_next)
    Quu = Qt[..., nx:, nx:]
    Qux = Qt[..., nx:, :nx]
    qu = qt[..., nx:]
    if u_zero_I is not None:
        free = 1.0 - u_zero_I.astype(dtype)
        Quu = _masked_H(Quu, free)
        Qux = free[..., :, None] * Qux
        qu = free * qu
    sol = solve_psd(Quu, jnp.concatenate([Qux, qu[..., None]], -1))
    return -sol[..., :-1], -sol[..., -1]


def plqr_rollout(
    n_state: int,
    x_init: jax.Array,      # [B, nx]
    K: jax.Array,           # [T, B, nu, nx]
    k: jax.Array,           # [T, B, nu]
    F: Optional[jax.Array],
    f: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """Closed-loop trajectory via an affine-map prefix product (parallel).
    Returns (x [T,B,nx], u [T,B,nu])."""
    T, B = K.shape[0], K.shape[1]
    nx = n_state
    nu = K.shape[2]
    dtype = x_init.dtype

    F_pad, f_pad = _pad_dynamics(T, B, nx, nu, F, f, dtype)
    Fx = F_pad[..., :nx]
    Fu = F_pad[..., nx:]

    # x_{t+1} = G_t x_t + g_t with G = Fx + Fu K, g = Fu k + f
    G = Fx + bmm(Fu, K)
    g = bmv(Fu, k) + f_pad

    def comb(a, b):
        # (later b) o (earlier a): x -> Gb (Ga x + ga) + gb
        Ga, ga = a
        Gb, gb = b
        return bmm(Gb, Ga), bmv(Gb, ga) + gb

    Gp, gp = lax.associative_scan(comb, (G, g), axis=0)
    xh = jnp.einsum("tbij,bj->tbi", Gp, x_init) + gp
    x = jnp.concatenate([x_init[None], xh[:-1]], 0)
    u = jnp.einsum("tbux,tbx->tbu", K, x) + k
    return x, u


def plqr_solve(
    n_state: int,
    n_ctrl: int,
    C: jax.Array,
    c: jax.Array,
    F: Optional[jax.Array],
    f: Optional[jax.Array],
    x_init: jax.Array,
    u_zero_I: Optional[jax.Array] = None,
) -> PLQRResult:
    """Full LQR solve (backward gains + closed-loop rollout), both as
    associative scans: O(log T) depth end to end. With u_zero_I, frozen
    coords have zero gain rows so the rollout keeps them at zero."""
    K, k = plqr_backward(n_state, n_ctrl, C, c, F, f, u_zero_I)
    x, u = plqr_rollout(n_state, x_init, K, k, F, f)
    return PLQRResult(K, k, x, u)
