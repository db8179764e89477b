"""DiLQR fixed-point implicit differentiation, matrix-free.

The reference (lqr_step_explicit.py:458-716) differentiates through the iLQR
fixed point by materializing the dense system

    A = I - d tau*/d tau,   A (d tau/d theta) = d tau*/d theta

per example -- an O((T d)^2) matrix built from B*T*(dx+du) one-hot "probing"
solves (lqr_step_explicit.py:664-702) and solved densely
(lqr_step_explicit.py:570-587). That is the reference's main scalability
sin (SURVEY.md section 3.2).

Here the same system is solved matrix-free in the *adjoint* direction. With
tau* = S(C, c, F, f, x_init) the LQR-subproblem solution map and
(F, f) = L(tau*, theta) the linearization, the loss gradient is

    v^T d tau*/d p = w^T S_p,   where  w = v + L_tau^T S_{F,f}^T w .

One application of S^T is exactly the module-KKT VJP (diff/kkt.py, linear in
w); one application of L_tau^T is a jax.vjp of the linearization. GMRES on
w therefore costs a few O(T) scans instead of a dense (T d)^3 factorization,
while computing the same implicit gradients (validated against unrolled
autodiff in tests, BASELINE config #4).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..ops.gmres import gmres_batched


def solve_adjoint_fixed_point(
    sT_Ff: Callable,
    lT_xu: Callable,
    v: Tuple[jax.Array, jax.Array],
    tol: float = 1e-6,
    restart: int = 20,
    maxiter: int = 3,
):
    """Solve (I - L_tau^T S_{F,f}^T) w = v for the adjoint w.

    sT_Ff((wx, wu)) -> (dF, df): transposed LQR-subproblem sensitivity.
    lT_xu((dF, df)) -> (dX, dU): VJP of the linearization w.r.t. the
    trajectory. v: loss cotangents (g_x, g_u), each [T, B, ...].

    The operator is block-diagonal across the batch (examples are
    independent), so the Krylov solve runs PER EXAMPLE (gmres_batched):
    each example converges against its own cotangent's norm, and the
    returned residuals are per-example. Returns ``(w, res_b, b_norm_b)``
    with res_b/b_norm_b of shape [B]; the caller inspects
    ``res_b > tol * b_norm_b`` to warn / fall back to the dense probing
    solve for batches whose fixed-point map is not contracting enough
    (e.g. a barely-converged forward solve; the reference's analogue of
    its unused 1e-5 ridge, lqr_step_explicit.py:559-570 -- and its dense
    per-example solves at :544-587 are per-example exact, the parity bar
    this per-example accounting restores).
    """

    def A(w):
        dF, df = sT_Ff(w)
        dX, dU = lT_xu(dF, df)
        return (w[0] - dX, w[1] - dU)

    return gmres_batched(
        A, v, x0=v, tol=tol, restart=restart, maxiter=maxiter,
        batch_axis=1,
    )


def solve_adjoint_dense(
    sT_Ff: Callable,
    lT_xu: Callable,
    v: Tuple[jax.Array, jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """Dense fallback: materialize the per-example adjoint fixed-point
    matrix by probing with D = T*(n_state+n_ctrl) basis vectors and solve
    directly -- the mechanism of the reference's one-hot probing batch
    (lqr_step_explicit.py:664-702) and dense solve
    (lqr_step_explicit.py:544-587), applied to the adjoint system (so the
    batch is probed D times instead of B*T*d one-hot rows, and no
    (T d)^3-per-example lstsq of Jacobian blocks is needed).

    O(D) LQR solves per backward vs GMRES's handful; use via
    cfg.ift_solver="dense" when the fixed-point iteration is
    ill-conditioned (e.g. a barely-converged forward solve).
    """
    gx, gu = v
    T, B, nx = gx.shape
    nu = gu.shape[-1]
    D = T * (nx + nu)

    def apply_flat(wf):
        """A @ w for one per-example-constant direction wf [D] broadcast
        over the batch; returns [B, D]."""
        w = wf.reshape(T, 1, nx + nu)
        wx = jnp.broadcast_to(w[:, :, :nx], (T, B, nx))
        wu = jnp.broadcast_to(w[:, :, nx:], (T, B, nu))
        dF, df = sT_Ff((wx, wu))
        dX, dU = lT_xu(dF, df)
        out = jnp.concatenate([wx - dX, wu - dU], axis=-1)  # [T,B,n]
        return out.transpose(1, 0, 2).reshape(B, D)

    # columns of the per-example matrices: A_mat [B, D, D]
    cols = jax.lax.map(apply_flat, jnp.eye(D, dtype=gx.dtype))  # [D, B, D]
    A_mat = cols.transpose(1, 2, 0)  # [B, row, col]

    rhs = jnp.concatenate([gx, gu], axis=-1).transpose(1, 0, 2).reshape(B, D)
    w = jnp.linalg.solve(A_mat, rhs[..., None])[..., 0]  # [B, D]
    w = w.reshape(B, T, nx + nu).transpose(1, 0, 2)
    return (w[..., :nx], w[..., nx:])
