"""Projected-Newton box-QP: ``min_x 0.5 x^T H x + q^T x  s.t. l <= x <= u``.

TPU-native re-implementation of the reference's pnqp (pnqp.py:5-82) with the
same algorithm and constants -- warm-startable Newton on the free subspace
with a clamped active set and a batched Armijo line search -- but expressed
as masked fixed-shape ``lax.while_loop`` iteration so the whole batch stays
on-device with no data-dependent shapes:

 * active set Ic = (x==l & g>0) | (x==u & g<0)      (reference pnqp.py:32-33)
 * H_free = H * (If x If) + 1e-11 I                 (reference pnqp.py:44-49)
 * per-example convergence mask ||dx|| < 1e-4       (reference pnqp.py:56-59)
 * Armijo: GAMMA=0.1, decay 0.1, <=10 trials        (reference pnqp.py:61-77)
   The loop exits as soon as max(armijo) > GAMMA, i.e. when ANY active
   example passes (and immediately when any example is inactive, since
   inactive examples carry GAMMA+1e-6) -- a reference quirk we reproduce for
   trajectory parity.

The returned masked Hessian H_free is reused by the Riccati caller to build
the feedback gains K_t (reference lqr_step.py:135-148), exactly as the
reference reuses the LU of the free Hessian.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.batch import bdot, bger, bmv, bquad, clamp, solve_psd
from ..utils.loops import bounded_while

GAMMA = 0.1
REG = 1e-11
CONV_TOL = 1e-4
ARMIJO_DECAY = 0.1
MAX_ARMIJO_ITER = 10


class PnqpResult(NamedTuple):
    x: jax.Array  # [B, n] solution
    H_free: jax.Array  # [B, n, n] masked+regularized free Hessian
    If: jax.Array  # [B, n] float free-set mask (1 = free)
    n_iter: jax.Array  # [] int32 last Newton iteration index (reference `i`)
    converged: jax.Array  # [] bool all examples converged


def pnqp(
    H: jax.Array,
    q: jax.Array,
    lower: jax.Array,
    upper: jax.Array,
    x_init: Optional[jax.Array] = None,
    n_iter: int = 20,
    unroll: bool = False,
) -> PnqpResult:
    """Batched box-QP solve. H: [B,n,n], q: [B,n], lower/upper: [B,n] or
    scalar. Matches reference pnqp.py:5-82 semantics."""
    n = H.shape[-1]
    eye = jnp.eye(n, dtype=H.dtype)

    def obj(x):
        return 0.5 * bquad(x, H) + bdot(q, x)

    if x_init is None:
        if n == 1:
            x0 = -q / H[..., 0]
        else:
            x0 = -solve_psd(H, q)
    else:
        x0 = x_init
    x0 = clamp(x0, lower, upper)

    def newton(x):
        g = bmv(H, x) + q
        Ic = ((x == lower) & (g > 0)) | ((x == upper) & (g < 0))
        If = 1.0 - Ic.astype(H.dtype)
        g_free = jnp.where(Ic, 0.0, g)
        H_free = H * bger(If, If) + REG * eye
        if n == 1:
            dx = -g_free / H_free[..., 0]
        else:
            dx = -solve_psd(H_free, g_free)
        return g, If, H_free, dx

    def armijo_search(x, g, dx, J):
        """Batched backtracking on per-example alpha (reference pnqp.py:61-77).

        J: [B] bool, examples still taking a Newton step. Non-J examples get
        the sentinel GAMMA+1e-6 so the outer max() sees them as passing."""
        sentinel = jnp.full(x.shape[0], GAMMA + 1e-6, dtype=x.dtype)

        def trial(alpha):
            maybe_x = clamp(x + alpha[:, None] * dx, lower, upper)
            num = obj(x) - obj(maybe_x)
            den = bdot(g, x - maybe_x)
            armijos = jnp.where(J, num / den, sentinel)
            return maybe_x, armijos

        def cond(carry):
            _, _, max_armijo, count = carry
            return (max_armijo <= GAMMA) & (count < MAX_ARMIJO_ITER)

        def body(carry):
            alpha, _, _, count = carry
            maybe_x, armijos = trial(alpha)
            alpha = jnp.where(armijos <= GAMMA, alpha * ARMIJO_DECAY, alpha)
            return alpha, maybe_x, jnp.max(armijos), count + 1

        alpha0 = jnp.ones(x.shape[0], dtype=x.dtype)
        carry = (alpha0, x, jnp.asarray(GAMMA, x.dtype), jnp.int32(0))
        _, maybe_x, _, _ = bounded_while(
            cond, body, carry, max_steps=MAX_ARMIJO_ITER, unroll=unroll
        )
        return maybe_x

    # Newton outer loop with early exit once every example's step is small.
    g0, If0, Hf0, _ = newton(x0)

    def cond(carry):
        _, _, _, i, done = carry
        return (~done) & (i < n_iter)

    def body(carry):
        x, _, _, i, _ = carry
        g, If, H_free, dx = newton(x)
        J = jnp.linalg.norm(dx, axis=-1) >= CONV_TOL
        done = ~jnp.any(J)
        # Reference returns x un-updated on the convergence iteration
        # (pnqp.py:56-59 returns before the line search).
        new_x = armijo_search(x, g, dx, J)
        x = jnp.where(done, x, new_x)
        return x, H_free, If, i + 1, done

    x, H_free, If, i, done = bounded_while(
        cond,
        body,
        (x0, Hf0, If0, jnp.int32(0), jnp.asarray(False)),
        max_steps=n_iter,
        unroll=unroll,
    )
    # Reference's returned `i` is the loop index of the exit iteration.
    return PnqpResult(x, H_free, If, jnp.maximum(i - 1, 0), done)
