"""Backward Riccati recursion producing time-varying affine feedback gains.

TPU-native re-implementation of the reference lqr_backward
(lqr_step.py:52-160): a reverse-time ``lax.scan`` carrying the cost-to-go
``(V_{t+1}, v_{t+1})`` and the previous feedforward ``k_{t+1}`` (which
warm-starts the box-QP at the next step, reference lqr_step.py:135-137).

Per step (reference lqr_step.py:61-74):
    Q_t = C_t + F_t^T V_{t+1} F_t
    q_t = c_t + F_t^T V_{t+1} f_t + F_t^T v_{t+1}
then block-partition Q into xx/xu/ux/uu, compute gains:
  * unconstrained, n_ctrl == 1: scalar reciprocal (lqr_step.py:84-86)
  * unconstrained, general:     batched solve     (lqr_step.py:89-94)
  * u_zero_I zero-control constraints: masked solve with 1e-8 diag
    regularization on the active block (lqr_step.py:99-127)
  * box bounds: pnqp in delta-space bounds [l-u_t, u-u_t], warm-started with
    k_{t+1}; active rows of Q_ux zeroed before computing K_t
    (lqr_step.py:128-148)
and the cost-to-go update (lqr_step.py:155-158).

The time axis is strictly sequential (SURVEY.md section 2.4: "PP absent; the
Riccati recursion is a strict sequential dependence over T"), so it stays
chip-local; all parallelism is over the batch.

Shapes (time-major internally): C [T,B,n,n], c [T,B,n], F [T-1,B,nx,n],
f [T-1,B,nx] or None. Returns K [T,B,nu,nx], k [T,B,nu] ordered t=0..T-1.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.batch import bger, bmm, bmv, btr, clamp, solve_psd
from ..utils.platform import target_platform
from .pnqp import pnqp


class RiccatiResult(NamedTuple):
    K: jax.Array  # [T, B, nu, nx]
    k: jax.Array  # [T, B, nu]
    n_total_qp_iter: jax.Array  # [] int32 (diagnostic, lqr_step.py:140)


def _unconstrained_gains(n_ctrl, Quu, Qux, qu):
    if n_ctrl == 1:
        Kt = -Qux / Quu
        kt = -qu / Quu[..., 0]
    else:
        sol = solve_psd(Quu, jnp.concatenate([Qux, qu[..., None]], -1))
        Kt = -sol[..., :-1]
        kt = -sol[..., -1]
    return Kt, kt


def _zero_constrained_gains(n_ctrl, Quu, Qux, qu, I_t):
    """Gains with equality constraints u_i = 0 on the active mask I_t
    (reference lqr_step.py:99-127). I_t: [B, nu] float (1 = frozen)."""
    notI = 1.0 - I_t
    qu_ = qu * notI
    Quu_ = Quu * bger(notI, notI) + 1e-8 * jnp.einsum(
        "bi,ij->bij", I_t, jnp.eye(n_ctrl, dtype=Quu.dtype)
    )
    Qux_ = Qux * notI[..., None]
    if n_ctrl == 1:
        # Reference quirk (lqr_step.py:121-123): k uses the UNmasked Quu.
        Kt = -Qux_ / Quu_
        kt = -qu_ / Quu[..., 0]
    else:
        sol = solve_psd(Quu_, jnp.concatenate([Qux_, qu_[..., None]], -1))
        Kt = -sol[..., :-1]
        kt = -sol[..., -1]
    return Kt, kt


def lqr_backward(
    n_state: int,
    n_ctrl: int,
    C: jax.Array,
    c: jax.Array,
    F: Optional[jax.Array],
    f: Optional[jax.Array],
    u: jax.Array,
    u_lower=None,
    u_upper=None,
    u_zero_I: Optional[jax.Array] = None,
    delta_u=None,
    pnqp_iter: int = 20,
    unroll: bool = False,
    qp_solver: str = "auto",
    backend: str = "auto",
    parallel: bool = False,
) -> RiccatiResult:
    """Reverse-time Riccati scan. See module docstring for shapes.

    ``u`` [T,B,nu] is the current control iterate; with box bounds the QP is
    solved in delta-space around it (reference lqr_step.py:130-137).

    backend: "auto" uses the fused Pallas TPU kernel (ops/pallas) when the
    configuration supports it and we are compiling for TPU; "pallas" forces
    it (interpret-mode off-TPU, for tests); "xla" forces this lax.scan.
    """
    T, B = C.shape[0], C.shape[1]
    nx, nu = n_state, n_ctrl
    boxed = u_lower is not None

    if parallel and not boxed:
        # associative-scan Riccati: O(log T) depth, exact for the
        # unconstrained recursion and for u_zero_I zero-control equality
        # constraints (free-subspace elimination, ops/parallel_riccati.py)
        # -- e.g. the module-KKT backward's auxiliary solve, which runs
        # once per IFT GMRES iteration. Its n > 3 solves (the [nx,nx]
        # combine AND the [nu,nu] control elimination) use batched
        # jnp.linalg.solve, which has no f64 batched LU on TPU -- those
        # combinations fall back to the sequential scan rather than
        # failing at compile time. The gate keys on the committed
        # platform of C when it is a concrete eager array, else
        # jax.default_backend() (trace time cannot see the execution
        # device) -- so axon-pinned JITTED f64 n>3 programs on CPU
        # devices conservatively take the sequential path, while eager
        # CPU-array calls use the parallel scan.
        plqr_ok = not (
            max(nx, nu) > 3
            and C.dtype == jnp.float64
            and target_platform(C) == "tpu"
        )
        if plqr_ok:
            from .parallel_riccati import plqr_backward

            K, k = plqr_backward(nx, nu, C, c, F, f, u_zero_I)
            return RiccatiResult(K, k, jnp.int32(0))

    if backend != "xla" and f is None:
        # NB the fused kernel implements the delta-space form (f folds into
        # c upstream, lqr_step.py:284-296); a non-None f must take the scan
        # path below, which applies q_t += F^T V f_t.
        from .pallas import lqr_backward_pallas, pallas_supported

        # committed-platform sniff (utils/platform.py): an EAGER call on
        # CPU-committed arrays must take the XLA scan even though the axon
        # plugin keeps jax.default_backend() == "tpu" (compiled Pallas
        # kernels have no CPU lowering); tracers fall back to the default
        # backend as before.
        on_tpu = target_platform(C) == "tpu"
        if pallas_supported(nu, C.dtype, u_zero_I, qp_solver, boxed) and (
            backend == "pallas" or on_tpu
        ):
            K, k = lqr_backward_pallas(
                nx,
                C,
                c,
                F,
                u,
                u_lower=u_lower,
                u_upper=u_upper,
                u_zero_I=u_zero_I,
                delta_u=delta_u,
                interpret=not on_tpu,
            )
            n_qp = jnp.int32(T if boxed else 0)
            return RiccatiResult(K, k, n_qp)

    # Pad F (and f) with a zero slab at t = T-1 so the scan body is uniform;
    # V_T = 0 makes the padded term vanish (Q_{T-1} = C_{T-1}).
    Fz = jnp.zeros((1, B, nx, nx + nu), dtype=C.dtype)
    F_pad = Fz if F is None else jnp.concatenate([F, Fz], axis=0)
    if f is not None:
        f_pad = jnp.concatenate([f, jnp.zeros((1, B, nx), dtype=C.dtype)], 0)
    else:
        f_pad = None

    def expand_bound(v, t_axis=True):
        # bounds may be scalar floats or [T, B, nu] arrays
        if v is None or jnp.ndim(v) == 0:
            return jnp.broadcast_to(jnp.asarray(v, C.dtype), (T, B, nu))
        return jnp.broadcast_to(v, (T, B, nu))

    if boxed:
        lb_all = expand_bound(u_lower) - u
        ub_all = expand_bound(u_upper) - u
        if delta_u is not None:
            lb_all = jnp.maximum(lb_all, -delta_u)
            ub_all = jnp.minimum(ub_all, delta_u)

    def step(carry, inp):
        V, v, prev_k, has_prev, qp_iters = carry
        if boxed:
            Ct, ct, Ft, ft, lb, ub, uz = inp
        else:
            Ct, ct, Ft, ft, uz = inp

        FtT = btr(Ft)
        Qt = Ct + bmm(FtT, bmm(V, Ft))
        qt = ct + bmv(FtT, v)
        if ft is not None:
            qt = qt + bmv(FtT, bmv(V, ft))

        Qxx = Qt[:, :nx, :nx]
        Qxu = Qt[:, :nx, nx:]
        Qux = Qt[:, nx:, :nx]
        Quu = Qt[:, nx:, nx:]
        qx = qt[:, :nx]
        qu = qt[:, nx:]

        if not boxed:
            if u_zero_I is None:
                Kt, kt = _unconstrained_gains(nu, Quu, Qux, qu)
            else:
                Kt, kt = _zero_constrained_gains(nu, Quu, Qux, qu, uz)
        elif nu == 1 and qp_solver == "auto":
            # Closed form: the 1-D box-QP min 0.5 H u^2 + q u on [l, ub] has
            # the exact minimizer clamp(-q/H, l, ub) (H > 0); pnqp's Newton
            # iteration converges to it to CONV_TOL=1e-4 (pnqp.py:56-59), so
            # this is the same answer without the Newton/Armijo while-loops.
            H = Quu[..., 0]  # [B, 1]
            kt = clamp(-qu / H, lb, ub)
            g = H * kt + qu
            Ic = ((kt <= lb) & (g > 0.0)) | ((kt >= ub) & (g < 0.0))
            If = 1.0 - Ic.astype(Quu.dtype)
            # H_free mirrors pnqp's masked+regularized Hessian (pnqp.py:44-49)
            H_free = Quu * bger(If, If) + 1e-11
            qp_iters = qp_iters + 1
            # Zero the active rows of Q_ux before forming K
            # (reference lqr_step.py:142-148).
            Kt = -(Qux * If[..., None]) / H_free
            prev_k = kt
            has_prev = jnp.asarray(True)
        else:
            # Warm start with the next timestep's k (reference
            # lqr_step.py:135-137); at t=T-1 fall back to pnqp's default
            # -H^{-1} q init by selecting it explicitly.
            if nu == 1:
                default_init = -qu / Quu[..., 0]
            else:
                sol = solve_psd(Quu, qu[..., None])
                default_init = -sol[..., 0]
            x_init = jnp.where(has_prev, prev_k, clamp(default_init, lb, ub))
            # NB: pnqp re-clamps x_init to the bounds internally.
            res = pnqp(
                Quu, qu, lb, ub, x_init=x_init, n_iter=pnqp_iter, unroll=unroll
            )
            kt = res.x
            qp_iters = qp_iters + 1 + res.n_iter
            # Zero the active rows of Q_ux before forming K
            # (reference lqr_step.py:142-148).
            Qux_ = Qux * res.If[..., None]
            if nu == 1:
                Kt = -Qux_ / res.H_free
            else:
                Kt = -solve_psd(res.H_free, Qux_)
            prev_k = kt
            has_prev = jnp.asarray(True)

        KtT = btr(Kt)
        Vn = Qxx + bmm(Qxu, Kt) + bmm(KtT, Qux) + bmm(KtT, bmm(Quu, Kt))
        vn = qx + bmv(Qxu, kt) + bmv(KtT, qu) + bmv(KtT, bmv(Quu, kt))
        return (Vn, vn, prev_k, has_prev, qp_iters), (Kt, kt)

    rev = lambda a: jnp.flip(a, axis=0)
    xs = [rev(C), rev(c), rev(F_pad)]
    xs.append(rev(f_pad) if f_pad is not None else [None] * T)
    if boxed:
        xs += [rev(lb_all), rev(ub_all)]
    uz_all = (
        rev(u_zero_I.astype(C.dtype))
        if u_zero_I is not None
        else jnp.zeros((T, B, nu), C.dtype)
    )
    xs.append(uz_all)

    # lax.scan can't carry None in xs; substitute explicit zeros for f.
    if f_pad is None:
        xs[3] = jnp.zeros((T, B, nx), dtype=C.dtype)
        use_f = False
    else:
        use_f = True

    def scan_step(carry, packed):
        if boxed:
            Ct, ct, Ft, ft, lb, ub, uz = packed
            inp = (Ct, ct, Ft, ft if use_f else None, lb, ub, uz)
        else:
            Ct, ct, Ft, ft, uz = packed
            inp = (Ct, ct, Ft, ft if use_f else None, uz)
        return step(carry, inp)

    V0 = jnp.zeros((B, nx, nx), dtype=C.dtype)
    v0 = jnp.zeros((B, nx), dtype=C.dtype)
    k0 = jnp.zeros((B, nu), dtype=C.dtype)
    carry0 = (V0, v0, k0, jnp.asarray(False), jnp.int32(0))
    (_, _, _, _, qp_iters), (K_rev, k_rev) = lax.scan(
        scan_step, carry0, tuple(xs)
    )
    # Scan emitted t = T-1 .. 0; flip back to t ascending.
    return RiccatiResult(rev(K_rev), rev(k_rev), qp_iters)
