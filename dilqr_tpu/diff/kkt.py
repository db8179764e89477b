"""Module-KKT differentiation of an LQR solve.

TPU-native re-implementation of the reference LQRStepFn.backward
(lqr_step.py:311-407): given a loss cotangent r = (dl_dx, dl_du) on the
converged trajectory tau* of the *last LQR subproblem*, one auxiliary LQR
solve with cost QuadCost(C, -r) and dynamics LinDx(F, None) (frozen box
active set as zero-control equality constraints, lqr_step.py:322-340) yields
the KKT sensitivities, from which the parameter cotangents are assembled:

    dC = -1/2 (dtau tau^T + tau dtau^T)      (lqr_step.py:346-351)
    dc = -dtau                                (lqr_step.py:353)
    lambda / dlambda reverse adjoint scans    (lqr_step.py:355-385)
    dF_t = -(dlam_{t+1} tau_t^T + lam_{t+1} dtau_t^T)  (lqr_step.py:387-395)
    df   = -dlam_{1:}                         (lqr_step.py:397-402)
    dx_init = -dlam_0                         (lqr_step.py:404)

The auxiliary solve here uses a plain alpha=1 rollout rather than the
reference's line-searched one (lqr_step.py:327-340): for the convex LQR
subproblem the alpha=1 Riccati rollout IS the exact minimizer, and -- unlike
the line search -- it is *linear* in r, which the matrix-free IFT mode
(diff/ift.py) requires of this operator.

Everything below is also the building block S^T of the DiLQR fixed-point
backward: `kkt_vjp` IS the transposed sensitivity map of the LQR subproblem
solution with respect to its problem data.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.riccati import lqr_backward
from ..utils.batch import bger, bmv, btr
from ..utils.platform import target_platform


class KKTGrads(NamedTuple):
    dx_init: jax.Array  # [B, nx]
    dC: jax.Array  # [T, B, n, n]
    dc: jax.Array  # [T, B, n]
    dF: jax.Array  # [T-1, B, nx, n]
    df: jax.Array  # [T-1, B, nx]


def lqr_solve_linear(
    n_state: int,
    n_ctrl: int,
    C: jax.Array,
    F: jax.Array,
    r: jax.Array,
    u_zero_I: Optional[jax.Array] = None,
    backend: str = "auto",
    parallel: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Solve the auxiliary LQR: argmin sum 0.5 d tau^T C d tau - r^T d tau
    s.t. d x_{t+1} = F_t d tau_t, d x_0 = 0, d u = 0 on u_zero_I.

    Linear in r. Returns (dx [T,B,nx], du [T,B,nu]). Mirrors the values of
    the reference's nested 1-iteration MPC call (lqr_step.py:327-340).

    parallel: O(log T)-depth associative-scan Riccati + rollout
    (ops/parallel_riccati.py, with the u_zero_I free-subspace masking) --
    this solve runs once per IFT GMRES iteration, so large-T backward
    passes benefit the most. Exact (same minimizer); f32 parity with the
    sequential scan is ~roundoff.
    """
    T, B = C.shape[0], C.shape[1]
    nu = n_ctrl

    if parallel and not (
        max(n_state, n_ctrl) > 3  # [nx,nx] combine OR [nu,nu] elimination
        and C.dtype == jnp.float64
        and target_platform(C) == "tpu"  # no f64 batched LU (riccati.py)
    ):
        from ..ops.parallel_riccati import plqr_solve

        res = plqr_solve(
            n_state, nu, C, -r, F, None,
            jnp.zeros((B, n_state), C.dtype), u_zero_I,
        )
        du = res.u if u_zero_I is None else jnp.where(u_zero_I, 0.0, res.u)
        return res.x, du

    ric = lqr_backward(
        n_state,
        n_ctrl,
        C,
        -r,
        F,
        None,
        u=jnp.zeros((T, B, nu), C.dtype),
        u_zero_I=u_zero_I,
        backend=backend,
    )

    F_pad = jnp.concatenate([F, jnp.zeros_like(F[:1])], axis=0)
    uz = (
        u_zero_I
        if u_zero_I is not None
        else jnp.zeros((T, B, nu), dtype=bool)
    )

    def step(dx_t, inp):
        K_t, k_t, F_t, uz_t = inp
        du_t = bmv(K_t, dx_t) + k_t
        du_t = jnp.where(uz_t, 0.0, du_t)
        dtau = jnp.concatenate([dx_t, du_t], axis=-1)
        return bmv(F_t, dtau), (dx_t, du_t)

    _, (dx, du) = lax.scan(
        step,
        jnp.zeros((B, n_state), C.dtype),
        (ric.K, ric.k, F_pad, uz),
    )
    return dx, du


def _adjoint_scan(n_state, C, F, x, u, cvec, parallel: bool = False):
    """Reverse recursion lam_t = C_xx x_t + C_xu u_t + cvec_t[:nx]
    + F_x_t^T lam_{t+1} (reference lqr_step.py:355-368).

    parallel: the recursion is an affine-map suffix product
    lam_t = (f_t o f_{t+1} o ... o f_{T-1})(0) with f_t(y) = M_t y + b_t,
    M_t = F_x_t^T -- an associative scan of O(log T) depth."""
    nx = n_state
    Fx = btr(F[:, :, :, :nx])  # [T-1, B, nx, nx]
    Fx_pad = jnp.concatenate([Fx, jnp.zeros_like(Fx[:1])], axis=0)

    if parallel:
        b = (
            jnp.einsum("tbij,tbj->tbi", C[:, :, :nx, :nx], x)
            + jnp.einsum("tbij,tbj->tbi", C[:, :, :nx, nx:], u)
            + cvec[:, :, :nx]
        )

        def comb(e1, e2):
            # e1 earlier in time, e2 = accumulated future segment
            M1, b1 = e1
            M2, b2 = e2
            return jnp.einsum("tbij,tbjk->tbik", M1, M2), (
                jnp.einsum("tbij,tbj->tbi", M1, b2) + b1
            )

        _, lams = lax.associative_scan(
            lambda a, b_: comb(b_, a), (Fx_pad, b), reverse=True, axis=0
        )
        return lams

    def step(prev_lam, inp):
        Ct, xt, ut, ct, Fxt = inp
        lamt = (
            bmv(Ct[:, :nx, :nx], xt)
            + bmv(Ct[:, :nx, nx:], ut)
            + ct[:, :nx]
            # at t = T-1 both Fxt (zero pad) and prev_lam (zero init) vanish
            + bmv(Fxt, prev_lam)
        )
        return lamt, lamt

    rev = lambda a: jnp.flip(a, axis=0)
    _, lams_rev = lax.scan(
        step,
        jnp.zeros_like(x[0]),
        (rev(C), rev(x), rev(u), rev(cvec), rev(Fx_pad)),
    )
    return rev(lams_rev)


def make_kkt_vjp(
    n_state: int,
    n_ctrl: int,
    C: jax.Array,
    c: jax.Array,
    F: jax.Array,
    x: jax.Array,
    u: jax.Array,
    u_zero_I: Optional[jax.Array] = None,
    with_f: bool = True,
    backend: str = "auto",
    parallel: bool = False,
):
    """Factory for the module-KKT VJP at a fixed solution point: returns
    ``vjp(g_x, g_u, wants="full"|"Ff") -> KKTGrads``, linear in the
    cotangents.

    The IFT backward applies this operator once per GMRES iteration with
    ``wants="Ff"`` (it only consumes dF/df there; dC/dc and their
    [T,B,n,n] outer products are skipped), then once with the full
    outputs. Building the operator ONCE lets the fused TPU path
    (ops/pallas/kkt_fused.py) pre-lane the cotangent-invariant problem
    data outside the GMRES while_loop.

    Dispatch: the whole VJP (auxiliary Riccati + rollout + both adjoint
    recursions + assembly) runs as ONE Pallas kernel per batch tile when
    supported (nu <= 3, f32, VMEM-resident; backend "auto" on a TPU
    execution platform, or forced "pallas" -- interpret off-TPU);
    otherwise the lax.scan path below. ``parallel``
    (cfg.riccati_parallel) opts into O(log T)-depth associative scans
    instead and takes precedence over the fused kernel (its use case --
    very large T -- exceeds the kernel's VMEM budget anyway).
    """
    if backend != "xla" and not parallel:
        from ..ops.pallas.kkt_fused import (kkt_fused_supported,
                                            make_kkt_vjp_pallas)

        T = C.shape[0]
        if kkt_fused_supported(T, n_state, n_ctrl, C.dtype, True):
            on_tpu = target_platform(C) == "tpu"
            if backend == "pallas" or on_tpu:
                call = make_kkt_vjp_pallas(
                    n_state, n_ctrl, C, c, F, x, u, u_zero_I=u_zero_I,
                    interpret=not on_tpu,
                )

                def vjp_fused(g_x, g_u, wants: str = "full") -> KKTGrads:
                    full = wants == "full"
                    dxi, dC, dc, dF, df = call(g_x, g_u, full)
                    if not with_f:
                        df = jnp.zeros_like(df)
                    return KKTGrads(dxi, dC, dc, dF, df)

                return vjp_fused

    def vjp_xla(g_x, g_u, wants: str = "full") -> KKTGrads:
        r = jnp.concatenate([g_x, g_u], axis=-1)
        dx, du = lqr_solve_linear(n_state, n_ctrl, C, F, r, u_zero_I,
                                  backend=backend, parallel=parallel)

        dtau = jnp.concatenate([dx, du], axis=-1)
        tau = jnp.concatenate([x, u], axis=-1)

        if wants == "full":
            dC = -0.5 * (bger(dtau, tau) + bger(tau, dtau))
            dc = -dtau
        else:  # "Ff": skip the [T,B,n,n] outer products
            dC = dc = None

        lams = _adjoint_scan(n_state, C, F, x, u, c, parallel=parallel)
        dlams = _adjoint_scan(n_state, C, F, dx, du, -r, parallel=parallel)

        dF = -(bger(dlams[1:], tau[:-1]) + bger(lams[1:], dtau[:-1]))
        df = -dlams[1:] if with_f else jnp.zeros_like(dlams[1:])
        dx_init = -dlams[0]
        return KKTGrads(dx_init, dC, dc, dF, df)

    return vjp_xla


def kkt_vjp(
    n_state: int,
    n_ctrl: int,
    C: jax.Array,
    c: jax.Array,
    F: jax.Array,
    x: jax.Array,
    u: jax.Array,
    g_x: jax.Array,
    g_u: jax.Array,
    u_zero_I: Optional[jax.Array] = None,
    with_f: bool = True,
    backend: str = "auto",
    parallel: bool = False,
) -> KKTGrads:
    """Full module-KKT VJP (reference lqr_step.py:311-407).

    x, u: converged trajectory [T,B,...]; g_x, g_u: loss cotangents.
    u_zero_I: frozen active set (reference freezes the box active set as
    |u-l|<=1e-8 | |u-ub|<=1e-8, lqr_step.py:322-326 -- computed by the
    caller). Linear in (g_x, g_u). One-shot wrapper over make_kkt_vjp.
    """
    return make_kkt_vjp(
        n_state, n_ctrl, C, c, F, x, u, u_zero_I=u_zero_I, with_f=with_f,
        backend=backend, parallel=parallel,
    )(g_x, g_u)
