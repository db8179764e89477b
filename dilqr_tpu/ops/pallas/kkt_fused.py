"""Fused Pallas TPU kernel for the module-KKT VJP recursions.

The differentiation path is the reference paper's contribution
(lqr_step_explicit.py:652-716), and diff/kkt.kkt_vjp is its core operator:
every IFT GMRES iteration applies one full KKT VJP (auxiliary Riccati
solve + auxiliary rollout + two adjoint recursions + dF/df assembly,
reference lqr_step.py:311-407). On the XLA path that is four sequential
lax.scans plus [T,B,nx,n] outer products -- each scan step a separate
batched op with HBM round-trips for the carried state.

This kernel runs all four recursions for a 1024-example batch tile in ONE
kernel invocation, V/v/lam/dlam carried in vector registers between
timesteps (zero HBM traffic inside the recursions), reusing the
batch-on-lanes layout and the small-matrix lane solves of the megakernel
(ops/pallas/ilqr_fused._inv_lanes, nu <= 3 closed-form adjugate).

Three passes per tile:
  1. reverse Riccati on (C, -r, F) with the frozen-active-set zero-mask
     gains (reference lqr_step.py:99-127, including the nu==1 quirk that
     k divides by the UNmasked Quu at :121-123); K, k stored in VMEM
  2. forward rollout of the auxiliary LQR (exact alpha=1 minimizer,
     see diff/kkt.py) producing dtau
  3. joint reverse adjoint recursion for lambda and d-lambda
     (lqr_step.py:355-385), emitted as [T]-stacks

The kernel emits only the COMPACT vectors (dtau [T,n], lam/dlam [T,nx]);
the rank-1 outer products dF = -(dlam_{t+1} tau_t^T + lam_{t+1} dtau_t^T)
and dC = -1/2 (dtau tau^T + tau dtau^T) (lqr_step.py:346-353, 387-404)
are assembled by plain XLA broadcasts that fuse into their consumers
(the linearization VJP). Scoped-VMEM forced this split: emitting
[T,nx,n]/[T,n,n] tiles put the cartpole headline kernel at a measured
19.92 MB against the 16 MB stack limit; compact outputs plus the
symmetric-triangle C packing and the host-precomputed adjoint offset
b_t = C_t[:nx,:] tau_t + c_t[:nx] bring it to ~13.7 MB estimated.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ilqr_fused import _inv_lanes, _mm_sym, _mv
from .layout import BT, LaneView, bspec, from_lanes, pad_batch, to_lanes

VMEM_BUDGET = 15 * 2 ** 20  # same calibrated gate as the megakernel


def _tri(n: int) -> int:
    return n * (n + 1) // 2


def kkt_vmem_bytes(T: int, nx: int, nu: int) -> int:
    """Per-tile VMEM footprint in 4 KB [8, 128] f32 tiles: pipelined
    inputs/outputs count DOUBLE (Mosaic stages block g+1 against compute
    of block g), plus single-buffered scratch and the Riccati step's live
    temporaries. Calibrated against the measured 19.92 MB scoped-VMEM
    allocation of the pre-slim variant (this formula applied to that
    variant's operand set predicts 20.9 MB)."""
    n = nx + nu
    in_tiles = (
        T * _tri(n)        # C (symmetric triangle)
        + T * nx * n       # F (padded to T)
        + T * n            # r
        + T * nu           # uz
        + T * nx           # lam_b
    )
    out_tiles = T * n + 2 * T * nx  # dtau, lam, dlam
    scratch = T * (nu * nx + nu)    # K, k
    temp = 6 * n * n + 4 * nx * nx  # live Riccati-step temporaries
    return (2 * (in_tiles + out_tiles) + scratch + temp) * 8 * 128 * 4


def kkt_fused_supported(T: int, nx: int, nu: int, dtype,
                        full: bool = True) -> bool:
    """nu <= 3 (closed-form lane inverses), f32, T >= 2, VMEM-resident.
    Larger problems (rocket T>=40) fall back to the XLA scans."""
    return (
        nu <= 3
        and dtype == jnp.float32
        and T >= 2
        and kkt_vmem_bytes(T, nx, nu) <= VMEM_BUDGET
    )


def _kkt_kernel(T, nx, nu, C_ref, F_ref, r_ref, uz_ref, b_ref,
                dtau_ref, lam_ref, dlam_ref, K_ref, k_ref):
    """One batch tile; see module docstring.

    Lane ref shapes (grid-blocked batch dim squeezed by LaneView):
    C [T,tri(n)] (packed upper triangle, row-major (i,j) j>=i),
    F [T,nx,n] (t=T-1 slab zero), r [T,n], uz [T,nu], b [T,nx]
    (the invariant adjoint offset C[:nx,:] tau + c[:nx]);
    outputs dtau [T,n], lam [T,nx], dlam [T,nx];
    scratch K [T,nu,nx], k [T,nu].
    """
    n = nx + nu
    ts = C_ref.r.shape[-2:]  # [8, 128]
    f32 = jnp.float32
    zero_vec = lambda m: jnp.zeros((m,) + tuple(ts), f32)
    zero_mat = lambda m, k: jnp.zeros((m, k) + tuple(ts), f32)

    tri_ix = {}
    k_ = 0
    for i in range(n):
        for j in range(i, n):
            tri_ix[(i, j)] = tri_ix[(j, i)] = k_
            k_ += 1

    def load_F(t):
        return jnp.stack(
            [jnp.stack([F_ref[t, a, j] for j in range(n)])
             for a in range(nx)])

    def load_C(t):
        return jnp.stack(
            [jnp.stack([C_ref[t, tri_ix[(i, j)]] for j in range(n)])
             for i in range(n)])

    # ---- pass 1: reverse Riccati, aux cost (C, -r), zero-mask gains ----
    def ric_body(i, carry):
        V, v = carry
        t = T - 1 - i
        F = load_F(t)                      # [nx, n]
        C = load_C(t)                      # [n, n]
        VF = _mm3(V, F)                    # [nx, n]
        Q = C + _mm_sym(_tr(F), VF)        # F^T (V F), symmetric
        q = jnp.stack([-r_ref[t, i_] for i_ in range(n)]) + _mv(_tr(F), v)

        Quu = Q[nx:, nx:]                  # [nu, nu]
        Qux = Q[nx:, :nx]                  # [nu, nx]
        qu = q[nx:]
        uz = jnp.stack([uz_ref[t, b] for b in range(nu)])  # [nu]
        notI = 1.0 - uz
        # masked+ridged Hessian (reference lqr_step.py:99-127); built by
        # stacking -- .at[].add scatter does not lower in Mosaic
        Quu_m = jnp.stack([
            jnp.stack([
                Quu[a, b] * notI[a] * notI[b]
                + (1e-8 * uz[a] if a == b else 0.0)
                for b in range(nu)
            ])
            for a in range(nu)
        ])
        Qux_m = Qux * notI[:, None]
        qu_m = qu * notI
        if nu == 1:
            # reference quirk: k divides by the UNmasked Quu
            # (lqr_step.py:121-123)
            kt = -qu_m / Quu[0, 0][None]
            K = -Qux_m / Quu_m[0, 0][None, None]
        else:
            inv = _inv_lanes(Quu_m, nu)
            kt = -_mv(inv, qu_m)
            K = -_mm3(inv, Qux_m)

        for a in range(nu):
            k_ref[t, a] = kt[a]
            for b in range(nx):
                K_ref[t, a, b] = K[a, b]

        # cost-to-go update (lqr_step.py:155-158), same op order as the
        # XLA path's bmm chain for f32 parity
        Qxx = Q[:nx, :nx]
        Qxu = Q[:nx, nx:]
        qx = q[:nx]
        KtT = _tr(K)                        # [nx, nu]
        QuuK = _mm3(Quu, K)                 # [nu, nx]
        Vn = Qxx + _mm3(Qxu, K) + _mm3(KtT, Qux) + _mm_sym(KtT, QuuK)
        vn = qx + _mv(Qxu, kt) + _mv(KtT, qu) + _mv(KtT, _mv(Quu, kt))
        return (Vn, vn)

    lax.fori_loop(0, T, ric_body, (zero_mat(nx, nx), zero_vec(nx)))

    # ---- pass 2: forward aux rollout ----
    def roll_body(t, dx):
        uz = jnp.stack([uz_ref[t, b] for b in range(nu)])
        K = jnp.stack(
            [jnp.stack([K_ref[t, a, b] for b in range(nx)])
             for a in range(nu)])
        kt = jnp.stack([k_ref[t, a] for a in range(nu)])
        du = (_mv(K, dx) + kt) * (1.0 - uz)
        dtau = jnp.concatenate([dx, du], axis=0)  # [n]
        for i_ in range(n):
            dtau_ref[t, i_] = dtau[i_]
        F = load_F(t)
        return _mv(F, dtau)

    lax.fori_loop(0, T, roll_body, zero_vec(nx))

    # ---- pass 3: joint reverse adjoint recursions ----
    def adj_body(i, carry):
        lam, dlam = carry                  # lam_{t+1}, dlam_{t+1}
        t = T - 1 - i
        F = load_F(t)
        FxT = _tr(F[:, :nx])               # [nx, nx]
        dtau = jnp.stack([dtau_ref[t, i_] for i_ in range(n)])
        # Cx = C[:nx, :] rows of the packed-triangle C
        Cx = jnp.stack(
            [jnp.stack([C_ref[t, tri_ix[(a, j)]] for j in range(n)])
             for a in range(nx)])
        b = jnp.stack([b_ref[t, a] for a in range(nx)])
        rx = jnp.stack([r_ref[t, a] for a in range(nx)])
        lam_t = b + _mv(FxT, lam)
        dlam_t = _mv(Cx, dtau) - rx + _mv(FxT, dlam)
        for a in range(nx):
            lam_ref[t, a] = lam_t[a]
            dlam_ref[t, a] = dlam_t[a]
        return (lam_t, dlam_t)

    lax.fori_loop(0, T, adj_body, (zero_vec(nx), zero_vec(nx)))


def _tr(A):
    """Transpose the two leading (small) dims of a lane stack."""
    return jnp.swapaxes(A, 0, 1)


def _mm3(A, B):
    """A [m,k,*ts] @ B [k,p,*ts] -> [m,p,*ts] (general, not symmetric)."""
    return (A[:, :, None] * B[None]).sum(1)


def make_kkt_vjp_pallas(
    n_state: int,
    n_ctrl: int,
    C: jax.Array,
    c: jax.Array,
    F: jax.Array,
    x: jax.Array,
    u: jax.Array,
    u_zero_I=None,
    interpret: bool = False,
):
    """Factory: pre-lanes the cotangent-invariant operands ONCE and
    returns ``call(g_x, g_u, full) -> (dx_init, dC, dc, dF, df)``. The
    IFT GMRES loop applies the returned closure every iteration; only
    the [T,B,n] cotangent is re-laned per call (the closed-over laned
    invariants are while_loop constants).

    In Ff mode (full=False) dx_init, dC, dc are None. Shapes as
    diff/kkt.KKTGrads; F is [T-1,B,nx,n]. NB: C is assumed symmetric
    (as everywhere in the solver -- the megakernel's Riccati makes the
    same assumption); the packed-triangle load symmetrizes implicitly.
    """
    T, B = C.shape[0], C.shape[1]
    nx, nu = n_state, n_ctrl
    n = nx + nu
    dtype = C.dtype

    Bp = -(-B // BT) * BT
    G = Bp // BT

    F_full = jnp.concatenate(
        [F, jnp.zeros((1, B, nx, n), dtype)], axis=0)
    uz = (
        u_zero_I.astype(dtype)
        if u_zero_I is not None
        else jnp.zeros((T, B, nu), dtype)
    )
    tau = jnp.concatenate([x, u], axis=-1)
    # invariant adjoint offset b_t = C_t[:nx,:] tau_t + c_t[:nx]
    # (the lam recursion's data term, reference lqr_step.py:355-368)
    lam_b = (
        jnp.einsum("tbij,tbj->tbi", C[:, :, :nx, :], tau) + c[:, :, :nx]
    )
    # packed upper triangle, row-major (i,j) j >= i. Padded examples:
    # identity cost keeps Quu = 1 (their outputs are sliced away)
    iu = [(i, j) for i in range(n) for j in range(i, n)]
    C_tri = jnp.stack([C[:, :, i, j] for (i, j) in iu], axis=-1)
    eye_tri = jnp.asarray(
        [1.0 if i == j else 0.0 for (i, j) in iu], dtype)
    C_tri_p = pad_batch(C_tri, B, Bp)
    if Bp != B:
        C_tri_p = C_tri_p.at[:, B:].set(eye_tri)

    invariants = [
        to_lanes(C_tri_p, T, Bp),
        to_lanes(pad_batch(F_full, B, Bp), T, Bp),
        to_lanes(pad_batch(uz, B, Bp), T, Bp),
        to_lanes(pad_batch(lam_b, B, Bp), T, Bp),
    ]

    in_specs = [
        bspec(T, (_tri(n),)), bspec(T, (nx, n)), bspec(T, (n,)),
        bspec(T, (nu,)), bspec(T, (nx,)),
    ]
    out_specs = [bspec(T, (n,)), bspec(T, (nx,)), bspec(T, (nx,))]
    out_shape = [
        jax.ShapeDtypeStruct((T, n, G, 8, 128), dtype),
        jax.ShapeDtypeStruct((T, nx, G, 8, 128), dtype),
        jax.ShapeDtypeStruct((T, nx, G, 8, 128), dtype),
    ]
    kernel = functools.partial(_kkt_kernel, T, nx, nu)

    def wrapped(C_r, F_r, r_r, uz_r, b_r, dtau_r, lam_r, dlam_r, K_r, k_r):
        kernel(
            LaneView(C_r), LaneView(F_r), LaneView(r_r), LaneView(uz_r),
            LaneView(b_r), LaneView(dtau_r), LaneView(lam_r),
            LaneView(dlam_r), K_r, k_r,
        )

    def call(g_x, g_u, full=True):
        r = jnp.concatenate([g_x, g_u], axis=-1)
        r_l = to_lanes(pad_batch(r, B, Bp), T, Bp)

        outs = pl.pallas_call(
            wrapped,
            grid=(G,),
            in_specs=[in_specs[0], in_specs[1], in_specs[2],
                      in_specs[3], in_specs[4]],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((T, nu, nx, 8, 128), dtype),
                pltpu.VMEM((T, nu, 8, 128), dtype),
            ],
            interpret=interpret,
        )(invariants[0], invariants[1], r_l, invariants[2], invariants[3])

        dtau = from_lanes(outs[0], T, B)
        lam = from_lanes(outs[1], T, B)
        dlam = from_lanes(outs[2], T, B)

        # rank-1 assembly in XLA (fuses into the linearization-VJP
        # consumers; reference lqr_step.py:387-404)
        dF = -(dlam[1:, :, :, None] * tau[:-1, :, None, :]
               + lam[1:, :, :, None] * dtau[:-1, :, None, :])
        df = -dlam[1:]
        if not full:
            return None, None, None, dF, df
        dxi = -dlam[0]
        dC = -0.5 * (dtau[..., :, None] * tau[..., None, :]
                     + tau[..., :, None] * dtau[..., None, :])
        dc = -dtau
        return dxi, dC, dc, dF, df

    return call


def kkt_vjp_pallas(
    n_state: int,
    n_ctrl: int,
    C: jax.Array,
    c: jax.Array,
    F: jax.Array,
    x: jax.Array,
    u: jax.Array,
    g_x: jax.Array,
    g_u: jax.Array,
    u_zero_I=None,
    full: bool = True,
    interpret: bool = False,
):
    """One-shot convenience wrapper around make_kkt_vjp_pallas."""
    return make_kkt_vjp_pallas(
        n_state, n_ctrl, C, c, F, x, u, u_zero_I=u_zero_I,
        interpret=interpret,
    )(g_x, g_u, full)
