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


def kkt_stream_vmem_bytes(nx: int, nu: int) -> int:
    """Streamed variant: O(1) in T -- 2-slot staging per stream (C, F,
    r, uz, b, Kk, dtau, lam, dlam) plus the live Riccati temporaries."""
    n = nx + nu
    staging = 2 * (
        _tri(n) + nx * n + n + nu + nx      # C, F, r, uz, b
        + nu * (nx + 1)                     # Kk
        + n + nx + nx                       # dtau, lam, dlam
    )
    temp = 6 * n * n + 4 * nx * nx
    return (staging + temp) * 8 * 128 * 4


def kkt_fused_mode(T: int, nx: int, nu: int, dtype):
    """Dispatch decision: "resident" (whole problem in VMEM), "stream"
    (every per-t slab double-buffered through HBM -- any horizon, e.g.
    the rocket's T*tri(16) tiles), or None (XLA scans)."""
    if nu > 3 or dtype != jnp.float32 or T < 2:
        return None
    if kkt_vmem_bytes(T, nx, nu) <= VMEM_BUDGET:
        return "resident"
    if kkt_stream_vmem_bytes(nx, nu) <= VMEM_BUDGET:
        return "stream"
    return None


def kkt_fused_supported(T: int, nx: int, nu: int, dtype,
                        full: bool = True) -> bool:
    """nu <= 3 (closed-form lane inverses), f32, T >= 2; VMEM-resident
    or (any horizon) HBM-streamed."""
    return kkt_fused_mode(T, nx, nu, dtype) is not None


def _ric_step(nx, nu, C, F, rvec, uz, V, v):
    """One reverse-Riccati step of the auxiliary LQR (cost (C, -r),
    zero-mask gains): returns (K [nu,nx], kt [nu], Vn, vn). Stacks of
    [*, 8, lw] lane tiles; shared verbatim by the resident and streamed
    kernels so their numerics are op-identical."""
    VF = _mm3(V, F)                    # [nx, n]
    Q = C + _mm_sym(_tr(F), VF)        # F^T (V F), symmetric
    q = -rvec + _mv(_tr(F), v)

    Quu = Q[nx:, nx:]
    Qux = Q[nx:, :nx]
    qu = q[nx:]
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

    # cost-to-go update (lqr_step.py:155-158), same op order as the
    # XLA path's bmm chain for f32 parity
    Qxx = Q[:nx, :nx]
    Qxu = Q[:nx, nx:]
    qx = q[:nx]
    KtT = _tr(K)
    QuuK = _mm3(Quu, K)
    Vn = Qxx + _mm3(Qxu, K) + _mm3(KtT, Qux) + _mm_sym(KtT, QuuK)
    vn = qx + _mv(Qxu, kt) + _mv(KtT, qu) + _mv(KtT, _mv(Quu, kt))
    return K, kt, Vn, vn


def _roll_step(K, kt, uz, F, dx):
    """One forward rollout step: returns (dtau [n], dx_next [nx])."""
    du = (_mv(K, dx) + kt) * (1.0 - uz)
    dtau = jnp.concatenate([dx, du], axis=0)
    return dtau, _mv(F, dtau)


def _adj_step(nx, Cx, F, b, rx, dtau, lam, dlam):
    """One joint reverse adjoint step (lam_{t+1}, dlam_{t+1}) ->
    (lam_t, dlam_t); Cx = C[:nx, :] rows, b = Cx tau + c[:nx]."""
    FxT = _tr(F[:, :nx])
    lam_t = b + _mv(FxT, lam)
    dlam_t = _mv(Cx, dtau) - rx + _mv(FxT, dlam)
    return lam_t, dlam_t


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
        rvec = jnp.stack([r_ref[t, i_] for i_ in range(n)])
        uz = jnp.stack([uz_ref[t, b] for b in range(nu)])
        K, kt, Vn, vn = _ric_step(
            nx, nu, load_C(t), load_F(t), rvec, uz, V, v)
        for a in range(nu):
            k_ref[t, a] = kt[a]
            for b in range(nx):
                K_ref[t, a, b] = K[a, b]
        return (Vn, vn)

    lax.fori_loop(0, T, ric_body, (zero_mat(nx, nx), zero_vec(nx)))

    # ---- pass 2: forward aux rollout ----
    def roll_body(t, dx):
        uz = jnp.stack([uz_ref[t, b] for b in range(nu)])
        K = jnp.stack(
            [jnp.stack([K_ref[t, a, b] for b in range(nx)])
             for a in range(nu)])
        kt = jnp.stack([k_ref[t, a] for a in range(nu)])
        dtau, dx_next = _roll_step(K, kt, uz, load_F(t), dx)
        for i_ in range(n):
            dtau_ref[t, i_] = dtau[i_]
        return dx_next

    lax.fori_loop(0, T, roll_body, zero_vec(nx))

    # ---- pass 3: joint reverse adjoint recursions ----
    def adj_body(i, carry):
        lam, dlam = carry                  # lam_{t+1}, dlam_{t+1}
        t = T - 1 - i
        dtau = jnp.stack([dtau_ref[t, i_] for i_ in range(n)])
        # Cx = C[:nx, :] rows of the packed-triangle C
        Cx = jnp.stack(
            [jnp.stack([C_ref[t, tri_ix[(a, j)]] for j in range(n)])
             for a in range(nx)])
        b = jnp.stack([b_ref[t, a] for a in range(nx)])
        rx = jnp.stack([r_ref[t, a] for a in range(nx)])
        lam_t, dlam_t = _adj_step(
            nx, Cx, load_F(t), b, rx, dtau, lam, dlam)
        for a in range(nx):
            lam_ref[t, a] = lam_t[a]
            dlam_ref[t, a] = dlam_t[a]
        return (lam_t, dlam_t)

    lax.fori_loop(0, T, adj_body, (zero_vec(nx), zero_vec(nx)))


def _stream(hbm, st, sem, g_id, T):
    """2-slot double-buffered HBM<->VMEM staging for one grid-major
    [G, T, *elem] buffer -- same protocol as the megakernel's
    full-stream helper (ops/pallas/ilqr_fused.py): sequential sweeps in
    t (direction d = +1/-1); a write phase must be flushed before a
    read phase reuses the same stream."""

    def w(slot, t):
        return pltpu.make_async_copy(
            st.at[slot], hbm.at[g_id, t], sem.at[slot])

    def r(slot, t):
        return pltpu.make_async_copy(
            hbm.at[g_id, t], st.at[slot], sem.at[slot])

    def read_begin(t0):
        r(lax.rem(t0, 2), t0).start()

    def read_at(t, d):
        nt = t + d

        @pl.when((nt >= 0) & (nt < T))
        def _():
            r(lax.rem(nt, 2), nt).start()

        slot = lax.rem(t, 2)
        r(slot, t).wait()
        return st[slot]

    def write(t, val, d):
        slot = lax.rem(t, 2)
        to = t - 2 * d  # this slot's previous write, two steps ago

        @pl.when((to >= 0) & (to < T))
        def _():
            w(slot, to).wait()

        st[slot] = val
        w(slot, t).start()

    def write_flush(d):
        for tj in ((1, 0) if d < 0 else (T - 2, T - 1)):
            if 0 <= tj < T:
                w(tj % 2, tj).wait()

    return read_begin, read_at, write, write_flush


def _kkt_stream_kernel(T, nx, nu,
                       C_hbm, F_hbm, r_hbm, uz_hbm, b_hbm,
                       dtau_hbm, lam_hbm, dlam_hbm, Kk_hbm,
                       C_st, F_st, r_st, uz_st, b_st, dtau_st, lam_st,
                       dlam_st, Kk_st,
                       C_sem, F_sem, r_sem, uz_sem, b_sem, dtau_sem,
                       lam_sem, dlam_sem, Kk_sem):
    """Streamed variant of _kkt_kernel: every per-t slab (inputs,
    outputs, and the K/k inter-pass staging) double-buffers through HBM,
    so VMEM residency is O(1) in T -- rocket-sized problems
    (T * tri(16) tiles) run fused instead of falling back to the XLA
    scans. Same three passes; the per-step math is the SAME helper
    functions as the resident kernel (_ric_step/_roll_step/_adj_step),
    so the two variants are op-identical per step.

    All refs are grid-major [G, T, *small, 8, 128] in compiler-placed
    (HBM) memory (pl.ANY); Kk_hbm is a working buffer the caller drops
    (Pallas has no HBM scratch). Each buffer gets its own staging slots
    and DMA semaphores; the Kk and dtau streams are written by one pass
    and read back by a later one (phases strictly sequential)."""
    n = nx + nu
    ts = C_st.shape[-2:]
    f32 = jnp.float32
    zero_vec = lambda m: jnp.zeros((m,) + tuple(ts), f32)
    zero_mat = lambda m, k: jnp.zeros((m, k) + tuple(ts), f32)
    g_id = pl.program_id(0)

    tri_ix = {}
    k_ = 0
    for i in range(n):
        for j in range(i, n):
            tri_ix[(i, j)] = tri_ix[(j, i)] = k_
            k_ += 1

    C_rb, C_ra, _, _ = _stream(C_hbm, C_st, C_sem, g_id, T)
    F_rb, F_ra, _, _ = _stream(F_hbm, F_st, F_sem, g_id, T)
    r_rb, r_ra, _, _ = _stream(r_hbm, r_st, r_sem, g_id, T)
    uz_rb, uz_ra, _, _ = _stream(uz_hbm, uz_st, uz_sem, g_id, T)
    b_rb, b_ra, _, _ = _stream(b_hbm, b_st, b_sem, g_id, T)
    dt_rb, dt_ra, dt_w, dt_fl = _stream(
        dtau_hbm, dtau_st, dtau_sem, g_id, T)
    _, _, lam_w, lam_fl = _stream(lam_hbm, lam_st, lam_sem, g_id, T)
    _, _, dlam_w, dlam_fl = _stream(dlam_hbm, dlam_st, dlam_sem, g_id, T)
    Kk_rb, Kk_ra, Kk_w, Kk_fl = _stream(Kk_hbm, Kk_st, Kk_sem, g_id, T)

    def unpack_C(Ct):
        full = jnp.stack(
            [jnp.stack([Ct[tri_ix[(i, j)]] for j in range(n)])
             for i in range(n)])
        return full

    # ---- pass 1: reverse Riccati ----
    C_rb(T - 1)
    F_rb(T - 1)
    r_rb(T - 1)
    uz_rb(T - 1)

    def ric_body(i, carry):
        V, v = carry
        t = T - 1 - i
        Ct = unpack_C(C_ra(t, -1))
        Ft = F_ra(t, -1)
        rvec = r_ra(t, -1)
        uz = uz_ra(t, -1)
        K, kt, Vn, vn = _ric_step(nx, nu, Ct, Ft, rvec, uz, V, v)
        Kk_w(t, jnp.concatenate([K, kt[:, None]], axis=1), -1)
        return (Vn, vn)

    lax.fori_loop(0, T, ric_body, (zero_mat(nx, nx), zero_vec(nx)))
    Kk_fl(-1)

    # ---- pass 2: forward rollout ----
    Kk_rb(0)
    F_rb(0)
    uz_rb(0)

    def roll_body(t, dx):
        Kk = Kk_ra(t, 1)
        uz = uz_ra(t, 1)
        Ft = F_ra(t, 1)
        dtau, dx_next = _roll_step(Kk[:, :nx], Kk[:, nx], uz, Ft, dx)
        dt_w(t, dtau, 1)
        return dx_next

    lax.fori_loop(0, T, roll_body, zero_vec(nx))
    dt_fl(1)

    # ---- pass 3: joint reverse adjoints ----
    C_rb(T - 1)
    F_rb(T - 1)
    r_rb(T - 1)
    b_rb(T - 1)
    dt_rb(T - 1)

    def adj_body(i, carry):
        lam, dlam = carry
        t = T - 1 - i
        Ct = C_ra(t, -1)
        Cx = jnp.stack(
            [jnp.stack([Ct[tri_ix[(a, j)]] for j in range(n)])
             for a in range(nx)])
        Ft = F_ra(t, -1)
        b = b_ra(t, -1)
        rx = r_ra(t, -1)[:nx]
        dtau = dt_ra(t, -1)
        lam_t, dlam_t = _adj_step(nx, Cx, Ft, b, rx, dtau, lam, dlam)
        lam_w(t, lam_t, -1)
        dlam_w(t, dlam_t, -1)
        return (lam_t, dlam_t)

    lax.fori_loop(0, T, adj_body, (zero_vec(nx), zero_vec(nx)))
    lam_fl(-1)
    dlam_fl(-1)


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
    mode=None,
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
    if mode is None:  # tests pin the variant explicitly
        mode = kkt_fused_mode(T, nx, nu, dtype)
    assert mode is not None, "caller must gate on kkt_fused_supported"

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

    # stream mode: grid-major [G, T, *small, 8, 128] HBM refs
    gm = (lambda a: jnp.moveaxis(a, -3, 0)) if mode == "stream" \
        else (lambda a: a)
    invariants = [
        gm(to_lanes(C_tri_p, T, Bp)),
        gm(to_lanes(pad_batch(F_full, B, Bp), T, Bp)),
        gm(to_lanes(pad_batch(uz, B, Bp), T, Bp)),
        gm(to_lanes(pad_batch(lam_b, B, Bp), T, Bp)),
    ]

    ts = (8, 128)
    sds = jax.ShapeDtypeStruct
    if mode == "resident":
        in_specs = [
            bspec(T, (_tri(n),)), bspec(T, (nx, n)), bspec(T, (n,)),
            bspec(T, (nu,)), bspec(T, (nx,)),
        ]
        out_specs = [bspec(T, (n,)), bspec(T, (nx,)), bspec(T, (nx,))]
        out_shape = [
            sds((T, n, G) + ts, dtype),
            sds((T, nx, G) + ts, dtype),
            sds((T, nx, G) + ts, dtype),
        ]
        scratch_shapes = [
            pltpu.VMEM((T, nu, nx) + ts, dtype),
            pltpu.VMEM((T, nu) + ts, dtype),
        ]
        kernel = functools.partial(_kkt_kernel, T, nx, nu)

        def wrapped(C_r, F_r, r_r, uz_r, b_r, dtau_r, lam_r, dlam_r,
                    K_r, k_r):
            kernel(
                LaneView(C_r), LaneView(F_r), LaneView(r_r),
                LaneView(uz_r), LaneView(b_r), LaneView(dtau_r),
                LaneView(lam_r), LaneView(dlam_r), K_r, k_r,
            )
    else:
        anyspec = pl.BlockSpec(memory_space=pl.ANY)
        in_specs = [anyspec] * 5
        out_specs = [anyspec] * 4  # dtau, lam, dlam + Kk working buffer
        out_shape = [
            sds((G, T, n) + ts, dtype),
            sds((G, T, nx) + ts, dtype),
            sds((G, T, nx) + ts, dtype),
            sds((G, T, nu, nx + 1) + ts, dtype),
        ]
        smalls = [(_tri(n),), (nx, n), (n,), (nu,), (nx,),
                  (n,), (nx,), (nx,), (nu, nx + 1)]
        scratch_shapes = [
            pltpu.VMEM((2,) + sm + ts, dtype) for sm in smalls
        ] + [pltpu.SemaphoreType.DMA((2,))] * 9
        wrapped = functools.partial(_kkt_stream_kernel, T, nx, nu)

    def call(g_x, g_u, full=True):
        r = jnp.concatenate([g_x, g_u], axis=-1)
        r_l = gm(to_lanes(pad_batch(r, B, Bp), T, Bp))

        outs = pl.pallas_call(
            wrapped,
            grid=(G,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(invariants[0], invariants[1], r_l, invariants[2], invariants[3])

        if mode == "stream":
            outs = [jnp.moveaxis(o, 0, -3) for o in outs[:3]]
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
