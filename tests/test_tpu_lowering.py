"""Cross-platform TPU lowering of the megakernel WITHOUT TPU hardware.

Interpret-mode tests validate kernel NUMERICS but never run the
Pallas->Mosaic lowering rules, where unsupported ops surface (no
atan/scatter/1-D iota on TPU -- the recurring hazard class; see
CLAUDE.md). ``jax.jit(f).trace(x).lower(lowering_platforms=("tpu",))``
runs those rules on any host and embeds the serialized Mosaic payload,
so a kernel change that breaks TPU lowering fails HERE on the CPU suite
instead of at first on-device dispatch (where backend="auto" has no
fallback for Mosaic errors)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dilqr_tpu.models import pendulum, rocket
from dilqr_tpu.ops.pallas.ilqr_fused import ilqr_fused
from dilqr_tpu.types import ILQRConfig, LinDx

F32 = jnp.float32


def _lower_tpu(f, *args):
    # x64 off: the production TPU configuration is f32 (conftest enables
    # x64 globally for the f64 golden tests, but tracing Pallas kernels
    # under x64 hits a JAX-internal RecursionError in dtype promotion --
    # the genuine weak-f64 leaks the x64 mode used to expose in kernel
    # code are fixed at the source and pinned by this suite's history)
    with jax.enable_x64(False):
        txt = jax.jit(f).trace(*args).lower(
            lowering_platforms=("tpu",)).as_text()
    assert "custom_call" in txt  # the Mosaic kernel made it in
    return txt


def test_lowering_pendulum_widened():
    """W=1 and W=2 (per-subtile stopping machinery: SMEM scalar
    broadcasts, sublane-axis concats) lower for TPU."""
    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    for B, W in ((1024, 1), (2048, 2)):
        rng = np.random.RandomState(0)
        th = rng.uniform(-2, 2, B).astype(np.float32)
        x_init = jnp.stack(
            [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)),
             jnp.zeros(B)], 1).astype(F32)
        cfg = ILQRConfig(
            n_state=3, n_ctrl=1, T=10, lqr_iter=8, eps=1e-3,
            linesearch_decay=dyn.linesearch_decay,
            max_linesearch_iter=dyn.max_linesearch_iter,
            exit_unconverged=False, detach_unconverged=False,
            backprop=False,
        )
        _lower_tpu(
            lambda x: ilqr_fused(
                cfg, dyn, params, x, None, None, None,
                u_lower=float(dyn.lower), u_upper=float(dyn.upper),
                cost_small=(jnp.diag(q), p), lanes_width=W)[1],
            x_init,
        )


def test_lowering_full_stream_rocket_t100():
    """Full-streaming mode (input streams, B_hbm zero-init sweep, DMA
    double-buffering) lowers for TPU at rocket T=100."""
    dyn = rocket.make()
    params = rocket.default_params()
    q, p = rocket.get_true_obj()
    B, T = 512, 100
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(np.concatenate([
        np.array([4.0, 0, 0]) + 0.5 * rng.randn(B, 3),
        0.2 * rng.randn(B, 3),
        np.tile(np.array([1.0, 0, 0, 0]), (B, 1)),
        0.05 * rng.randn(B, 3)], 1), F32)
    cfg = ILQRConfig(
        n_state=13, n_ctrl=3, T=T, lqr_iter=12, eps=0.0,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    _lower_tpu(
        lambda x: ilqr_fused(
            cfg, dyn, params, x, None, None, None,
            u_lower=-20.0, u_upper=20.0,
            cost_small=(jnp.diag(q), p))[1],
        x0,
    )


def test_lowering_boxed_pnqp_widened():
    """nu=2 boxed LinDx at W=2: the per-subtile pnqp Newton/Armijo loops
    (tuple-of-scalars while carries) lower for TPU."""
    B, T, nx, nu = 2048, 5, 3, 2
    n = nx + nu
    rng = np.random.RandomState(7)
    A = rng.randn(T, B, n, n).astype(np.float32)
    Cq = jnp.asarray(
        A @ A.transpose(0, 1, 3, 2) + 3.0 * np.eye(n, dtype=np.float32))
    cq = jnp.asarray(rng.randn(T, B, n).astype(np.float32))
    Fx = np.eye(nx, dtype=np.float32) \
        + 0.05 * rng.randn(T - 1, B, nx, nx).astype(np.float32)
    Fu = 0.3 * rng.randn(T - 1, B, nx, nu).astype(np.float32)
    F = jnp.asarray(np.concatenate([Fx, Fu], -1))
    x0 = jnp.asarray(rng.randn(B, nx).astype(np.float32))
    cfg = ILQRConfig(
        n_state=nx, n_ctrl=nu, T=T, lqr_iter=8, eps=1e-3,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    _lower_tpu(
        lambda x, C, c, Fv: ilqr_fused(
            cfg, LinDx(Fv, None), None, x, C, c, None,
            u_lower=-1.0, u_upper=1.0, lanes_width=2)[1],
        x0, Cq, cq, F,
    )


def test_lowering_riccati_kernel_modes():
    """The standalone Riccati kernel (ops/pallas/riccati_fused.py) lowers
    for TPU in all three gain modes (free, boxed, u_zero_I-masked)."""
    from dilqr_tpu.ops.pallas.riccati_fused import lqr_backward_pallas

    T, B, nx = 6, 1024, 3
    n = nx + 1
    rng = np.random.RandomState(0)
    A = rng.randn(T, B, n, n).astype(np.float32)
    C = jnp.asarray(A @ A.transpose(0, 1, 3, 2)
                    + np.eye(n, dtype=np.float32))
    c = jnp.asarray(rng.randn(T, B, n).astype(np.float32))
    F = jnp.asarray(0.2 * rng.randn(T - 1, B, nx, n).astype(np.float32))
    u = jnp.asarray(0.1 * rng.randn(T, B, 1).astype(np.float32))
    uz = jnp.asarray(rng.rand(T, B, 1) < 0.2)

    for kw in ({}, {"u_lower": -1.0, "u_upper": 1.0}, {"u_zero_I": uz}):
        with jax.enable_x64(False):
            jax.jit(
                lambda C, c, F, u, kw=kw: lqr_backward_pallas(
                    nx, C, c, F, u, **kw)
            ).trace(C, c, F, u).lower(lowering_platforms=("tpu",))
