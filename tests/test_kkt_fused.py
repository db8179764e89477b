"""Parity of the fused KKT-VJP kernel (ops/pallas/kkt_fused.py) against
the pure-XLA scan path of diff/kkt.kkt_vjp, in interpret mode on CPU.

The kernel IS the backward pass: one invocation = auxiliary Riccati +
auxiliary rollout + both adjoint recursions + dC/dc/dF/df/dx_init
assembly (reference lqr_step.py:311-407). Parity here is against our own
XLA path, whose f64 goldens against the torch reference live in
test_grad_modes.py -- so agreement transfers.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dilqr_tpu.diff.kkt import kkt_vjp, make_kkt_vjp
from dilqr_tpu.ops.pallas.kkt_fused import kkt_fused_supported

F32 = jnp.float32


def _problem(seed, T, B, nx, nu):
    n = nx + nu
    rng = np.random.RandomState(seed)
    A = rng.randn(T, B, n, n).astype(np.float32)
    C = jnp.asarray(
        A @ A.transpose(0, 1, 3, 2) + 2.0 * np.eye(n, dtype=np.float32))
    c = jnp.asarray(rng.randn(T, B, n).astype(np.float32))
    F = jnp.asarray(0.3 * rng.randn(T - 1, B, nx, n).astype(np.float32))
    x = jnp.asarray(rng.randn(T, B, nx).astype(np.float32))
    u = jnp.asarray(0.5 * rng.randn(T, B, nu).astype(np.float32))
    g_x = jnp.asarray(rng.randn(T, B, nx).astype(np.float32))
    g_u = jnp.asarray(rng.randn(T, B, nu).astype(np.float32))
    return C, c, F, x, u, g_x, g_u


def _compare(kg_p, kg_x, atol):
    for name in ("dx_init", "dC", "dc", "dF", "df"):
        a, b = getattr(kg_p, name), getattr(kg_x, name)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol,
            err_msg=f"field {name}")


@pytest.mark.parametrize("nu", [1, 2, 3])
@pytest.mark.parametrize("masked", [False, True])
def test_kkt_fused_matches_xla(nu, masked):
    T, B, nx = 6, 5, 4
    C, c, F, x, u, g_x, g_u = _problem(0, T, B, nx, nu)
    uz = None
    if masked:
        rng = np.random.RandomState(1)
        uz = jnp.asarray(rng.rand(T, B, nu) < 0.3)
    assert kkt_fused_supported(T, nx, nu, C.dtype, True)
    kg_x = kkt_vjp(nx, nu, C, c, F, x, u, g_x, g_u, u_zero_I=uz,
                   backend="xla")
    kg_p = kkt_vjp(nx, nu, C, c, F, x, u, g_x, g_u, u_zero_I=uz,
                   backend="pallas")
    # f32 elementwise chains in a different association order than the
    # XLA bmm reductions; T=6 recursions keep the drift ~1e-5
    _compare(kg_p, kg_x, atol=5e-5)


def test_kkt_fused_ff_mode_skips_dC():
    T, B, nx, nu = 5, 3, 3, 1
    C, c, F, x, u, g_x, g_u = _problem(2, T, B, nx, nu)
    fn = make_kkt_vjp(nx, nu, C, c, F, x, u, backend="pallas")
    kg_ff = fn(g_x, g_u, wants="Ff")
    kg_full = fn(g_x, g_u)
    assert kg_ff.dC is None and kg_ff.dc is None and kg_ff.dx_init is None
    np.testing.assert_allclose(
        np.asarray(kg_ff.dF), np.asarray(kg_full.dF), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(kg_ff.df), np.asarray(kg_full.df), atol=1e-6)
    # the XLA Ff mode mirrors the skip
    fn_x = make_kkt_vjp(nx, nu, C, c, F, x, u, backend="xla")
    kg_xff = fn_x(g_x, g_u, wants="Ff")
    assert kg_xff.dC is None and kg_xff.dc is None
    np.testing.assert_allclose(
        np.asarray(kg_xff.dF), np.asarray(kg_full.dF), atol=5e-5)


def test_kkt_fused_linear_in_cotangent():
    """The IFT mode requires the operator be linear in (g_x, g_u)."""
    T, B, nx, nu = 4, 2, 3, 1
    C, c, F, x, u, g_x, g_u = _problem(3, T, B, nx, nu)
    fn = make_kkt_vjp(nx, nu, C, c, F, x, u, backend="pallas")
    kg1 = fn(g_x, g_u, wants="Ff")
    kg2 = fn(2.0 * g_x, 2.0 * g_u, wants="Ff")
    np.testing.assert_allclose(
        np.asarray(kg2.dF), 2.0 * np.asarray(kg1.dF), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(kg2.df), 2.0 * np.asarray(kg1.df), atol=1e-5)


def test_vmem_gate_modes():
    from dilqr_tpu.ops.pallas.kkt_fused import kkt_fused_mode

    # rocket-sized problems exceed the VMEM-resident budget and take
    # the O(1)-in-T streamed kernel instead of the XLA scans
    assert kkt_fused_mode(40, 13, 3, F32) == "stream"
    assert kkt_fused_mode(20, 13, 3, F32) == "stream"
    # cartpole headline stays fully VMEM-resident
    assert kkt_fused_mode(20, 5, 1, F32) == "resident"
    # f64 and nu > 3 never fuse
    assert kkt_fused_mode(6, 3, 1, jnp.float64) is None
    assert kkt_fused_mode(6, 3, 4, F32) is None


@pytest.mark.parametrize("mode", ["IFT", "KKT"])
def test_end_to_end_grad_pallas_matches_xla(mode):
    """IFT/KKT gradients of a pendulum solve with the fused KKT backward
    (backend='pallas', interpret) vs the XLA backward."""
    from dilqr_tpu import BackwardMode, ILQRConfig, QuadCost
    from dilqr_tpu.core.solver import solve
    from dilqr_tpu.models import pendulum

    dyn = pendulum.make()
    params = pendulum.default_params().astype(F32)
    q, p = pendulum.get_true_obj()
    q, p = q.astype(F32), p.astype(F32)
    B, T = 3, 8
    th = jnp.asarray(np.linspace(-1.2, 1.2, B), F32)
    x_init = jnp.stack([jnp.cos(th), jnp.sin(th), jnp.zeros(B, F32)], 1)

    def loss(params, backend):
        cfg = ILQRConfig(
            n_state=3, n_ctrl=1, T=T, lqr_iter=8, eps=1e-4,
            linesearch_decay=dyn.linesearch_decay,
            max_linesearch_iter=dyn.max_linesearch_iter,
            exit_unconverged=False, detach_unconverged=False,
            backward_mode=BackwardMode[mode], backend=backend,
        )
        res = solve(cfg, x_init, QuadCost(jnp.diag(q), p), dyn,
                    params=params, u_lower=-2.0, u_upper=2.0)
        return jnp.mean(res.u ** 2)

    g_x = jax.grad(loss)(params, "xla")
    g_p = jax.grad(loss)(params, "pallas")
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("nu", [1, 3])
def test_kkt_stream_matches_xla_and_resident(nu):
    """The O(1)-VMEM streamed kernel (rocket-sized problems) vs the XLA
    path AND the resident kernel -- the per-step math is shared, so
    stream-vs-resident should agree to the DMA-roundtrip (exact)."""
    from dilqr_tpu.ops.pallas.kkt_fused import make_kkt_vjp_pallas

    T, B, nx = 7, 5, 4
    C, c, F, x, u, g_x, g_u = _problem(4, T, B, nx, nu)
    kg_x = kkt_vjp(nx, nu, C, c, F, x, u, g_x, g_u, backend="xla")
    outs = {}
    for mode in ("resident", "stream"):
        call = make_kkt_vjp_pallas(nx, nu, C, c, F, x, u,
                                   interpret=True, mode=mode)
        dxi, dC, dc, dF, df = call(g_x, g_u, True)
        outs[mode] = dict(dx_init=dxi, dC=dC, dc=dc, dF=dF, df=df)
    for name in ("dx_init", "dC", "dc", "dF", "df"):
        np.testing.assert_allclose(
            np.asarray(outs["stream"][name]), np.asarray(outs[
                "resident"][name]), atol=0.0,
            err_msg=f"stream vs resident {name}")
        np.testing.assert_allclose(
            np.asarray(outs["stream"][name]),
            np.asarray(getattr(kg_x, name)), atol=5e-5,
            err_msg=f"stream vs xla {name}")


def test_kkt_stream_rocket_shape():
    """A genuinely stream-routed shape (nx=13, nu=3: the rocket), via the
    public dispatch (make_kkt_vjp picks the kernel)."""
    from dilqr_tpu.diff.kkt import make_kkt_vjp
    from dilqr_tpu.ops.pallas.kkt_fused import kkt_fused_mode

    T, B, nx, nu = 6, 3, 13, 3
    assert kkt_fused_mode(T, nx, nu, F32) == "stream"
    C, c, F, x, u, g_x, g_u = _problem(5, T, B, nx, nu)
    kg_x = make_kkt_vjp(nx, nu, C, c, F, x, u, backend="xla")(g_x, g_u)
    kg_p = make_kkt_vjp(nx, nu, C, c, F, x, u, backend="pallas")(g_x, g_u)
    _compare(kg_p, kg_x, atol=2e-4)  # n=16 recursions, f32
