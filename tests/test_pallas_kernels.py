"""Parity of the fused Pallas Riccati kernel (ops/pallas/riccati_fused.py)
against the pure-XLA lax.scan path, run in interpret mode on CPU. On-device
(TPU) agreement was additionally measured at <= 4e-7 max err on the
flagship shapes (T=20, B=4096, cartpole)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dilqr_tpu.ops.riccati import lqr_backward

F32 = jnp.float32


def _problem(seed, T, B, nx):
    n = nx + 1
    rng = np.random.RandomState(seed)
    A = rng.randn(T, B, n, n).astype(np.float32)
    C = jnp.asarray(A @ A.transpose(0, 1, 3, 2) + 2.0 * np.eye(n, dtype=np.float32))
    c = jnp.asarray(rng.randn(T, B, n).astype(np.float32))
    F = jnp.asarray(0.3 * rng.randn(T - 1, B, nx, n).astype(np.float32))
    u = jnp.asarray(0.5 * rng.randn(T, B, 1).astype(np.float32))
    return C, c, F, u


@pytest.mark.parametrize("boxed", [False, True])
@pytest.mark.parametrize("shape", [(6, 5, 4), (3, 2, 5)])
def test_pallas_riccati_matches_xla(boxed, shape):
    T, B, nx = shape
    C, c, F, u = _problem(0, T, B, nx)
    kw = dict(u_lower=-1.0, u_upper=1.0) if boxed else {}
    ref = lqr_backward(nx, 1, C, c, F, None, u, backend="xla", **kw)
    pal = lqr_backward(nx, 1, C, c, F, None, u, backend="pallas", **kw)
    np.testing.assert_allclose(np.asarray(pal.K), np.asarray(ref.K), atol=2e-6)
    np.testing.assert_allclose(np.asarray(pal.k), np.asarray(ref.k), atol=2e-6)


def test_pallas_riccati_delta_u():
    T, B, nx = 5, 3, 4
    C, c, F, u = _problem(1, T, B, nx)
    kw = dict(u_lower=-1.0, u_upper=1.0, delta_u=0.3)
    ref = lqr_backward(nx, 1, C, c, F, None, u, backend="xla", **kw)
    pal = lqr_backward(nx, 1, C, c, F, None, u, backend="pallas", **kw)
    np.testing.assert_allclose(np.asarray(pal.K), np.asarray(ref.K), atol=2e-6)
    np.testing.assert_allclose(np.asarray(pal.k), np.asarray(ref.k), atol=2e-6)
