"""pnqp box-QP vs reference goldens (reference pnqp.py:5-82) and
first-principles optimality checks."""
import jax.numpy as jnp
import numpy as np

from dilqr_tpu.ops.pnqp import pnqp


def _np(a):
    return np.asarray(a)


def test_pnqp_golden_cold(golden):
    g = golden("pnqp")
    res = pnqp(
        jnp.asarray(g["H"], jnp.float32),
        jnp.asarray(g["q"], jnp.float32),
        jnp.asarray(g["lower"], jnp.float32),
        jnp.asarray(g["upper"], jnp.float32),
        n_iter=20,
    )
    np.testing.assert_allclose(_np(res.x), g["x"], atol=2e-5)
    np.testing.assert_allclose(_np(res.If), g["If"], atol=0)


def test_pnqp_golden_warm(golden):
    g = golden("pnqp")
    gw = golden("pnqp_warm")
    res = pnqp(
        jnp.asarray(g["H"], jnp.float32),
        jnp.asarray(g["q"], jnp.float32),
        jnp.asarray(g["lower"], jnp.float32),
        jnp.asarray(g["upper"], jnp.float32),
        x_init=jnp.asarray(gw["x_init"], jnp.float32),
        n_iter=20,
    )
    np.testing.assert_allclose(_np(res.x), gw["x"], atol=2e-5)
    np.testing.assert_allclose(_np(res.If), gw["If"], atol=0)


def test_pnqp_golden_scalar(golden):
    g = golden("pnqp_n1")
    res = pnqp(
        jnp.asarray(g["H"], jnp.float32),
        jnp.asarray(g["q"], jnp.float32),
        jnp.asarray(g["lower"], jnp.float32),
        jnp.asarray(g["upper"], jnp.float32),
        n_iter=20,
    )
    np.testing.assert_allclose(_np(res.x), g["x"], atol=2e-5)


def test_pnqp_kkt_optimality():
    """Solutions satisfy the box-QP KKT conditions: free coords have ~zero
    gradient; bound coords have inward-pointing gradient. The reference
    algorithm's batch-coupled Armijo exit (pnqp.py:65-75) can stall on rare
    examples (the reference prints its non-convergence warning on this very
    input); we replicate that behavior exactly (see golden tests), so allow
    a small number of stalled examples here."""
    rng = np.random.RandomState(0)
    B, n = 32, 4
    A = rng.randn(B, n, n).astype(np.float32)
    H = A @ A.transpose(0, 2, 1) + 0.2 * np.eye(n, dtype=np.float32)
    q = rng.randn(B, n).astype(np.float32)
    lo, hi = -0.3, 0.3
    res = pnqp(jnp.asarray(H), jnp.asarray(q), lo, hi, n_iter=40)
    x = _np(res.x)
    g = np.einsum("bij,bj->bi", H, x) + q
    at_lo = np.abs(x - lo) < 1e-6
    at_hi = np.abs(x - hi) < 1e-6
    free = ~(at_lo | at_hi)
    viol = np.zeros(B, dtype=bool)
    for b in range(B):
        viol[b] = (
            (np.abs(g[b][free[b]]) > 1e-3).any()
            or (g[b][at_lo[b]] < -1e-3).any()
            or (g[b][at_hi[b]] > 1e-3).any()
        )
    assert viol.sum() <= 2, f"{viol.sum()} examples violate KKT"
