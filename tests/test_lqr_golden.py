"""Solver-level golden tests vs the PyTorch reference: exact LQR problems
with LinDx dynamics (forward values + module-KKT gradients)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dilqr_tpu
from dilqr_tpu import BackwardMode, ILQRConfig, LinDx, QuadCost


def _cfg(nx, nu, T, **kw):
    base = dict(
        n_state=nx,
        n_ctrl=nu,
        T=T,
        lqr_iter=10,
        eps=1e-7,
        detach_unconverged=False,
        exit_unconverged=False,
        backward_mode=BackwardMode.KKT,
    )
    base.update(kw)
    return ILQRConfig(**base)


def _bm(a):
    """time-major golden [T, B, ...] -> batch-major [B, T, ...]"""
    return jnp.swapaxes(jnp.asarray(a, jnp.float32), 0, 1)


@pytest.mark.parametrize("tag,bound", [("unc", None), ("box", 0.5)])
def test_lindx_forward_golden(golden, tag, bound):
    g = golden(f"lqr_lindx_{tag}")
    T, B, nx = g["F"].shape[0] + 1, g["F"].shape[1], g["F"].shape[2]
    nu = g["F"].shape[3] - nx
    cfg = _cfg(nx, nu, T)
    res = dilqr_tpu.solve(
        cfg,
        jnp.asarray(g["x_init"], jnp.float32),
        QuadCost(_bm(g["C"]), _bm(g["c"])),
        LinDx(_bm(g["F"]), _bm(g["f"])),
        u_lower=None if bound is None else -bound,
        u_upper=None if bound is None else bound,
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(res.u), 0, 1), g["u"], atol=1e-4
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(res.x), 0, 1), g["x"], atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(res.costs), g["objs"], rtol=1e-4)


def test_lindx_kkt_grad_full(golden):
    """End-to-end gradient parity on the LinDx problem: compare
    d loss / d (x_init, C, c, F, f) against the reference."""
    for tag, bound in [("unc", None), ("box", 0.5)]:
        g = golden(f"lqr_grad_{tag}")
        p = golden(f"lqr_grad_problem_{tag}")
        T, B, nx = g["x"].shape
        nu = g["u"].shape[2]
        cfg = _cfg(nx, nu, T)
        gx = _bm(g["gx"])
        gu = _bm(g["gu"])

        def loss(x_init, C, c, F, f):
            res = dilqr_tpu.solve(
                cfg,
                x_init,
                QuadCost(C, c),
                LinDx(F, f),
                u_lower=None if bound is None else -bound,
                u_upper=None if bound is None else bound,
            )
            return jnp.sum(res.x * gx) + jnp.sum(res.u * gu)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            jnp.asarray(p["x_init"], jnp.float32),
            _bm(p["C"]),
            _bm(p["c"]),
            _bm(p["F"]),
            _bm(p["f"]),
        )
        names = ["dx_init", "dC", "dc", "dF", "df"]
        for got, name in zip(grads, names):
            want = g[name]
            if name != "dx_init":
                got = jnp.swapaxes(got, 0, 1)
            np.testing.assert_allclose(
                np.asarray(got),
                want,
                atol=2e-3,
                rtol=2e-3,
                err_msg=f"{tag}:{name}",
            )
