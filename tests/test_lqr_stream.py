"""Parity of the experimental streaming kernels (ops/pallas/lqr_stream.py)
vs the XLA scan path, interpret mode."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from dilqr_tpu.core.solver import solve
from dilqr_tpu.models import pendulum
from dilqr_tpu.ops.pallas.lqr_stream import ilqr_stream, stream_supported
from dilqr_tpu.types import ILQRConfig, QuadCost


def test_stream_matches_xla():
    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    B, T = 3, 8
    rng = np.random.RandomState(0)
    th = rng.uniform(-2, 2, B).astype(np.float32)
    x_init = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)), jnp.zeros(B)], 1
    )
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=5, eps=0.0,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    kw = dict(u_lower=dyn.lower, u_upper=dyn.upper)
    r_x = solve(dataclasses.replace(cfg, backend="xla"), x_init,
                QuadCost(jnp.diag(q), p), dyn, params=params, **kw)
    assert stream_supported(
        cfg, QuadCost(jnp.diag(q), p), dyn, params, None, None,
        jnp.float32, (jnp.diag(q), p), dyn.lower, dyn.upper,
    )
    x, u, costs, du, it = ilqr_stream(
        cfg, dyn, params, x_init, (jnp.diag(q), p), None,
        u_lower=dyn.lower, u_upper=dyn.upper, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(u), np.swapaxes(np.asarray(r_x.u), 0, 1), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(costs), np.asarray(r_x.costs), atol=1e-4
    )
    assert int(it) == int(r_x.n_iter)
