"""Mixed-convergence stopping-rule evidence for the fused megakernel.

The kernel's stopping rule runs its reductions (``max(du) < eps``,
``any(improved)``, line-search ``any(worsened)``) per 1024-example tile
instead of over the global batch like the XLA path (reference
mpc.py:299-301 breaks on the global ``max(full_du_norm) < eps``). The
kernel docstring argues the results still match: extra line-search trials
are idempotent per example, and extra outer iterations past per-tile
convergence only move the best-tracked iterate below the eps threshold.

This test turns that argument into evidence: two tiles engineered to
converge 8 outer iterations apart (near-upright pendulum starts vs hard
swing-ups), eps > 0, compared per-example against the global-rule XLA
path. Runs in interpret mode on CPU (grid cells are independent, so the
per-tile iteration counts are observable by solving each half alone).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dilqr_tpu.core.solver import solve
from dilqr_tpu.models import pendulum
from dilqr_tpu.types import ILQRConfig, QuadCost

BT = 1024  # kernel batch-tile size (ops/pallas/layout.BT)


def _problem():
    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    rng = np.random.RandomState(0)
    # tile 0: near the upright goal (converges in ~2 outer iterations);
    # tile 1: hard swing-ups from near-hanging (runs to the lqr_iter cap)
    th = np.concatenate([
        rng.uniform(-0.05, 0.05, BT),
        rng.uniform(np.pi - 0.7, np.pi + 0.7, BT),
    ]).astype(np.float32)
    tj = jnp.asarray(th)
    x_init = jnp.stack([jnp.cos(tj), jnp.sin(tj), jnp.zeros(2 * BT)], 1)
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=5, lqr_iter=10, eps=1e-3,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    cost = QuadCost(jnp.diag(q), p)
    kw = dict(u_lower=dyn.lower, u_upper=dyn.upper)
    return cfg, x_init, cost, dyn, params, kw


def test_fused_per_tile_stopping_matches_global_rule():
    cfg, x_init, cost, dyn, params, kw = _problem()
    pal = dataclasses.replace(cfg, backend="pallas")
    xla = dataclasses.replace(cfg, backend="xla")

    # --- establish the scenario is real: the tiles stop at different
    # outer iterations under the per-tile rule, while the global rule
    # keeps every example running with the slowest one ---
    r_easy = solve(pal, x_init[:BT], cost, dyn, params=params, **kw)
    r_hard = solve(pal, x_init[BT:], cost, dyn, params=params, **kw)
    it_easy, it_hard = int(r_easy.n_iter), int(r_hard.n_iter)
    assert it_easy + 3 <= it_hard, (it_easy, it_hard)

    r_x = solve(xla, x_init, cost, dyn, params=params, **kw)
    r_p = solve(pal, x_init, cost, dyn, params=params, **kw)
    assert int(r_x.n_iter) == it_hard  # global rule ran the slow tile's count

    # --- per-example accepted cost matches the global rule to f32 noise,
    # 3+ orders below any eps-driven divergence ---
    cx = np.asarray(r_x.costs, np.float64)
    cp = np.asarray(r_p.costs, np.float64)
    np.testing.assert_allclose(cp, cx, rtol=1e-5, atol=1e-4)
    # and the early-stopped tile is never meaningfully worse than the
    # extra iterations the global rule paid for
    assert float((cp[:BT] - cx[:BT]).max()) <= 1e-4

    # --- u-parity on the tile whose iteration count matches the global
    # rule exactly (u is batch-major [B, T, nu]) ---
    u_x = np.asarray(r_x.u, np.float64)
    u_p = np.asarray(r_p.u, np.float64)
    np.testing.assert_allclose(u_p[BT:], u_x[BT:], atol=2e-3)

    # --- the early tile stopped *converged*: its last alpha=1 step was
    # below eps by the solver's own standard ---
    du_p = np.asarray(r_p.full_du_norm)
    assert float(du_p[:BT].max()) < cfg.eps

    # grid cells are independent: the mixed-batch fused result equals the
    # per-half fused results (to an ulp -- grid-shape-dependent codegen)
    np.testing.assert_allclose(
        np.asarray(r_p.u[:BT]), np.asarray(r_easy.u), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_p.u[BT:]), np.asarray(r_hard.u), atol=1e-5
    )
