"""NNDynamics (MLP, reference dynamics.py:15-130) through the fused
whole-solve kernel: pytree params flatten into the SMEM scalar vector
(ops/pallas/ilqr_fused._flatten_pytree_params) and the hidden_sizes-
authored step consumes the scalar list index-style on lane stacks
(models/nn_dynamics.py step_scalars)."""
import dataclasses
import importlib
import sys

import numpy as np
import jax
import jax.numpy as jnp

from dilqr_tpu.core.solver import solve
from dilqr_tpu.models import nn_dynamics
from dilqr_tpu.types import BackwardMode, ILQRConfig, QuadCost

importlib.import_module("dilqr_tpu.ops.pallas.ilqr_fused")
fmod = sys.modules["dilqr_tpu.ops.pallas.ilqr_fused"]

NX, NU = 3, 1
N = NX + NU


def _setup(hidden=(8,), activation="sigmoid"):
    dyn = nn_dynamics.make(NX, NU, activation=activation, passthrough=True,
                           hidden_sizes=hidden)
    params = nn_dynamics.init_params(jax.random.PRNGKey(0), NX, NU, hidden)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), params)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(0.3 * rng.randn(6, NX), jnp.float32)
    q = jnp.ones(N, jnp.float32)
    p = jnp.zeros(N, jnp.float32)
    cfg = ILQRConfig(
        n_state=NX, n_ctrl=NU, T=7, lqr_iter=4, eps=0.0,
        exit_unconverged=False, detach_unconverged=False,
        backprop=False, backend="pallas",
    )
    return dyn, params, x0, QuadCost(jnp.diag(q), p), cfg


def test_mlp_routes_fused_with_parity():
    dyn, params, x0, cost, cfg = _setup()
    fmod.DISPATCH_STATS.update(fused=0, vmap_merged=0, vmap_mapped=0)
    r_f = solve(cfg, x0, cost, dyn, params=params, u_lower=-1.0, u_upper=1.0)
    assert fmod.DISPATCH_STATS["fused"] == 1, (
        "MLP dynamics did not take the fused path")
    r_x = solve(dataclasses.replace(cfg, backend="xla"), x0, cost, dyn,
                params=params, u_lower=-1.0, u_upper=1.0)
    np.testing.assert_allclose(
        np.asarray(r_f.u), np.asarray(r_x.u), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(r_f.costs), np.asarray(r_x.costs), rtol=2e-5, atol=1e-6)


def test_mlp_relu_two_layers():
    dyn, params, x0, cost, cfg = _setup(hidden=(6, 6), activation="relu")
    fmod.DISPATCH_STATS.update(fused=0, vmap_merged=0, vmap_mapped=0)
    r_f = solve(cfg, x0, cost, dyn, params=params, u_lower=-1.0, u_upper=1.0)
    assert fmod.DISPATCH_STATS["fused"] == 1
    r_x = solve(dataclasses.replace(cfg, backend="xla"), x0, cost, dyn,
                params=params, u_lower=-1.0, u_upper=1.0)
    np.testing.assert_allclose(
        np.asarray(r_f.costs), np.asarray(r_x.costs), rtol=2e-5, atol=1e-6)


def test_mlp_ift_grad_through_fused_forward():
    """Fused forward + IFT backward: the params cotangent flows through
    the XLA KKT chain with the ORIGINAL pytree params; parity vs the
    all-XLA solve+grad."""
    dyn, params, x0, cost, cfg = _setup()
    cfg = dataclasses.replace(cfg, backprop=True, eps=1e-4, lqr_iter=8,
                              backward_mode=BackwardMode.IFT)

    def loss(cfg_, pp):
        r = solve(cfg_, x0, cost, dyn, params=pp,
                  u_lower=-1.0, u_upper=1.0)
        return jnp.mean(r.u ** 2)

    g_f = jax.grad(lambda pp: loss(cfg, pp))(params)
    g_x = jax.grad(lambda pp: loss(
        dataclasses.replace(cfg, backend="xla"), pp))(params)
    fa = jnp.concatenate(
        [l.ravel() for l in jax.tree_util.tree_leaves(g_f)])
    xa = jnp.concatenate(
        [l.ravel() for l in jax.tree_util.tree_leaves(g_x)])
    assert jnp.isfinite(fa).all()
    np.testing.assert_allclose(np.asarray(fa), np.asarray(xa), atol=5e-3)


def test_large_mlp_stays_on_xla():
    """hidden=100 exceeds MAX_PYTREE_PARAMS: keep the XLA path (program
    text of the unrolled lane MLP would scale with P)."""
    dyn, params, x0, cost, cfg = _setup(hidden=(100,))
    fmod.DISPATCH_STATS.update(fused=0, vmap_merged=0, vmap_mapped=0)
    r = solve(cfg, x0, cost, dyn, params=params, u_lower=-1.0, u_upper=1.0)
    assert fmod.DISPATCH_STATS["fused"] == 0
    assert np.isfinite(np.asarray(r.costs)).all()
