"""Full-streaming megakernel mode ("full"): every per-timestep array
(trajectory, gains, trial, best) double-buffers through HBM, so VMEM
residency is O(1) in the horizon and ANY T fits -- the reference caps
horizons only by patience (rocket.py:1108 runs T=40; nothing stops
T=100). Parity must be BITWISE vs the all-VMEM kernel: streaming only
relocates storage."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from dilqr_tpu.models import pendulum
from dilqr_tpu.ops.pallas.ilqr_fused import (
    _full_stream_ok, _pick_lanes_width, _vmem_bytes, ilqr_fused,
    use_stream_k, VMEM_SCRATCH_LIMIT,
)
from dilqr_tpu.types import ILQRConfig

F32 = jnp.float32


def _assert_mode_equal(a, b, name=""):
    """Storage modes are the same algorithm; on DEVICE (Mosaic) they are
    bitwise-equal -- verified on-chip for none/k/full with the analytic
    jac_lanes linearization, and asserted every round by
    scripts/tpu_smoke.py. In INTERPRET mode the kernel lowers to XLA:CPU,
    whose fusion boundaries differ per program variant and may contract
    an FMA in one mode but not another, so equality here is to a few ulp
    (observed: 1 element in 18k at 1 ulp once models/ship hand-derived
    jac_lanes expressions). Tolerance 5e-7 relative still catches any
    real streaming bug (a wrong DMA index is catastrophically larger)."""
    np.testing.assert_allclose(a, b, rtol=5e-7, atol=5e-7, err_msg=name)


def _problem(B, T, lqr_iter=3):
    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    rng = np.random.RandomState(0)
    th = rng.uniform(-2, 2, B).astype(np.float32)
    x_init = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)), jnp.zeros(B)], 1
    )
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=lqr_iter, eps=0.0,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    return cfg, dyn, params, x_init, (jnp.diag(q), p)


@pytest.mark.parametrize("warm", [False, True])
@pytest.mark.parametrize("T", [1, 6])
def test_full_stream_bitwise(T, warm):
    B = 1024
    cfg, dyn, params, x_init, cost_small = _problem(B, T)
    rng = np.random.RandomState(1)
    u0 = (jnp.asarray(0.1 * rng.randn(T, B, 1).astype(np.float32))
          if warm else None)
    outs = {}
    for mode in ("none", "full"):
        x, u, costs, du, it = ilqr_fused(
            cfg, dyn, params, x_init, None, None, u0,
            u_lower=dyn.lower, u_upper=dyn.upper, cost_small=cost_small,
            interpret=True, force_stream_k=mode,
        )
        outs[mode] = tuple(np.asarray(a) for a in (x, u, costs, du))
    for a, b, name in zip(outs["none"], outs["full"],
                          ("x", "u", "costs", "du")):
        _assert_mode_equal(a, b, f"{name} (warm={warm})")


def test_full_stream_vs_stream_k_bitwise():
    """The three storage strategies are the same algorithm: K-streaming
    and full-streaming agree bitwise."""
    B, T = 1024, 7
    cfg, dyn, params, x_init, cost_small = _problem(B, T)
    outs = {}
    for mode in ("k", "full"):
        x, u, costs, du, it = ilqr_fused(
            cfg, dyn, params, x_init, None, None, None,
            u_lower=dyn.lower, u_upper=dyn.upper, cost_small=cost_small,
            interpret=True, force_stream_k=mode,
        )
        outs[mode] = tuple(np.asarray(a) for a in (x, u, costs, du))
    for a, b in zip(outs["k"], outs["full"]):
        _assert_mode_equal(a, b)


def test_long_horizon_routes_full():
    """rocket-sized T=100 problems bust even stream-K's VMEM budget and
    must route to full streaming (previously: XLA fallback, ~20x slower)."""
    cfg = ILQRConfig(n_state=13, n_ctrl=3, T=100)
    extras = dict(lin_dx=False, lanes_cost=False, uz=False, warm=True,
                  dyn_bounds=False)
    assert _vmem_bytes(cfg, stream_k=True, **extras) > VMEM_SCRATCH_LIMIT
    assert _full_stream_ok(extras)
    w, mode = _pick_lanes_width(cfg, extras, 1)
    assert mode == "full"
    assert _vmem_bytes(cfg, full_stream=True, bt=1024 * w,
                       **extras) <= VMEM_SCRATCH_LIMIT
    # T=400: still fits (O(1) residency in T)
    _, mode = _pick_lanes_width(
        dataclasses.replace(cfg, T=400), extras, 1)
    assert mode == "full"
    # round 3 extension: whole-T lane INPUTS stream too -- every
    # kernel-supported feature set is admissible at any horizon
    for k in ("lin_dx", "lanes_cost", "uz", "dyn_bounds"):
        ex = {**extras, k: True}
        assert _full_stream_ok(ex)
        _, mode = _pick_lanes_width(
            dataclasses.replace(cfg, T=200), ex, 1)
        assert mode == "full", k


def test_full_stream_input_streams_bitwise():
    """The formerly-excluded whole-T lane inputs -- u_zero_I, dynamic
    (traced) bounds, per-example lane cost -- each stream bitwise-equal
    to the all-VMEM kernel."""
    B, T = 1024, 6
    cfg, dyn, params, x_init, cost_small = _problem(B, T)
    rng = np.random.RandomState(2)
    q, p = pendulum.get_true_obj()
    n = 4

    # per-example lane cost
    scale = jnp.asarray(
        1.0 + 0.5 * rng.rand(T, B, 1, 1).astype(np.float32))
    C = jnp.broadcast_to(jnp.diag(q), (T, B, n, n)) * scale
    c = jnp.broadcast_to(p, (T, B, n)) * scale[..., 0]
    # per-example bounds (forces the dynamic-bounds lane path)
    lb = jnp.asarray(-2.0 - rng.rand(T, B, 1).astype(np.float32))
    ub = jnp.asarray(2.0 + rng.rand(T, B, 1).astype(np.float32))
    uz = jnp.asarray(rng.rand(T, B, 1) < 0.2)

    cases = {
        "lanes_cost": dict(C=C, c=c, u_lower=dyn.lower, u_upper=dyn.upper),
        "dyn_bounds": dict(cost_small=cost_small, u_lower=lb, u_upper=ub),
        "uz": dict(cost_small=cost_small, u_lower=dyn.lower,
                   u_upper=dyn.upper, u_zero_I=uz),
    }
    for name, kw in cases.items():
        outs = {}
        for mode in ("none", "full"):
            x, u, costs, du, it = ilqr_fused(
                cfg, dyn, params, x_init,
                kw.get("C"), kw.get("c"), None,
                u_lower=kw.get("u_lower"), u_upper=kw.get("u_upper"),
                u_zero_I=kw.get("u_zero_I"),
                cost_small=kw.get("cost_small"),
                interpret=True, force_stream_k=mode,
            )
            outs[mode] = tuple(np.asarray(a) for a in (x, u, costs, du))
        for a, b, fld in zip(outs["none"], outs["full"],
                             ("x", "u", "costs", "du")):
            # input-stream reads compile to structurally different (but
            # mathematically identical) programs; interpret mode's XLA
            # CPU backend may reassociate fma -> 1-ulp differences
            np.testing.assert_allclose(
                a, b, rtol=1e-5, atol=1e-5, err_msg=f"{name}/{fld}")


def test_full_stream_lindx_bitwise():
    """LinDx (time-varying affine) F/f stream bitwise-equal too."""
    B, T, nx, nu = 1024, 6, 3, 1
    n = nx + nu
    rng = np.random.RandomState(4)
    from dilqr_tpu.types import LinDx

    A = rng.randn(T, B, n, n).astype(np.float32)
    Cq = jnp.asarray(
        A @ A.transpose(0, 1, 3, 2) + 3.0 * np.eye(n, dtype=np.float32))
    cq = jnp.asarray(rng.randn(T, B, n).astype(np.float32))
    Fx = np.eye(nx, dtype=np.float32) \
        + 0.05 * rng.randn(T - 1, B, nx, nx).astype(np.float32)
    Fu = 0.3 * rng.randn(T - 1, B, nx, nu).astype(np.float32)
    F = jnp.asarray(np.concatenate([Fx, Fu], -1))
    f = jnp.asarray(0.1 * rng.randn(T - 1, B, nx).astype(np.float32))
    x0 = jnp.asarray(rng.randn(B, nx).astype(np.float32))
    cfg = ILQRConfig(
        n_state=nx, n_ctrl=nu, T=T, lqr_iter=3, eps=0.0,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    outs = {}
    for mode in ("none", "full"):
        x, u, costs, du, it = ilqr_fused(
            cfg, LinDx(F, f), None, x0, Cq, cq, None,
            u_lower=-1.0, u_upper=1.0,
            interpret=True, force_stream_k=mode,
        )
        outs[mode] = tuple(np.asarray(a) for a in (x, u, costs, du))
    for a, b in zip(outs["none"], outs["full"]):
        # same 1-ulp caveat as the input-streams test above
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_full_stream_widened_bitwise():
    """Lane widening composes with full streaming: W=2 full-stream
    bitwise-equal to W=1 full-stream (same examples, wider tiles).
    Slow lane: each feature is bitwise-tested separately by default."""
    B, T = 2048, 5
    cfg, dyn, params, x_init, cost_small = _problem(B, T)
    outs = {}
    for w in (1, 2):
        x, u, costs, du, it = ilqr_fused(
            cfg, dyn, params, x_init, None, None, None,
            u_lower=dyn.lower, u_upper=dyn.upper, cost_small=cost_small,
            interpret=True, force_stream_k="full", lanes_width=w,
        )
        outs[w] = tuple(np.asarray(a) for a in (x, u, costs, du))
    for a, b in zip(outs[1], outs[2]):
        np.testing.assert_array_equal(a, b)


def test_full_stream_nan_lane_returns_zeros():
    """A lane whose trial cost is NaN never passes the accept test
    (NaN <= inf is false), so its best trajectory must stay the
    zero-initialized default in EVERY storage mode -- full streaming
    included, where the best buffer lives in HBM and an uninitialized
    read-modify-write would otherwise return garbage for that lane."""
    B, T = 1024, 6
    cfg, dyn, params, x_init, cost_small = _problem(B, T)
    # poison one example: NaN x_init propagates to every rollout cost
    x_init = x_init.at[7].set(jnp.nan)
    outs = {}
    for mode in ("none", "full"):
        x, u, costs, du, it = ilqr_fused(
            cfg, dyn, params, x_init, None, None, None,
            u_lower=dyn.lower, u_upper=dyn.upper, cost_small=cost_small,
            interpret=True, force_stream_k=mode,
        )
        outs[mode] = tuple(np.asarray(a) for a in (x, u, costs, du))
    assert np.all(outs["full"][0][:, 7] == 0.0), "poisoned lane best x"
    assert np.all(outs["full"][1][:, 7] == 0.0), "poisoned lane best u"
    assert np.isinf(outs["full"][2][7]), "poisoned lane cost stays inf"
    for a, b, name in zip(outs["none"], outs["full"],
                          ("x", "u", "costs", "du")):
        _assert_mode_equal(a, b, name)
