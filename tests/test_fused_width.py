"""Lane-widening (W > 1) parity: the megakernel may widen its [8, 128]
base tile to [8, 128*W] to give the Mosaic scheduler W independent vregs
per op (ILP across batch tiles; see layout.py). Widening only regroups
the same examples into wider tiles -- every result must be BITWISE equal
to the W=1 kernel."""
import numpy as np
import jax.numpy as jnp
import pytest

from dilqr_tpu.models import pendulum
from dilqr_tpu.ops.pallas.ilqr_fused import (
    _pick_lanes_width, _vmem_bytes, ilqr_fused, VMEM_SCRATCH_LIMIT,
)
from dilqr_tpu.types import ILQRConfig

F32 = jnp.float32


def _problem(B, T, lqr_iter=3, eps=0.0):
    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    rng = np.random.RandomState(0)
    th = rng.uniform(-2, 2, B).astype(np.float32)
    x_init = jnp.stack(
        [jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th)), jnp.zeros(B)], 1
    )
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=lqr_iter, eps=eps,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    C = jnp.broadcast_to(jnp.diag(q), (T, B, 4, 4))
    c = jnp.broadcast_to(p, (T, B, 4))
    return cfg, dyn, params, x_init, C, c


@pytest.mark.parametrize(
    "W", [2, pytest.param(4, marks=pytest.mark.slow)]
)
def test_widened_bitwise_equals_base(W):
    B, T = 1024 * W, 5
    cfg, dyn, params, x_init, C, c = _problem(B, T)
    outs = {}
    for w in (1, W):
        x, u, costs, du, it = ilqr_fused(
            cfg, dyn, params, x_init, C, c, None,
            u_lower=dyn.lower, u_upper=dyn.upper,
            interpret=True, lanes_width=w,
        )
        outs[w] = tuple(np.asarray(a) for a in (x, u, costs, du))
    for a, b, name in zip(outs[1], outs[W], ("x", "u", "costs", "du")):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_width_picker_divides_and_fits():
    """W must divide the base-tile count and keep VMEM under budget;
    batches with an odd tile count stay at W=1."""
    cfg, dyn, params, x_init, C, c = _problem(1024, 5)
    extras = dict(lin_dx=False, lanes_cost=True, uz=False, warm=False,
                  dyn_bounds=False)
    for tiles, w_max in ((1, 1), (2, 2), (3, 1), (4, 4), (8, 8), (12, 4)):
        w, mode = _pick_lanes_width(cfg, extras, tiles)
        assert tiles % w == 0
        assert w <= w_max
        assert mode == "none"
        assert _vmem_bytes(cfg, bt=1024 * w,
                           **extras) <= VMEM_SCRATCH_LIMIT

    # a problem too big for W=1 without streaming must pick a streaming
    # mode, never an unsupported geometry: rocket-sized state at T=120
    cfg_long = ILQRConfig(n_state=13, n_ctrl=3, T=120)
    extras_c = {**extras, "lanes_cost": False}
    w, mode = _pick_lanes_width(cfg_long, extras_c, 8)
    assert mode in ("k", "full")
    assert _vmem_bytes(cfg_long, stream_k=mode == "k",
                       full_stream=mode == "full", bt=1024 * w,
                       **extras_c) <= VMEM_SCRATCH_LIMIT
    # per-example lane costs at this size stream too (whole-T lane inputs
    # are full-stream-capable): a streaming mode must fit under the gate
    w, mode = _pick_lanes_width(cfg_long, extras, 8)
    assert mode in ("k", "full")
    assert _vmem_bytes(cfg_long, stream_k=mode == "k",
                       full_stream=mode == "full", bt=1024 * w,
                       **extras) <= VMEM_SCRATCH_LIMIT


def test_widened_bitwise_at_eps_mixed_convergence():
    """eps > 0 with the two base tiles engineered to stop at different
    outer iterations (near-upright starts vs hard swing-ups): widening
    must be bitwise-invisible. The stopping rule (and not-improved
    counting) runs per 128-lane SUBTILE; a stopped subtile's lanes run
    alpha = 0 fixed-point trials and accept nothing, exactly as if their
    base tile had exited its own kernel instance (code review r3: the
    old tile-wide reductions made the auto-picked W user-observable)."""
    dyn = pendulum.make()
    params = pendulum.default_params()
    q, p = pendulum.get_true_obj()
    rng = np.random.RandomState(0)
    th = np.concatenate([
        rng.uniform(-0.05, 0.05, 1024),
        rng.uniform(np.pi - 0.7, np.pi + 0.7, 1024),
    ]).astype(np.float32)
    tj = jnp.asarray(th)
    x_init = jnp.stack([jnp.cos(tj), jnp.sin(tj), jnp.zeros(2048)], 1)
    T = 5
    cfg = ILQRConfig(
        n_state=3, n_ctrl=1, T=T, lqr_iter=10, eps=1e-3,
        linesearch_decay=dyn.linesearch_decay,
        max_linesearch_iter=dyn.max_linesearch_iter,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    C = jnp.broadcast_to(jnp.diag(q), (T, 2048, 4, 4))
    c = jnp.broadcast_to(p, (T, 2048, 4))

    # the scenario is real: the halves stop at different counts
    its = []
    for half in (slice(0, 1024), slice(1024, 2048)):
        *_, it = ilqr_fused(
            cfg, dyn, params, x_init[half], C[:, half], c[:, half], None,
            u_lower=dyn.lower, u_upper=dyn.upper,
            interpret=True, lanes_width=1,
        )
        its.append(int(it))
    assert its[0] != its[1], its

    outs = {}
    for w in (1, 2):
        x, u, costs, du, it = ilqr_fused(
            cfg, dyn, params, x_init, C, c, None,
            u_lower=dyn.lower, u_upper=dyn.upper,
            interpret=True, lanes_width=w,
        )
        outs[w] = tuple(np.asarray(a) for a in (x, u, costs, du, it))
    for a, b, name in zip(outs[1], outs[2],
                          ("x", "u", "costs", "du", "it")):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_widened_bitwise_pnqp_bounded_lindx():
    """nu = 2 boxed LQR runs the in-kernel pnqp, whose Newton and Armijo
    exits are ALSO per-subtile reductions: a widened solve over two
    differently-conditioned base tiles must stay bitwise-equal to W=1."""
    from dilqr_tpu.types import LinDx

    B, T, nx, nu = 2048, 5, 3, 2
    n = nx + nu
    rng = np.random.RandomState(7)
    A = rng.randn(T, B, n, n).astype(np.float32)
    Cq = jnp.asarray(
        A @ A.transpose(0, 1, 3, 2) + 3.0 * np.eye(n, dtype=np.float32))
    cq_np = rng.randn(T, B, n).astype(np.float32)
    cq_np[:, 1024:] *= 25.0  # second tile: bounds bind hard, slower stop
    cq = jnp.asarray(cq_np)
    Fx = np.eye(nx, dtype=np.float32) \
        + 0.05 * rng.randn(T - 1, B, nx, nx).astype(np.float32)
    Fu = 0.3 * rng.randn(T - 1, B, nx, nu).astype(np.float32)
    F = jnp.asarray(np.concatenate([Fx, Fu], -1))
    x0 = jnp.asarray(rng.randn(B, nx).astype(np.float32))
    cfg = ILQRConfig(
        n_state=nx, n_ctrl=nu, T=T, lqr_iter=8, eps=1e-3,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    outs = {}
    for w in (1, 2):
        x, u, costs, du, it = ilqr_fused(
            cfg, LinDx(F, None), None, x0, Cq, cq, None,
            u_lower=-1.0, u_upper=1.0,
            interpret=True, lanes_width=w,
        )
        outs[w] = tuple(np.asarray(a) for a in (x, u, costs, du, it))
    for a, b, name in zip(outs[1], outs[2],
                          ("x", "u", "costs", "du", "it")):
        np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.parametrize("seed", range(4))
def test_widened_bitwise_feature_fuzz(seed):
    """Random feature combinations (bounds, u_zero_I, warm start, delta_u,
    nu 1..3, eps 0 or >0, halves conditioned differently) must be bitwise
    W-invariant -- the per-subtile machinery composes with every kernel
    feature, not just the curated cases above."""
    from dilqr_tpu.types import LinDx

    rng = np.random.RandomState(300 + seed)
    B, T = 2048, 4
    nu = 1 + seed % 3
    nx = 3
    n = nx + nu
    A = rng.randn(T, B, n, n).astype(np.float32)
    Cq = jnp.asarray(
        A @ A.transpose(0, 1, 3, 2) + 2.0 * np.eye(n, dtype=np.float32))
    cq_np = rng.randn(T, B, n).astype(np.float32)
    cq_np[:, 1024:] *= float(10.0 ** rng.uniform(0.5, 1.5))
    cq = jnp.asarray(cq_np)
    Fx = np.eye(nx, dtype=np.float32) \
        + 0.05 * rng.randn(T - 1, B, nx, nx).astype(np.float32)
    Fu = 0.3 * rng.randn(T - 1, B, nx, nu).astype(np.float32)
    F = jnp.asarray(np.concatenate([Fx, Fu], -1))
    x0 = jnp.asarray(rng.randn(B, nx).astype(np.float32))
    eps = float(rng.choice([0.0, 1e-3]))
    cfg = ILQRConfig(
        n_state=nx, n_ctrl=nu, T=T, lqr_iter=6, eps=eps,
        exit_unconverged=False, detach_unconverged=False, backprop=False,
    )
    kw = {}
    if rng.rand() < 0.8:
        kw["u_lower"], kw["u_upper"] = -1.0, 1.0
        if rng.rand() < 0.4:
            kw["delta_u"] = 0.7
    if rng.rand() < 0.5:
        kw["u_zero_I"] = jnp.asarray(
            rng.rand(T, B, nu) < 0.15)
    u0 = (jnp.asarray(0.1 * rng.randn(T, B, nu).astype(np.float32))
          if rng.rand() < 0.5 else None)
    outs = {}
    for w in (1, 2):
        x, u, costs, du, it = ilqr_fused(
            cfg, LinDx(F, None), None, x0, Cq, cq, u0,
            interpret=True, lanes_width=w, **kw)
        outs[w] = tuple(np.asarray(a) for a in (x, u, costs, du, it))
    for a, b, name in zip(outs[1], outs[2],
                          ("x", "u", "costs", "du", "it")):
        np.testing.assert_array_equal(
            a, b, err_msg=f"seed={seed} nu={nu} eps={eps} kw={sorted(kw)}")
