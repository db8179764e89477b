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


@pytest.mark.parametrize("W", [2, 4])
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
    # (compact cost; per-example lane costs at this size legitimately fit
    # NO mode and fall back to XLA)
    cfg_long = ILQRConfig(n_state=13, n_ctrl=3, T=120)
    extras_c = {**extras, "lanes_cost": False}
    w, mode = _pick_lanes_width(cfg_long, extras_c, 8)
    assert mode in ("k", "full")
    assert _vmem_bytes(cfg_long, stream_k=mode == "k",
                       full_stream=mode == "full", bt=1024 * w,
                       **extras_c) <= VMEM_SCRATCH_LIMIT
    w, mode = _pick_lanes_width(cfg_long, extras, 8)
    assert mode == "none" and w == 1  # unsupported -> XLA fallback shape
