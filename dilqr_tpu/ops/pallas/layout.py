"""Shared batch-on-lanes layout plumbing for the Pallas kernels.

One 1024-example batch tile = [8 sublanes, 128 lanes] per scalar entry;
host-side arrays are reshaped to [*small_dims, G, 8, 128] with G = B/1024
and the kernels grid over G. Used by riccati_fused.py and ilqr_fused.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT = 1024  # examples per BASE tile: 8 sublanes x 128 lanes

# The megakernel may WIDEN the lane axis to 128*W (W in {2,4,8}) when the
# batch has multiple base tiles and VMEM allows: every [8, 128*W] op is W
# independent vregs the Mosaic scheduler can interleave, hiding the
# per-vreg latency that dominates the otherwise single-vreg dependency
# chains (measured round 3; see ilqr_fused._pick_lanes_width).


def pad_batch(x, B, Bp):
    """Zero-pad axis 1 (the batch axis of a time-major array) to Bp."""
    if B == Bp:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, Bp - B)
    return jnp.pad(x, pad)


def pad_cost_identity(C_p, T, B, Bp, n):
    """Set padded examples' cost to the identity so Q_uu stays positive
    (their outputs are sliced away; this only prevents 0/0)."""
    if Bp == B:
        return C_p
    eye = jnp.broadcast_to(jnp.eye(n, dtype=C_p.dtype), (T, Bp - B, n, n))
    return C_p.at[:, B:].set(eye)


def to_lanes(x, T, Bp, lw=128):
    """[T, Bp, *small] -> [T, *small, G, 8, lw] (batch on lanes) with
    G = Bp // (8 * lw)."""
    small = x.shape[2:]
    perm = (0,) + tuple(range(2, x.ndim)) + (1,)
    x = x.transpose(perm)  # [T, *small, Bp]
    return x.reshape((T,) + small + (Bp // (8 * lw), 8, lw))


def from_lanes(x, T, B):
    """[T, *small, G, 8, lw] -> [T, B, *small]."""
    small = x.shape[1:-3]
    x = x.reshape((T,) + small + (-1,))
    perm = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
    return x.transpose(perm)[:, :B]


def expand_bound(val, T, B, Bp, nu, sign, dtype=jnp.float32):
    """Broadcast a bound (None | scalar | [T,B,nu]) to a padded [T,Bp,nu];
    None becomes sign*inf (a clip against +-inf is the identity)."""
    if val is None:
        return jnp.full((T, Bp, nu), sign * jnp.inf, dtype)
    if jnp.ndim(val) == 0:
        return jnp.broadcast_to(jnp.asarray(val, dtype), (T, Bp, nu))
    return pad_batch(jnp.broadcast_to(val, (T, B, nu)), B, Bp)


def bspec(T, small, lw=128):
    """BlockSpec for a lanes array [*lead, *small, G, 8, lw] blocked to
    batch group g. T=None means no leading time dim."""
    lead = () if T is None else (T,)
    m = len(lead) + len(small)
    return pl.BlockSpec(
        lead + small + (1, 8, lw),
        lambda g, m=m: (0,) * m + (g, 0, 0),
        memory_space=pltpu.VMEM,
    )


class LaneView:
    """View a lanes ref with its size-1 grid-blocked batch-group dim (third
    from the end) squeezed away; partial small-dim indices are completed
    with full slices."""

    __slots__ = ("r",)

    def __init__(self, r):
        self.r = r

    @property
    def shape(self):
        s = self.r.shape
        return s[:-3] + s[-2:]

    def _fix(self, idx):
        if idx is Ellipsis:
            idx = ()
        elif not isinstance(idx, tuple):
            idx = (idx,)
        n_small = len(self.r.shape) - 3
        assert len(idx) <= n_small
        return idx + (slice(None),) * (n_small - len(idx)) + (0,)

    def __getitem__(self, idx):
        return self.r[self._fix(idx)]

    def __setitem__(self, idx, val):
        self.r[self._fix(idx)] = val
