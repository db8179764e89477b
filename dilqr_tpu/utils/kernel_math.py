"""Transcendentals that Mosaic (Pallas TPU) does not lower natively.

The env dynamics recover the angle with atan2 (reference
env_dx/pendulum.py:78, cartpole.py:83); Mosaic has no atan/atan2 primitive,
so inside Pallas kernels we substitute a branchless Cephes-style polynomial
(atanf reduction: |z| <= tan(pi/8) direct, tan(pi/8) < z <= tan(3pi/8) via
(z-1)/(z+1) about pi/4, z > tan(3pi/8) via -1/z about pi/2; max error a few
f32 ulp). Outside kernels `atan2` stays jnp.arctan2 -- the XLA path keeps
libm-grade (and f64) accuracy, so the golden-parity tests are unaffected.

The switch is a context flag set by the kernel wrappers around pallas_call
while the kernel body traces (models import atan2 from here).
"""
from __future__ import annotations

import contextlib
import threading

import jax.numpy as jnp

_STATE = threading.local()


def _in_kernel() -> bool:
    return getattr(_STATE, "in_kernel", False)


@contextlib.contextmanager
def kernel_context():
    prev = _in_kernel()
    _STATE.in_kernel = True
    try:
        yield
    finally:
        _STATE.in_kernel = prev


# Cephes atanf polynomial coefficients (odd minimax on [0, tan(pi/8)])
_P0 = 8.05374449538e-2
_P1 = -1.38776856032e-1
_P2 = 1.99777106478e-1
_P3 = -3.33329491539e-1
_TAN_PI_8 = 0.4142135623730950
_TAN_3PI_8 = 2.414213562373095


def _poly_atan(x):
    """atan on [-inf, inf], branchless (where-based) Cephes reduction."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = (ax > _TAN_PI_8) & ~big
    # guard the divisions on the untaken branches
    z_big = -1.0 / jnp.where(big, ax, 1.0)
    z_mid = (ax - 1.0) / jnp.where(mid | big, ax + 1.0, 1.0)
    z = jnp.where(big, z_big, jnp.where(mid, z_mid, ax))
    base = jnp.where(big, jnp.pi / 2, jnp.where(mid, jnp.pi / 4, 0.0))
    zz = z * z
    poly = (((_P0 * zz + _P1) * zz + _P2) * zz + _P3) * zz * z + z
    return sign * (base + poly)


def _poly_atan2(y, x):
    # quadrant correction; (0, 0) -> 0 like numpy/libm
    z = y / jnp.where(x == 0.0, 1.0, x)
    a = _poly_atan(z)
    corr = jnp.where(y >= 0.0, jnp.pi, -jnp.pi)
    on_axis = jnp.where(
        y > 0.0,
        jnp.pi / 2,
        jnp.where(y < 0.0, -jnp.pi / 2, 0.0),
    )
    return jnp.where(x > 0.0, a, jnp.where(x < 0.0, a + corr, on_axis))


def atan2(y, x):
    if _in_kernel():
        return _poly_atan2(y, x)
    return jnp.arctan2(y, x)
