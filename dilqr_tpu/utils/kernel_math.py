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
    """atan on [-inf, inf], branchless (where-based) Cephes reduction.

    Constants in all-scalar-branch where()s are pinned to x.dtype: two
    python-float branches would otherwise produce a WEAK f64 array under
    jax_enable_x64, and Mosaic has no f64->f32 cast."""
    # np-scalar constants (dt.type): jnp.asarray(v, dt) inside a
    # trace lowers as an f64 constant + cast under x64, which
    # Mosaic rejects; numpy scalars are cast on the host
    dt = x.dtype.type
    one = dt(1.0)
    # not jnp.sign: its lowering builds an f64 constant under x64 that
    # Mosaic cannot cast; sign-of-zero doesn't matter here (poly(0) = 0)
    sign = jnp.where(x < 0.0, -one, one)
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = (ax > _TAN_PI_8) & ~big
    # guard the divisions on the untaken branches
    z_big = -one / jnp.where(big, ax, one)
    z_mid = (ax - one) / jnp.where(mid | big, ax + one, one)
    z = jnp.where(big, z_big, jnp.where(mid, z_mid, ax))
    base = jnp.where(
        big, dt(jnp.pi / 2),
        jnp.where(mid, dt(jnp.pi / 4), dt(0.0)),
    )
    zz = z * z
    poly = (((_P0 * zz + _P1) * zz + _P2) * zz + _P3) * zz * z + z
    return sign * (base + poly)


def _poly_atan2(y, x):
    # quadrant correction; (0, 0) -> 0 like numpy/libm
    dt = y.dtype.type
    pi_c = dt(jnp.pi)
    z = y / jnp.where(x == 0.0, dt(1.0), x)
    a = _poly_atan(z)
    corr = jnp.where(y >= 0.0, pi_c, -pi_c)
    on_axis = jnp.where(
        y > 0.0,
        dt(jnp.pi / 2),
        jnp.where(y < 0.0, dt(-jnp.pi / 2), dt(0.0)),
    )
    return jnp.where(x > 0.0, a, jnp.where(x < 0.0, a + corr, on_axis))


def atan2(y, x):
    if _in_kernel():
        return _poly_atan2(y, x)
    return jnp.arctan2(y, x)


def rotate_cs(cos_th, sin_th, delta):
    """(cos, sin) of ``atan2(sin_th, cos_th) + delta`` without recovering
    the angle.

    The pendulum/cartpole steps use the recovered angle ONLY to advance it
    by one Euler increment and re-embed (reference pendulum.py:78-90,
    cartpole.py:83-96) -- inside kernels that whole atan2 -> cos/sin
    round-trip collapses to the angle-addition identities plus one
    rsqrt renormalization (scale-invariant in (cos_th, sin_th), exactly
    like the original: atan2 discards the input norm, rsqrt divides it
    out), saving the ~28-op polynomial atan2 per env-step evaluation --
    the dominant per-step cost for the small-state envs. Differs from
    the sequential form only at f32 rounding (few-ulp; the in-kernel
    _poly_atan2 substitution already concedes that much). Outside
    kernels the reference's exact sequence is kept so the f64
    golden-parity tests are unaffected.
    """
    if not _in_kernel():
        th = jnp.arctan2(sin_th, cos_th) + delta
        return jnp.cos(th), jnp.sin(th)
    import jax

    cd = jnp.cos(delta)
    sd = jnp.sin(delta)
    c = cos_th * cd - sin_th * sd
    s = sin_th * cd + cos_th * sd
    # zero-norm guard: atan2(0, 0) = 0, so the sequential form returns
    # (cos delta, sin delta) for a degenerate input -- reproduce that
    # instead of rsqrt(0) = inf -> NaN poisoning the rest of the solve
    dt = c.dtype.type
    nn = c * c + s * s
    r = jax.lax.rsqrt(jnp.maximum(nn, dt(1e-30)))
    zero = nn == 0.0
    return jnp.where(zero, cd, c * r), jnp.where(zero, sd, s * r)
