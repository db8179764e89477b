"""Host-callback capability gate.

The tunneled TPU runtime used in this container (PJRT plugin "axon")
rejects host send/recv callbacks at compile time:

    UNIMPLEMENTED: axon_pjrt does not support host send/recv callbacks
    (jax io_callback / pure_callback / debug.callback)

so every best-effort diagnostic emitted via jax.debug.callback (IFT
non-convergence warning, exit_unconverged warning, the in-solve verbose
table, ANALYTIC_CHECK) must be skipped when the program may execute there
-- the correctness-critical reactions (e.g. the IFT dense fallback) are
pure in-graph lax.cond logic and are unaffected.

Detection keys on the PJRT platform_version string, which the plugin
stamps with "axon"; every other backend (real TPU runtimes, CPU, GPU)
supports callbacks.
"""
from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=None)
def _backend_supports(platform: str) -> bool:
    try:
        client = jax.devices(platform)[0].client
        version = str(getattr(client, "platform_version", ""))
        return "axon" not in version.lower()
    except Exception:
        return True


def supports_host_callback() -> bool:
    """True when jax.debug.callback can be compiled for the default
    backend. Evaluated at trace time (python), so callers simply skip
    emitting the callback op.

    Layering caveat: tracing has no notion of the device the program will
    actually run on, so this keys on jax.default_backend(). In a session
    where the axon plugin pins the default to TPU, programs explicitly
    placed on CPU devices also lose their (best-effort) diagnostics;
    force JAX_PLATFORMS=cpu / jax.config jax_platforms for debug runs, as
    tests/conftest.py does."""
    try:
        return _backend_supports(jax.default_backend())
    except Exception:
        return True
