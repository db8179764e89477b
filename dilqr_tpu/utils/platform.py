"""Execution-platform resolution for backend dispatch.

The container's TPU plugin keeps ``jax.default_backend() == "tpu"`` even
for programs running on CPU devices (e.g. a virtual CPU mesh), so any
gate that must know where a computation will actually execute sniffs the
committed devices of a concrete (eager) array first and only falls back
to the default backend for tracers (which carry no device).

Used by ops/riccati.py, core/ilqr.py, diff/{kkt,modes}.py to keep Pallas
kernels (TPU-only when compiled) off CPU execution paths, and to keep
TPU-only workaround gates (no f64 batched LU on TPU) from pessimizing
eager CPU solves.
"""
from __future__ import annotations

import hashlib

import jax


def target_platform(x) -> str:
    """Platform the computation consuming ``x`` will execute on: the
    committed platform of a concrete (eager) array, else
    ``jax.default_backend()``."""
    try:
        devices = x.devices()  # tracers: AttributeError/Concretization
        plats = {d.platform for d in devices}
        if len(plats) == 1:
            return plats.pop()
    except Exception:
        pass
    return jax.default_backend()


def cpu_cache_fingerprint() -> str:
    """Host-CPU feature fingerprint for keying persistent compile-cache
    directories: XLA:CPU persists AOT executables specialized to the
    compiling machine's ISA, and a migrated VM must not load entries
    compiled for another host's feature set (cpu_aot_loader warns SIGILL).
    Mirrors tests/conftest.py's scheme."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "unknown"
