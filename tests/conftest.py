"""Test configuration: run everything on a virtual 8-device CPU mesh so the
sharding tests exercise real collectives without TPU hardware (SURVEY.md
section 4: multi-host tests on a CPU mesh).

NB the container's axon TPU plugin registers itself at interpreter start
(sitecustomize) and overrides JAX_PLATFORMS, so the platform must be forced
via jax.config AFTER import."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# x64 available for the exact-parity goldens (solver code is dtype-generic;
# f32 tests pass f32 arrays explicitly)
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: these tests are compile-dominated.
# DILQR_TEST_CACHE lets a second pytest process (or an xdist worker) use
# its own directory -- concurrent writers to one cache dir segfault.
# The directory is suffixed with a host-CPU fingerprint: XLA:CPU persists
# AOT executables specialized to the compiling machine's ISA features, and
# this box's VM migrates between hosts -- loading a stale entry compiled
# for a different feature set warns "could lead to execution errors such
# as SIGILL" (cpu_aot_loader.cc) and is the prime suspect for the
# historical mid-suite segfaults inside backend_compile_and_load.
def _cpu_fingerprint():
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "unknown"


jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "DILQR_TEST_CACHE", f"/tmp/jax_test_cache_{_cpu_fingerprint()}"
    ),
)
# 0.3s threshold (not the 1.0 default): the per-module clear_caches
# below makes shared programs recompile each module, and persisting the
# mid-sized ones turns those into disk hits
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np
import pytest


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (full-coverage lane)",
    )


def pytest_collection_modifyitems(config, items):
    # default lane skips @pytest.mark.slow so `pytest tests/ -q` stays
    # under ~10 min on this 1-core box; `--slow` or `-m slow` restores
    # full coverage
    if config.getoption("--slow") or "slow" in (config.option.markexpr or ""):
        return
    skip_slow = pytest.mark.skip(reason="slow lane: pass --slow or -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(autouse=True, scope="module")
def _bound_executable_accumulation():
    """Drop jit/executable caches after every test module.

    One long pytest process accumulates hundreds of live XLA-CPU
    executables and reproducibly segfaults inside
    ``backend_compile_and_load`` partway through the suite (observed at
    ~146 tests).  Clearing per module keeps the client's live-executable
    count bounded at one module's worth; the persistent on-disk cache
    makes the resulting recompiles cheap."""
    yield
    jax.clear_caches()


@pytest.fixture
def golden():
    def load(name):
        path = os.path.join(GOLDEN_DIR, name + ".npz")
        return dict(np.load(path))

    return load
