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
# persistent compilation cache: these tests are compile-dominated
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture
def golden():
    def load(name):
        path = os.path.join(GOLDEN_DIR, name + ".npz")
        return dict(np.load(path))

    return load
