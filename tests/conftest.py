"""Test environment: CPU backend with 8 virtual devices.

Unit tests run on the CPU backend (the interpret-mode stand-in for TPU), and
mesh/sharding tests use 8 virtual host devices. The flags must be in place
before the first backend initialization; this environment also presets
``JAX_PLATFORMS=axon`` (a tunneled TPU), so the override must be forced, not
defaulted.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import gc

import jax
import pytest

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The suite performs hundreds of unique XLA:CPU compilations in one
    process; with all executables kept alive the compiler eventually
    segfaults (observed reproducibly around the last module on a 1-CPU
    host). Clearing per-module keeps peak compiler state bounded without
    recompiling within a module.
    """
    yield
    jax.clear_caches()
    gc.collect()
