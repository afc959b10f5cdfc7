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

import jax

jax.config.update("jax_platforms", "cpu")
