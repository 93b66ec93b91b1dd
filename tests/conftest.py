"""Test configuration: run everything on a virtual 8-device CPU mesh.

The image pins JAX_PLATFORMS=axon (a tunneled TPU); the env var is
overridden at import time, so tests force the CPU backend via
jax.config.update before any backend initialization (SURVEY §4 implication d:
distributed tests run on --xla_force_host_platform_device_count=8).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs
