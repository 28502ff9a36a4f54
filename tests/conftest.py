"""Test configuration: run JAX on CPU with 8 virtual devices.

Tests force the CPU backend (the axon TPU tunnel is slow to compile and not
needed for correctness tests) and expose 8 virtual host devices so the
multi-device sharding paths are exercised without a TPU pod — the JAX
equivalent of a distributed test rig (SURVEY §4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402  (imported after backend selection on purpose)


@pytest.fixture(scope="session")
def cpu_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual CPU devices, got {devices}"
    return devices
