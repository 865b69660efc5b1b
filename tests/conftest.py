"""Test configuration: pin computations to (virtual) CPU devices.

The container pins ``JAX_PLATFORMS=axon`` (a tunneled TPU) via sitecustomize;
overriding it to ``cpu`` deadlocks the relay, so tests instead keep the
default platform and route all work to host CPU devices with
``jax.default_device``.  ``XLA_FLAGS`` is extended *before* the CPU client is
created so multi-device tests get 8 virtual CPU devices (SURVEY §4.4:
distributed tests without a cluster).
"""

import os

_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()

import jax  # noqa: E402
import pytest  # noqa: E402


def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(autouse=True)
def _on_cpu():
    with jax.default_device(cpu_devices()[0]):
        yield
