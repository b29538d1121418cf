"""Test configuration: force an 8-device virtual CPU platform BEFORE any
backend initializes, so multi-chip sharding paths are exercised without TPU
hardware (the TPU-native analog of testing multi-node without a cluster —
SURVEY.md §4).

Note: the environment's profile pins JAX_PLATFORMS=axon and the env var is not
honored once the plugin registers, so we must use jax.config.update here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
