"""Test configuration: force an 8-device virtual CPU platform BEFORE any
backend initializes, so multi-chip sharding paths are exercised without TPU
hardware (the TPU-native analog of testing multi-node without a cluster —
SURVEY.md §4).

Note: the environment's profile pins JAX_PLATFORMS=axon and the env var is not
honored once the plugin registers, so we must use jax.config.update here.
"""

import os

if os.environ.get("MSR_TEST_TPU"):
    # opt-out for the TPU-gated on-chip tests (TestPallasOnChip): keep the
    # real accelerator backend. Multi-device virtual-CPU tests will skip
    # (they assert 8 devices via the eight_devices fixture).
    import jax  # noqa: E402
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

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
    if os.environ.get("MSR_TEST_TPU") and len(devs) != 8:
        pytest.skip("multi-device virtual-CPU test (running in MSR_TEST_TPU mode)")
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
