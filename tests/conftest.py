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
def spatial_vsr_model_and_params():
    """Tiny BasicVSR + synthetic clip + init shared by the spatial-VSR
    forward (test_parallel_vsr.py) and training (test_parallel_vsr_train.py)
    suites — ONE configuration by construction. Small trunk (rt = 3) so 8
    shards of a 96-row frame satisfy hloc=12 >= rt + max_disp with
    max_disp=8: 12 >= 11."""
    import jax.numpy as jnp

    from mobilesuperresolution_tpu.data.synthetic import synthetic_video
    from mobilesuperresolution_tpu.models.basicvsr import BasicVSR

    model = BasicVSR(num_feat=8, num_block=1, scale=4)
    clip = synthetic_video(11, t=3, hw=(96, 64), step=2).astype(np.float32) / 255.0
    x = jnp.asarray(clip[None])
    params = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.key(0), x, 4 * 96, 4 * 64
    )["params"]
    return model, params, x


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if os.environ.get("MSR_TEST_TPU") and jax.default_backend() != "cpu":
        # backend check, not a device count: an 8-chip slice would otherwise
        # run these float32-CPU-tolerance tests on TPU (default bf16 matmuls)
        pytest.skip("multi-device virtual-CPU test (running in MSR_TEST_TPU mode)")
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
