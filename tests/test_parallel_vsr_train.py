"""Spatially-sharded BasicVSR TRAINING (parallel/vsr_spatial.py::
make_spatial_vsr_step): full frames train across chips — the halo exchange
(ppermute) is differentiable, so the Charbonnier loss and parameter updates
must match the unsharded VSR step. Split from test_parallel_vsr.py (forward
equivalence) and test_parallel_vsr_train_cli.py (CLI wiring) because the
backward shard_map compiles are the slowest in the suite on the
8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers.meshes import spatial_mesh as _mesh
from mobilesuperresolution_tpu.models.basicvsr import BasicVSR


@pytest.fixture
def model_and_params(spatial_vsr_model_and_params):
    # shared session fixture (conftest.py) — the forward suite
    # (test_parallel_vsr.py) uses the SAME configuration
    return spatial_vsr_model_and_params


class TestSpatialVSRTraining:
    def test_spatial_vsr_training_matches_plain_step(
        self, eight_devices, model_and_params
    ):
        """FULL-FRAME VSR training across shards: losses and updated params
        of make_spatial_vsr_step must match the unsharded VSR step — the
        sharded forward is value-exact per output pixel, every output row is
        owned by exactly one shard, and the halo exchange (ppermute) is
        differentiable, so Charbonnier gradients agree to float tolerance."""
        from mobilesuperresolution_tpu.cli.train_vsr import spynet_frozen_mask
        from mobilesuperresolution_tpu.parallel.vsr_spatial import (
            make_spatial_vsr_step,
        )
        from mobilesuperresolution_tpu.train.state import (
            create_train_state,
            vsr_multistep_adam,
        )
        from mobilesuperresolution_tpu.train.steps import make_vsr_step

        model, params, x = model_and_params
        h, w = x.shape[2], x.shape[3]
        oh, ow = 4 * h, 4 * w
        rng = np.random.default_rng(21)
        hr = jnp.asarray(rng.random((1, x.shape[1], oh, ow, 3), np.float32))

        mask = spynet_frozen_mask(params)
        tx = vsr_multistep_adam(1e-3, 4, 4, trainable_mask=mask)

        def fresh_state():
            # deep-copy: the train steps donate their state buffers, and the
            # module-scoped fixture params must survive for later tests
            return create_train_state(
                model, jax.random.key(0), x, tx, extra_args=(oh, ow),
                variables={"params": jax.tree.map(jnp.copy, params)},
            )

        plain_state, plain_step = fresh_state(), None
        plain_step = make_vsr_step(plain_state, (oh, ow))
        mesh = _mesh(eight_devices, 8)
        sp_state = fresh_state()
        sp_step = make_spatial_vsr_step(
            sp_state, model, mesh, (oh, ow), max_disp=8
        )

        for _ in range(2):
            plain_state, pm = plain_step(plain_state, (x, hr))
            sp_state, sm = sp_step(sp_state, (x, hr))
            np.testing.assert_allclose(
                float(sm["loss"]), float(pm["loss"]), rtol=1e-5, atol=1e-7
            )

        flat_p = jax.tree_util.tree_leaves_with_path(plain_state.params)
        flat_s = jax.tree_util.tree_leaves(sp_state.params)
        for (path, a), b in zip(flat_p, flat_s):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=jax.tree_util.keystr(path),
            )
