"""Spatially-sharded BasicVSR TRAINING (parallel/vsr_spatial.py::
make_spatial_vsr_step): full frames train across chips — the halo exchange
(ppermute) is differentiable, so the Charbonnier loss and parameter updates
must match the unsharded VSR step. Split from test_parallel_vsr.py (forward
equivalence) because the backward shard_map compiles are the slowest in the
suite on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mobilesuperresolution_tpu.models.basicvsr import BasicVSR


def _mesh(devs, n_spatial):
    return Mesh(
        np.asarray(devs[:n_spatial]).reshape(n_spatial), axis_names=("spatial",)
    )


@pytest.fixture(scope="module")
def model_and_params():
    from mobilesuperresolution_tpu.data.synthetic import synthetic_video

    # small trunk (rt = 3) so 8 shards of a 96-row frame satisfy
    # hloc=12 >= rt + max_disp with max_disp=8: 12 >= 11
    model = BasicVSR(num_feat=8, num_block=1, scale=4)
    clip = synthetic_video(11, t=3, hw=(96, 64), step=2).astype(np.float32) / 255.0
    x = jnp.asarray(clip[None])
    params = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.key(0), x, 4 * 96, 4 * 64
    )["params"]
    return model, params, x


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


def test_spatial_train_cli_matches_plain(tmp_path, eight_devices, monkeypatch):
    """End-to-end: train_vsr --spatial_shards 2 for one epoch reports the
    same per-epoch Charbonnier as the plain run (same seed → same init and
    batches). The canonical 'basic' model (nf=24, nb=8, rt=17) makes this
    wiring test a multi-minute CPU compile, so the factory is monkeypatched
    to a small BasicVSR (rt=3) — the CLI path under test (flag parsing →
    spatial mesh → make_spatial_vsr_step → epoch loop) is identical, and the
    numerics are already pinned at full generality by
    TestSpatialVSRTraining."""
    import re

    from mobilesuperresolution_tpu.cli import train_vsr as train_vsr_cli

    def tiny_basic(model_type, **kw):
        assert model_type == "basic"
        return BasicVSR(
            num_feat=8, num_block=1, scale=kw["scale"],
            compute_dtype=kw.get("compute_dtype", jnp.float32),
        )

    monkeypatch.setattr(train_vsr_cli, "get_vsr_model", tiny_basic)

    common = [
        "--dataset", "synthetic_vsr",
        "--eval_datasets", "synthetic_vsr",
        "--model_type", "basic",
        "--scale", "2",
        "--image_batch", "2",
        "--lr_patch_size", "16",
        "--num_patches", "8",
        "--train_batch_size", "8",
        "--epochs", "1",
        "--seed", "9",
    ]

    def charbonnier_of(job):
        text = (job / "result.log").read_text()
        return float(re.search(r"charbonnier=([\d.e+-]+)", text).group(1))

    # halo budget guard is fail-loud: R = rt(3) + max_disp(16) = 19 > hloc=8
    with pytest.raises(ValueError, match="trunk radius"):
        train_vsr_cli.main(
            ["--job_dir", str(tmp_path / "bad"), "--spatial_shards", "2",
             "--spatial_max_disp", "16", *common]
        )
    # equivalence: hloc=8 >= rt(3) + max_disp(2); the synthetic 2 px/frame
    # motion fits the 2-row flow budget, so the sharded loss is exact
    plain = tmp_path / "plain"
    train_vsr_cli.main(["--job_dir", str(plain), *common])
    sharded = tmp_path / "sharded"
    train_vsr_cli.main(
        ["--job_dir", str(sharded), "--spatial_shards", "2",
         "--spatial_max_disp", "2", *common]
    )
    assert charbonnier_of(sharded) == pytest.approx(
        charbonnier_of(plain), rel=1e-4
    )
