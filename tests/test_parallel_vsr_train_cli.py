"""CLI wiring for spatially-sharded VSR TRAINING (train_vsr
--spatial_shards): flag parsing → hybrid data×spatial mesh →
make_spatial_vsr_step → epoch loop. Split from test_parallel_vsr_train.py
(the step-level numerics suite) so each file fits a bounded per-command
runtime on the 1-CPU host — the backward shard_map compiles here are
multi-minute each."""

import pytest

import jax.numpy as jnp

from mobilesuperresolution_tpu.models.basicvsr import BasicVSR


def test_spatial_train_cli_matches_plain(tmp_path, eight_devices, monkeypatch):
    """End-to-end: train_vsr --spatial_shards 2 for one epoch reports the
    same per-epoch Charbonnier as the plain run (same seed → same init and
    batches). With 8 devices and --train_batch_size 8 the CLI builds the
    hybrid (data=4, spatial=2) mesh, so this also pins the batch-sharded
    spatial step against the unsharded run. The canonical 'basic' model
    (nf=24, nb=8, rt=17) makes this wiring test a multi-minute CPU compile,
    so the factory is monkeypatched to a small BasicVSR (rt=3) — the CLI
    path under test is identical, and the numerics are already pinned at
    full generality by
    test_parallel_vsr_train.py::TestSpatialVSRTraining."""
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
