"""End-to-end VSR CLI flows (train->eval incl. chunked-eval agreement,
StableHLO export, patch-CLI flag guard) -- split from
test_pipeline_e2e.py (the shared-artifact chain) so each file fits a
bounded per-command runtime on the 1-CPU host."""

import numpy as np
import pytest
import jax.numpy as jnp


def test_train_vsr_then_eval_cli(tmp_path):
    """train_vsr a few steps on the synthetic VSR dataset, then run the
    eval-only test_vsr CLI against the saved weights (reference flow:
    train_video_superresolution.py → test_video_superresolution.py)."""
    import numpy as np

    from mobilesuperresolution_tpu.cli import test_vsr as test_vsr_cli
    from mobilesuperresolution_tpu.cli import train_vsr as train_vsr_cli

    job = tmp_path / "vsr_job"
    common = [
        "--dataset", "synthetic_vsr",
        "--eval_datasets", "synthetic_vsr",
        "--model_type", "single",
        "--scale", "2",
        "--image_batch", "2",
        "--lr_patch_size", "16",
    ]
    train_vsr_cli.main(
        ["--job_dir", str(job), "--epochs", "1", "--num_patches", "8",
         "--train_batch_size", "8", *common]
    )
    weights = job / "weights" / "models.npz"
    assert weights.exists()
    result_log = (job / "result.log").read_text()
    assert "PSNR" in result_log or "psnr" in result_log.lower()

    eval_job = tmp_path / "vsr_eval"
    test_vsr_cli.main(
        ["--job_dir", str(eval_job), "--eval_model", str(weights), *common]
    )
    log = (eval_job / "result.log").read_text()
    assert "psnr" in log.lower()

    # chunked (bounded-memory) eval must agree exactly for the
    # frame-parallel 'single' model (parallel/temporal.py)
    import re

    chunk_job = tmp_path / "vsr_eval_chunked"
    test_vsr_cli.main(
        ["--job_dir", str(chunk_job), "--eval_model", str(weights),
         "--chunk_frames", "1", "--chunk_overlap", "0", *common]
    )

    def psnr_of(text):
        return float(re.search(r"PSNR=([\d.]+)", text).group(1))

    assert psnr_of((chunk_job / "result.log").read_text()) == pytest.approx(
        psnr_of(log), abs=1e-3
    )

def test_export_vsr_stablehlo(tmp_path):
    """VSR export (beyond the reference's SISR-only path): the full
    recurrent BasicVSR forward serializes to StableHLO and round-trips."""
    from jax import export as jax_export

    from mobilesuperresolution_tpu.cli import export as export_cli

    out = tmp_path / "vsr_model"
    export_cli.main(
        ["--model_type", "basic", "--scale", "2", "--out", str(out),
         "--height", "16", "--width", "16", "--frames", "2",
         "--format", "stablehlo"]
    )
    blob = (tmp_path / "vsr_model.stablehlo").read_bytes()
    reloaded = jax_export.deserialize(blob)
    y = reloaded.call(jnp.zeros((1, 2, 16, 16, 3), jnp.float32))
    assert y.shape == (1, 2, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()

def test_patch_cli_rejects_chunk_flags(tmp_path):
    from mobilesuperresolution_tpu.cli import test_vsr_by_patch as patch_cli

    with pytest.raises(ValueError, match="chunk_frames"):
        patch_cli.main(
            ["--job_dir", str(tmp_path / "p"), "--dataset", "synthetic_vsr",
             "--chunk_frames", "2"]
        )
