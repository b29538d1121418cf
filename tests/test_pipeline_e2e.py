"""End-to-end artifact pipeline: NAS search -> block_index.txt ->
retrain-searched (ResultNet) -> naive-multi VSR build -> StableHLO/TFLite/
ONNX exports -- the full life of ONE search artifact (shared module
fixture). Sibling CLI flows live in test_pipeline_e2e_cli.py /
test_pipeline_e2e_vsr.py, split so each file fits a bounded per-command
runtime on the 1-CPU host."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.cli import search as search_cli
from mobilesuperresolution_tpu.cli import retrain_searched as retrain_cli
from mobilesuperresolution_tpu.export import export_stablehlo
from mobilesuperresolution_tpu.models import NaiveMultiModel
from mobilesuperresolution_tpu.models.result_net import ResultNet
from mobilesuperresolution_tpu.nas.artifact import read_block_index


@pytest.fixture(scope="module")
def search_job(tmp_path_factory):
    job = tmp_path_factory.mktemp("search_job")
    search_cli.main(
        [
            "--job_dir", str(job),
            "--dataset", "synthetic_isr",
            "--eval_datasets",
            "--num_blocks", "2",
            "--num_residual_units", "8",
            "--scale", "2",
            "--width_search",
            "--speed_target", "5",
            "--width_epochs", "1",
            "--epochs", "1",
            "--kernel_epochs", "1",
            "--train_batch_size", "8",
            "--lr_patch_size", "16",
            "--num_patches", "2",
            "--log_steps", "1",
        ]
    )
    return job

def test_search_writes_artifact(search_job):
    idx, width = read_block_index(str(search_job))
    assert all(w[2] in (3, 5, 7) for w in width)
    assert all(8 <= w[0] <= 8 for w in width)  # units=8, least_channel floor

def test_retrain_from_artifact(search_job, tmp_path):
    job = tmp_path / "retrain"
    retrain_cli.main(
        [
            "--job_dir", str(job),
            "--dataset", "synthetic_isr",
            "--eval_datasets", "synthetic_isr",
            "--block_index", str(search_job),
            "--scale", "2",
            "--epochs", "1",
            "--train_batch_size", "8",
            "--lr_patch_size", "16",
            "--num_patches", "2",
        ]
    )
    assert (job / "weights" / "models.npz").exists()
    assert (job / "result.log").exists()

def test_naive_multi_builds_from_artifact(search_job):
    m = NaiveMultiModel.from_artifact(str(search_job), scale=4)
    x = jnp.zeros((1, 2, 12, 12, 3))
    out = m.apply(jax.jit(m.init)(jax.random.key(0), x), x)
    assert out.shape == (1, 2, 48, 48, 3)

def test_export_stablehlo_from_artifact(search_job, tmp_path):
    model = ResultNet.from_artifact(str(search_job), scale=2)
    shape = (1, 24, 24, 3)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros(shape))
    out = export_stablehlo(
        model.apply, variables["params"], shape, str(tmp_path / "m.stablehlo")
    )
    assert os.path.getsize(out) > 1000

    # round-trip: deserialize and run
    from jax import export as jax_export

    with open(out, "rb") as f:
        exported = jax_export.deserialize(f.read())
    y = exported.call(jnp.zeros(shape))
    assert y.shape == (1, 48, 48, 3)

def test_export_tflite_quantized_roundtrip(search_job, tmp_path):
    """TFLite export (+ int8 dynamic-range quantization) runs in the TFLite
    interpreter — the mobile-deployment path that closes the NAS loop."""
    tf = pytest.importorskip("tensorflow")
    from mobilesuperresolution_tpu.export import export_tflite

    model = ResultNet.from_artifact(str(search_job), scale=2)
    shape = (1, 16, 16, 3)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros(shape))
    path = export_tflite(
        model.apply, variables["params"], shape, str(tmp_path / "m.tflite"),
        quantize=True,
    )
    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    interp.set_tensor(inp["index"], np.random.rand(*shape).astype(np.float32))
    interp.invoke()
    assert interp.get_tensor(out["index"]).shape == (1, 32, 32, 3)

def test_export_onnx(search_job, tmp_path):
    """ONNX export (the reference's interchange artifact, export_onnx.py:
    117-141) goes through an NCHW torch mirror with the weight norm baked
    into plain convs (jax2tf→tf2onnx cannot work: the converted graph is
    always an XlaCallModule, which tf2onnx has no handler for). The mirror's
    forward must match the flax forward; the actual .onnx write is gated on
    the 'onnx' package with a clear actionable error."""
    import numpy as np
    import torch

    from mobilesuperresolution_tpu.export import export_onnx
    from mobilesuperresolution_tpu.export.export import build_torch_result_net
    from mobilesuperresolution_tpu.models.result_net import ResultNet

    model = ResultNet.from_artifact(str(search_job), scale=2)
    shape = (1, 16, 16, 3)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros(shape))

    # forward parity: flax NHWC vs torch-mirror NCHW
    x = np.random.default_rng(0).random(shape).astype(np.float32)
    want = np.asarray(model.apply(variables, jnp.asarray(x)))
    mirror = build_torch_result_net(model, variables["params"])
    with torch.no_grad():
        got = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        got.numpy().transpose(0, 2, 3, 1), want, atol=2e-5
    )

    out = str(tmp_path / "m.onnx")
    try:
        import onnx  # noqa: F401

        have_onnx = True
    except ImportError:
        have_onnx = False
    if not have_onnx:
        with pytest.raises(RuntimeError, match="onnx"):
            export_onnx(model, variables["params"], shape, out)
        return
    path = export_onnx(model, variables["params"], shape, out)
    m = onnx.load(path)
    onnx.checker.check_model(m)
