"""Spatially-sharded BasicVSR equivalence (parallel/vsr_spatial.py): the
8-virtual-device halo-exchange forward must match the plain full-frame
forward — extending exact multi-chip spatial scaling from the pure-conv WDSR
family (parallel/halo.py) to the flagship recurrent VSR pipeline
(VERDICT r2 item 5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers.meshes import spatial_mesh as _mesh
from mobilesuperresolution_tpu.models.basicvsr import BasicVSROrigin
from mobilesuperresolution_tpu.parallel.vsr_spatial import (
    spatial_basicvsr_forward,
    trunk_radius,
)


@pytest.fixture
def model_and_params(spatial_vsr_model_and_params):
    # shared session fixture (conftest.py) — the training suite
    # (test_parallel_vsr_train.py) uses the SAME configuration
    return spatial_vsr_model_and_params


class TestSpatialVSR:
    def test_sharded_matches_full_frame(self, eight_devices, model_and_params):
        model, params, x = model_and_params
        h, w = x.shape[2], x.shape[3]
        want = np.asarray(model.apply({"params": params}, x, 4 * h, 4 * w))

        mesh = _mesh(eight_devices, 8)
        got = np.asarray(
            spatial_basicvsr_forward(
                model, params, x, 4 * h, 4 * w, mesh, max_disp=8
            )
        )
        assert got.shape == want.shape
        # synthetic motion is 2 px/frame << max_disp=8, so the flow clip is
        # inactive and the halo construction must be numerically exact
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_two_and_four_shards_match(self, eight_devices, model_and_params):
        """Shard count must not change the result (different halo patterns,
        same math)."""
        model, params, x = model_and_params
        h, w = x.shape[2], x.shape[3]
        outs = []
        for n in (2, 4):
            mesh = _mesh(eight_devices, n)
            outs.append(
                np.asarray(
                    spatial_basicvsr_forward(
                        model, params, x, 4 * h, 4 * w, mesh, max_disp=8
                    )
                )
            )
        np.testing.assert_allclose(outs[0], outs[1], atol=2e-5, rtol=1e-5)

    def test_single_shard_matches_plain(self, eight_devices, model_and_params):
        """n=1 degenerates to the plain forward (mask/halo machinery must be
        identity at the mesh boundary)."""
        model, params, x = model_and_params
        h, w = x.shape[2], x.shape[3]
        want = np.asarray(model.apply({"params": params}, x, 4 * h, 4 * w))
        mesh = _mesh(eight_devices, 1)
        got = np.asarray(
            spatial_basicvsr_forward(model, params, x, 4 * h, 4 * w, mesh)
        )
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_hybrid_data_spatial_forward_matches(
        self, eight_devices, model_and_params
    ):
        """(data=2, spatial=4) mesh with a 2-clip batch: clips shard over
        'data' (each local block keeps its [backward | forward] direction
        halves aligned) while frame height shards over 'spatial' — must
        match the plain forward. Distinct per-clip content makes any
        direction/batch misalignment a gross error, not a tolerance miss."""
        from jax.sharding import Mesh

        model, params, x = model_and_params
        h, w = x.shape[2], x.shape[3]
        x2 = jnp.concatenate([x, x[:, :, ::-1]], axis=0)  # B=2, distinct
        want = np.asarray(model.apply({"params": params}, x2, 4 * h, 4 * w))
        mesh = Mesh(
            np.asarray(eight_devices).reshape(2, 4),
            axis_names=("data", "spatial"),
        )
        got = np.asarray(
            spatial_basicvsr_forward(
                model, params, x2, 4 * h, 4 * w, mesh, max_disp=8
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_rejects_undersized_shards(self, eight_devices, model_and_params):
        model, params, x = model_and_params
        h, w = x.shape[2], x.shape[3]
        mesh = _mesh(eight_devices, 8)
        with pytest.raises(ValueError, match="trunk radius"):
            spatial_basicvsr_forward(
                model, params, x, 4 * h, 4 * w, mesh, max_disp=30
            )

    def test_rejects_indivisible_height(self, eight_devices, model_and_params):
        model, params, _ = model_and_params
        mesh = _mesh(eight_devices, 8)
        x = jnp.zeros((1, 2, 100, 64, 3), jnp.float32)  # 100 % 8 != 0
        with pytest.raises(ValueError, match="not divisible"):
            spatial_basicvsr_forward(model, params, x, 400, 256, mesh)

    def test_origin_sharded_matches_full_frame(
        self, eight_devices, model_and_params
    ):
        """BasicVSROrigin — the faithful reconstruction ladder (fusion →
        2x PixelShuffle → conv_hr → conv_last → +4x base → resize) — must
        shard exactly like the mobile model: the propagation machinery is
        shared, only the frame-parallel reconstruction differs (VERDICT r3
        item 5: origin is the trunk-dominated model where height sharding
        pays most)."""
        _, _, x = model_and_params
        m = BasicVSROrigin(num_feat=8, num_block=1, scale=4)
        h, w = x.shape[2], x.shape[3]
        params = jax.jit(m.init, static_argnums=(2, 3))(
            jax.random.key(1), x, 4 * h, 4 * w
        )["params"]
        want = np.asarray(m.apply({"params": params}, x, 4 * h, 4 * w))
        mesh = _mesh(eight_devices, 8)
        got = np.asarray(
            spatial_basicvsr_forward(m, params, x, 4 * h, 4 * w, mesh, max_disp=8)
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_rejects_non_recurrent_model(self, eight_devices):
        from mobilesuperresolution_tpu.models.single_image import SingleImageModel

        mesh = _mesh(eight_devices, 2)
        m = SingleImageModel(scale=4, channel=8, blocks=1)
        with pytest.raises(TypeError, match="recurrent models"):
            spatial_basicvsr_forward(
                m, {}, jnp.zeros((1, 2, 32, 32, 3)), 128, 128, mesh
            )

    def test_trunk_radius(self):
        assert trunk_radius(1) == 3
        assert trunk_radius(8) == 17

    def test_bf16_output_dtype_matches_plain(self, eight_devices):
        """Under compute_dtype=bfloat16 the sharded forward must cast back
        to the input dtype exactly like BasicVSR.__call__ — the 'matches the
        plain forward' contract includes the output dtype."""
        from mobilesuperresolution_tpu.models.basicvsr import BasicVSR

        model = BasicVSR(
            num_feat=4, num_block=1, scale=2, compute_dtype=jnp.bfloat16
        )
        x = jnp.zeros((1, 2, 16, 16, 3), jnp.float32)
        params = jax.jit(model.init, static_argnums=(2, 3))(
            jax.random.key(0), x, 32, 32
        )["params"]
        mesh = _mesh(eight_devices, 2)
        got = spatial_basicvsr_forward(model, params, x, 32, 32, mesh, max_disp=4)
        assert got.dtype == x.dtype, got.dtype

    def test_jitted_wrapper_exact(self, eight_devices, model_and_params):
        """The CLI wraps spatial_basicvsr_forward in jax.jit (static oh/ow,
        cli/train_vsr.py) — the traced path (device_put-as-constraint inside
        jit) must stay exact."""
        model, params, x = model_and_params
        h, w = x.shape[2], x.shape[3]
        want = np.asarray(model.apply({"params": params}, x, 4 * h, 4 * w))
        mesh = _mesh(eight_devices, 8)
        f = jax.jit(
            lambda p, a, oh, ow: spatial_basicvsr_forward(
                model, p, a, oh, ow, mesh, max_disp=8
            ),
            static_argnums=(2, 3),
        )
        got = np.asarray(f(params, x, 4 * h, 4 * w))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_spatial_shards_cli_matches_full_frame(tmp_path, eight_devices):
    """End-to-end: test_vsr --spatial_shards 2 reports the same PSNR as the
    plain full-frame eval (same seed → same random init; the canonical
    'basic' model has trunk radius 17, so 2 shards of the 48-row synthetic
    LR frames is the deepest split that fits)."""
    import re

    from mobilesuperresolution_tpu.cli import test_vsr as test_vsr_cli

    common = [
        "--dataset", "synthetic_vsr",
        "--eval_datasets", "synthetic_vsr",
        "--model_type", "basic",
        "--scale", "2",
        "--image_batch", "2",
        "--lr_patch_size", "16",
        "--seed", "3",
    ]

    def psnr_of(job):
        text = (job / "result.log").read_text()
        return float(re.search(r"PSNR=([\d.]+)", text).group(1))

    plain = tmp_path / "plain"
    test_vsr_cli.main(["--job_dir", str(plain), *common])
    sharded = tmp_path / "sharded"
    test_vsr_cli.main(
        ["--job_dir", str(sharded), "--spatial_shards", "2",
         "--spatial_max_disp", "4", *common]
    )
    assert psnr_of(sharded) == pytest.approx(psnr_of(plain), abs=1e-3)

    with pytest.raises(SystemExit, match="mutually exclusive"):
        test_vsr_cli.main(
            ["--job_dir", str(tmp_path / "x"), "--spatial_shards", "2",
             "--chunk_frames", "2", *common]
        )
