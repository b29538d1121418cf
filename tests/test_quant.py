"""int8 dynamic-range quantized inference (ops/quant.py).

The reference's real deployment runs int8 dynamic-range TFLite
(onnx_tflite.py:1-10); ops/quant.py is that numerics class on the TPU int8
MXU path, opt-in for the BasicVSR family (models/__init__.py get_vsr_model).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobilesuperresolution_tpu.models import get_vsr_model
from mobilesuperresolution_tpu.ops.quant import (
    conv2d_maybe_quantized,
    qconv2d,
    quantize_kernel,
    quantize_symmetric,
)


class TestQuantizeSymmetric:
    def test_grid_values_roundtrip_exactly(self, rng):
        scale = 0.037
        q_true = rng.integers(-127, 128, size=(4, 7)).astype(np.float32)
        x = jnp.asarray(q_true * scale)
        q, s = quantize_symmetric(x)
        # max|x| = 127*scale when 127 or -127 present; force it
        x = x.at[0, 0].set(127 * scale)
        q, s = quantize_symmetric(x)
        np.testing.assert_allclose(np.asarray(q, np.float32) * np.asarray(s), np.asarray(x), rtol=0, atol=scale * 0.5 + 1e-9)

    def test_zero_maps_to_zero_and_all_zero_tensor_safe(self):
        q, s = quantize_symmetric(jnp.zeros((3, 3)))
        assert np.all(np.asarray(q) == 0) and np.isfinite(float(s))

    def test_bf16_input_quantizes_via_f32(self, rng):
        x = jnp.asarray(rng.normal(size=(8, 8)), jnp.bfloat16)
        q, s = quantize_symmetric(x)
        assert q.dtype == jnp.int8
        err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x, np.float32))
        assert err.max() <= float(s) * 0.51

    def test_per_channel_kernel_scales(self, rng):
        k = jnp.asarray(rng.normal(size=(3, 3, 4, 6)), jnp.float32)
        k = k.at[..., 2].mul(100.0)  # one hot channel must not clip the rest
        q, s = quantize_kernel(k)
        assert s.shape == (6,)
        deq = np.asarray(q, np.float32) * np.asarray(s)
        np.testing.assert_allclose(deq, np.asarray(k), atol=np.asarray(s).max() * 0.51)
        # the small channels keep their own resolution
        assert np.abs(deq[..., 0] - np.asarray(k)[..., 0]).max() <= float(s[0]) * 0.51


class TestQConv2d:
    def test_int8_conv_matches_integer_reference(self, rng):
        """jax's s8xs8->s32 conv is integer-exact (the MXU int8 contract)."""
        x = jnp.asarray(rng.integers(-127, 128, (2, 9, 9, 5)), jnp.int8)
        k = jnp.asarray(rng.integers(-127, 128, (3, 3, 5, 7)), jnp.int8)
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        yf = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), k.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_array_equal(np.asarray(y), np.asarray(yf, np.int32))

    def test_qconv_close_to_float_conv(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 8, 12)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.normal(size=(12,)), jnp.float32)
        yq = qconv2d(x, k, b)
        ye = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        # error bound: one int8 step per operand over a 9*8-term dot
        ref = float(jnp.max(jnp.abs(ye)))
        err = float(jnp.max(jnp.abs(yq - ye)))
        assert 0 < err < 0.02 * max(ref, 1.0)

    def test_exact_path_is_bit_identical_to_raw_conv(self, rng):
        """quantized=False must stay byte-identical to the pre-quant code —
        the headline bench and all parity tests ride this path."""
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 4, 4)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
        y = conv2d_maybe_quantized(x, k, b, quantized=False)
        ye = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ye))

    def test_batch_composition_invariance(self, rng):
        """Per-SAMPLE dynamic scales: quantizing a batch == quantizing each
        sample alone (multi-stream serving and mesh-folded chunk windows
        must not change the numbers)."""
        x = jnp.asarray(rng.normal(size=(3, 8, 8, 4)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 4, 4)), jnp.float32)
        batched = qconv2d(x, k)
        solo = jnp.concatenate([qconv2d(x[i : i + 1], k) for i in range(3)])
        np.testing.assert_array_equal(np.asarray(batched), np.asarray(solo))

    def test_output_dtype_follows_input(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, 4, 4)), jnp.float32)
        assert qconv2d(x, k).dtype == jnp.bfloat16


class TestQuantizedModels:
    @pytest.mark.parametrize("model_type,c_in", [("basic", 3), ("basic_mv", 5)])
    def test_quantized_forward_close_to_exact(self, rng, model_type, c_in):
        mq = get_vsr_model(model_type, scale=4, quantized=True)
        me = get_vsr_model(model_type, scale=4)
        x = jnp.asarray(rng.random((1, 3, 16, 16, c_in)), jnp.float32)
        # same param structure: a float checkpoint loads into the quantized
        # model unchanged (quantization happens in-graph at apply time)
        p = jax.jit(lambda k, x: me.init(k, x, 64, 64))(jax.random.PRNGKey(0), x)
        pq = jax.jit(lambda k, x: mq.init(k, x, 64, 64))(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(pq)
        ye = jax.jit(lambda p, x: me.apply(p, x, 64, 64))(p, x)
        yq = jax.jit(lambda p, x: mq.apply(p, x, 64, 64))(p, x)
        err = float(jnp.max(jnp.abs(yq - ye)))
        assert 0 < err < 0.05  # differs (int8 grid) but close on [0,1] frames

    def test_quantized_basic_origin_builds(self, rng):
        m = get_vsr_model("basic_origin", scale=4, quantized=True)
        x = jnp.asarray(rng.random((1, 2, 8, 8, 3)), jnp.float32)
        p = jax.jit(lambda k, x: m.init(k, x, 32, 32))(jax.random.PRNGKey(0), x)
        y = jax.jit(lambda p, x: m.apply(p, x, 32, 32))(p, x)
        assert y.shape == (1, 2, 32, 32, 3) and bool(jnp.all(jnp.isfinite(y)))

    def test_registry_rejects_unsupported_types(self):
        with pytest.raises(ValueError, match="quantized"):
            get_vsr_model("multi_v1", scale=4, block_index_path="x",
                          quantized=True)

    @pytest.mark.parametrize("model_type", ["single", "multi"])
    def test_quantized_frame_parallel_models(self, rng, tmp_path, model_type):
        kw = {}
        if model_type == "multi":
            p = tmp_path / "block_index.txt"
            p.write_text("([0, 1], [[8, 8, 3], [8, 6, 5]])\n")
            kw["block_index_path"] = str(p)
        me = get_vsr_model(model_type, scale=2, **kw)
        mq = get_vsr_model(model_type, scale=2, quantized=True, **kw)
        x = jnp.asarray(rng.random((1, 2, 16, 16, 3)), jnp.float32)
        p0 = jax.jit(lambda k, x: me.init(k, x, 32, 32))(jax.random.PRNGKey(0), x)
        pq = jax.jit(lambda k, x: mq.init(k, x, 32, 32))(jax.random.PRNGKey(0), x)
        # same tree: float checkpoints load into the quantized model
        assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(pq)
        for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(pq)):
            assert a.shape == b.shape
        ye = jax.jit(lambda p, x: me.apply(p, x, 32, 32))(p0, x)
        yq = jax.jit(lambda p, x: mq.apply(p, x, 32, 32))(p0, x)
        err = float(jnp.max(jnp.abs(yq - ye)))
        assert 0 < err < 0.05

    def test_quantized_wdsr_basic_close_to_exact(self, rng):
        from mobilesuperresolution_tpu.models.wdsr_basic import BasicModel

        me = BasicModel(num_blocks=2, num_residual_units=8, scale=2)
        mq = BasicModel(num_blocks=2, num_residual_units=8, scale=2,
                        quantized=True)
        x = jnp.asarray(rng.random((1, 12, 12, 3)), jnp.float32)
        p = jax.jit(me.init)(jax.random.PRNGKey(0), x)
        pq = jax.jit(mq.init)(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(pq)
        ye = jax.jit(me.apply)(p, x)
        yq = jax.jit(mq.apply)(p, x)
        err = float(jnp.max(jnp.abs(yq - ye)))
        ref = float(jnp.max(jnp.abs(ye)))
        assert 0 < err < 0.05 * max(ref, 1.0)

    def test_quantized_result_net(self, rng):
        from mobilesuperresolution_tpu.models.result_net import ResultNet

        idx = ((8, 4, 3), (8, 6, 5))
        me = ResultNet(scale=2, idx=idx)
        mq = ResultNet(scale=2, idx=idx, quantized=True)
        x = jnp.asarray(rng.random((1, 10, 10, 3)), jnp.float32)
        p = jax.jit(me.init)(jax.random.PRNGKey(1), x)
        ye = jax.jit(me.apply)(p, x)
        yq = jax.jit(mq.apply)(p, x)
        err = float(jnp.max(jnp.abs(yq - ye)))
        assert 0 < err < 0.05 * max(float(jnp.max(jnp.abs(ye))), 1.0)

    def test_sisr_registry_rejects_nas_quantize(self):
        from types import SimpleNamespace

        from mobilesuperresolution_tpu.models import get_model

        params = SimpleNamespace(
            model_type="NAS_MODEL", num_blocks=2, num_residual_units=8,
            scale=2, quantize="int8",
        )
        with pytest.raises(ValueError, match="BASIC_MODEL"):
            get_model(params)

    def test_quantized_mesh_chunked_matches_serial(self, rng):
        """chunk_data_parallel folds window groups into a batch sharded on
        'data' — per-sample quantization scales keep it equal to the serial
        window loop (up to XLA reduction-retiling ulp)."""
        from mobilesuperresolution_tpu.parallel import make_mesh
        from mobilesuperresolution_tpu.parallel.temporal import chunked_vsr_apply

        t, h, w = 11, 8, 8
        m = get_vsr_model("basic", scale=2, quantized=True)
        x = jnp.asarray(rng.random((1, t, h, w, 3)), jnp.float32)
        params = m.init(jax.random.key(0), x, h * 2, w * 2)
        fwd = jax.jit(
            lambda xx, oh, ow: m.apply(params, xx, oh, ow), static_argnums=(1, 2)
        )
        serial = chunked_vsr_apply(fwd, x, h * 2, w * 2, chunk=2, overlap=2)
        sharded = chunked_vsr_apply(
            fwd, x, h * 2, w * 2, chunk=2, overlap=2, mesh=make_mesh(data=8)
        )
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(serial), atol=1e-5
        )

    def test_train_cli_rejects_quantize(self, tmp_path):
        from mobilesuperresolution_tpu.cli import train_vsr

        with pytest.raises(SystemExit, match="inference-only"):
            train_vsr.main([
                "--job_dir", str(tmp_path), "--dataset", "synthetic_vsr",
                "--quantize", "int8",
            ])
