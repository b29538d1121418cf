"""Deployment export (reference: export_onnx.py + onnx_tflite.py).

The reference exports the searched net to ONNX opset 9 with input
1x3x360x540 (export_onnx.py:138-141) and converts ONNX→TF→TFLite. The
TPU-native toolchain is:
- StableHLO via ``jax.export`` — the portable compiler-IR artifact (the role
  ONNX plays in the reference),
- TFLite via jax2tf + the TF converter (gated on tensorflow being present)
  for the on-mobile path that closes the NAS loop.
Default export input is 360x540 like the reference (NHWC here).
"""


import jax
import jax.numpy as jnp
import numpy as np


def export_stablehlo(apply_fn, params, input_shape, path):
    """Serialize the forward to a StableHLO artifact at ``path`` (.bin)."""
    from jax import export as jax_export

    fn = lambda x: apply_fn({"params": params}, x)
    exported = jax_export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct(input_shape, jnp.float32)
    )
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def export_tflite(apply_fn, params, input_shape, path, quantize=False):
    """Convert the forward to a .tflite flatbuffer (CPU mobile deployment).

    quantize=True enables post-training dynamic-range quantization (int8
    weights) — the mobile-compiler role of the reference's parsed-but-unused
    clip_* quantization flags (models/__init__.py:22-29)."""
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(f"tensorflow/jax2tf unavailable: {e}")

    fn = lambda x: apply_fn({"params": params}, x)
    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False),
        input_signature=[tf.TensorSpec(input_shape, tf.float32)],
        autograph=False,
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()]
    )
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    if quantize:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
    blob = converter.convert()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def _wn_effective_kernel(p):
    """WNConv params {v, g, b} → (OIHW torch kernel, bias) with the
    weight-norm baked in — exactly ops/layers.WNConv's effective kernel
    (g/||v||)·v, so the exported convs are plain."""
    v = np.asarray(p["v"], np.float32)  # (k, k, in, out)
    g = np.asarray(p["g"], np.float32)
    norm = np.sqrt(np.sum(v * v, axis=(0, 1, 2)) + 1e-12)
    k = (g / norm) * v
    return np.transpose(k, (3, 2, 0, 1)).copy(), np.asarray(p["b"], np.float32)


def build_torch_result_net(model, params):
    """NCHW torch mirror of models.result_net.ResultNet with the given flax
    params baked in (weight norm folded into plain convs). Forward parity
    with the flax model is unit-tested (tests/test_pipeline_e2e.py)."""
    import torch
    from torch import nn as tnn

    idx = model.idx

    class _TorchResultNet(tnn.Module):
        def __init__(self):
            super().__init__()
            ch = idx[0][0]
            num_out = model.scale * model.scale * 3
            self.head = tnn.Conv2d(3, ch, 3, padding=1)
            self.blocks = tnn.ModuleList(
                tnn.Conv2d(split, split, k, padding=k // 2)
                for (_, split, k) in idx
            )
            self.tail = tnn.Conv2d(idx[-1][0], num_out, 3, padding=1)
            self.skip = tnn.Conv2d(3, num_out, 5, padding=2)
            self.shuffle = tnn.PixelShuffle(model.scale)

        def forward(self, x):
            x = x - model.image_mean
            y = self.head(x)
            for conv, (cin, split, _) in zip(self.blocks, idx):
                pt = cin - split
                x2 = y[:, pt:]
                x2 = torch.relu(conv(x2)) + x2
                y = torch.cat([y[:, :pt], x2], 1) if pt > 0 else x2
            y = self.tail(y) + self.skip(x)
            # reference never re-adds image_mean (result_net.py:89-93)
            return self.shuffle(y)

    m = _TorchResultNet()
    with torch.no_grad():
        for name, conv in [("head", m.head), ("tail", m.tail), ("skip", m.skip)]:
            kern, b = _wn_effective_kernel(params[name])
            conv.weight.copy_(torch.from_numpy(kern))
            conv.bias.copy_(torch.from_numpy(b))
        for i, conv in enumerate(m.blocks):
            kern, b = _wn_effective_kernel(params[f"block_{i}"]["WNConv_0"])
            conv.weight.copy_(torch.from_numpy(kern))
            conv.bias.copy_(torch.from_numpy(b))
    return m.eval()


def export_onnx(model, params, input_shape, path, opset=13):
    """Export the searched SISR net (ResultNet) to ONNX — the reference's
    interchange artifact class (export_onnx.py:117-141, itself a
    ``torch.onnx.export`` of the searched net, NCHW input).

    Why not jax2tf→tf2onnx: on current jax, jax2tf ALWAYS emits an
    XlaCallModule op (native serialization; the enable_xla=False /
    native_serialization=False graph modes are gone — verified on jax
    0.9.0), and tf2onnx has no handler for it. Instead the weights are
    baked into a plain-conv NCHW torch mirror (forward parity unit-tested)
    and exported with torch.onnx, exactly how the reference produced its
    artifact. Gated on the ``onnx`` package (torch serializes through it);
    input_shape is NHWC (N, H, W, C) like the rest of this module — the
    ONNX graph takes (N, C, H, W) like the reference's."""
    import torch

    mirror = build_torch_result_net(model, params)
    n, h, w, c = input_shape
    x = torch.zeros(n, c, h, w)
    try:
        torch.onnx.export(
            mirror, x, path, opset_version=opset, dynamo=False,
            input_names=["input"], output_names=["output"],
        )
    except Exception as e:
        if "onnx" in str(e).lower() and isinstance(
            e, (ImportError, ModuleNotFoundError)
        ) or "onnx is not installed" in str(e):
            raise RuntimeError(
                "the 'onnx' package is required for ONNX export (pip "
                f"install onnx in your deployment environment): {e}"
            ) from e
        raise
    return path
