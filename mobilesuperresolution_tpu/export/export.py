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


def export_onnx(apply_fn, params, input_shape, path, opset=13):
    """Convert the forward to an ONNX model (the reference's interchange
    artifact class — export_onnx.py:117-141 exports opset 9 for external
    consumers; opset 13 is the oldest release tf2onnx fully supports for
    the jax2tf-emitted graph).

    Path: jax2tf → tf.function → tf2onnx. Gated like TFLite: raises a clear
    RuntimeError naming the missing tool when tensorflow or tf2onnx is not
    installed (neither is baked into the TPU image; install tf2onnx in the
    deployment toolchain environment to use this)."""
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(f"tensorflow/jax2tf unavailable: {e}")
    try:
        import tf2onnx
    except ImportError as e:
        raise RuntimeError(
            "tf2onnx is required for ONNX export (pip install tf2onnx in "
            f"your deployment environment): {e}"
        )

    fn = lambda x: apply_fn({"params": params}, x)
    tf_fn = tf.function(
        jax2tf.convert(fn, with_gradient=False, enable_xla=False),
        input_signature=[tf.TensorSpec(input_shape, tf.float32, name="input")],
        autograph=False,
    )
    model_proto, _ = tf2onnx.convert.from_function(
        tf_fn,
        input_signature=[tf.TensorSpec(input_shape, tf.float32, name="input")],
        opset=opset,
        output_path=path,
    )
    return path
