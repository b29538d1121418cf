"""Dynamic-range int8 quantized convolution (opt-in inference path).

The reference's real mobile deployment runs int8 dynamic-range TFLite
(export_onnx.py -> onnx_tflite.py:1-10 -> TFLite converter; our
export/export.py reproduces that artifact). This module brings the same
numerics class on-TPU: per-output-channel symmetric int8 weights, per-sample
dynamic (computed from the live activation max) symmetric int8 activations,
int8xint8->int32 convolution on the MXU, float rescale. On v5e the int8 MXU
path has 2x the bf16 peak (394 vs 197 TOPS); the measured win on this
pipeline's own conv shapes is smaller — 1.31-1.37x on the large SpyNet/trunk
convs, 0.96x on the 24-ch trunk (lane/memory-bound, not FLOPs-bound;
DESIGN.md "negative results") — and warp gathers and resizes are untouched,
so this path's primary value is DEPLOYMENT-NUMERICS PARITY (validating the
int8 quality class on-TPU), with a modest speed side-benefit at the larger
shapes.

Like ``--flow_downscale``, this is an opt-in speed/quality trade (off by
default; the headline bench keeps the exact path). Quality deltas are
quantified in DESIGN.md's approximation ladder.

Recipe notes (our deployment recipe, matching TFLite dynamic-range semantics
in spirit, not bit-exactly):
- weights: per-output-channel scale max|w|/127, round-to-nearest-even, no
  clipping needed (|q| <= 127 by construction);
- activations: PER-SAMPLE scale max|x_n|/127 computed on the fly (the
  "dynamic" in dynamic-range), round + clip to [-127, 127] — symmetric, so
  zero stays exactly zero (ReLU/zero-padding friendly). Per-sample rather
  than TFLite's per-tensor so quantization is BATCH-COMPOSITION-INVARIANT:
  a sample's scale depends only on that sample, so multi-stream serving,
  mesh-folded chunk windows, and any other batching produce the same
  numbers as running each sample alone (strictly finer than per-tensor; at
  TFLite's batch-1 deployment the two coincide);
- accumulation in int32, dequantize with the product of the two scales,
  bias added in float after dequantization (TFLite keeps float biases for
  dynamic-range kernels too).
"""

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quantize_symmetric(x, axis=None):
    """Symmetric int8 quantization. Returns (q, scale) with x ~= q * scale.

    axis=None: one per-tensor scale. axis=<int or tuple>: scale reduced over
    those axes KEPT as broadcastable dims (pass the axes to reduce over).
    Computation runs in float32 regardless of input dtype (bf16 has too few
    mantissa bits to place values between adjacent int8 steps reliably).
    """
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=axis, keepdims=axis is not None) / 127.0
    scale = jnp.maximum(scale, _EPS)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_kernel(kernel):
    """Per-output-channel int8 kernel. kernel: (kh, kw, ci, co) float.
    Returns (q int8, scale (co,) float32)."""
    q, scale = quantize_symmetric(kernel, axis=(0, 1, 2))
    return q, scale.reshape(-1)


def qconv2d(
    x,
    kernel,
    bias=None,
    strides=(1, 1),
    padding="SAME",
    dimension_numbers=("NHWC", "HWIO", "NHWC"),
    feature_group_count=1,
):
    """Dynamic-range int8 conv: quantize x per-sample and kernel per-output-
    channel, convolve int8xint8->int32 (MXU int8 path), dequantize to x.dtype.

    Drop-in for ``lax.conv_general_dilated(x, kernel, ...) + bias`` with the
    quantization error of one int8 dynamic-range layer (relative error
    ~0.4% of the sample max per operand).
    """
    out_dtype = x.dtype
    # per-sample scale (N,1,1,1): batch-composition-invariant (see module doc)
    xq, xs = quantize_symmetric(x, axis=(1, 2, 3))
    kq, ks = quantize_kernel(kernel)
    y = jax.lax.conv_general_dilated(
        xq,
        kq,
        strides,
        padding,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (xs * ks)  # broadcast (co,) over NHWC
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def conv2d_maybe_quantized(x, kernel, bias=None, quantized=False,
                           dimension_numbers=("NHWC", "HWIO", "NHWC")):
    """The models' conv call site: exact conv by default, int8 dynamic-range
    when ``quantized``. Keeps the exact path byte-identical to a raw
    ``lax.conv_general_dilated`` call (the headline bench goes through it)."""
    if quantized:
        return qconv2d(x, kernel, bias=bias, dimension_numbers=dimension_numbers)
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=dimension_numbers
    )
    if bias is not None:
        y = y + bias
    return y
