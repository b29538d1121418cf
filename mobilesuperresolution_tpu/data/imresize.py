"""MATLAB-exact bicubic resize (antialiased), host (numpy/float64) and on-device
(JAX, precomputed gather+matmul) implementations.

This is the degradation model of the whole framework: LR training inputs are
produced by bicubic-downscaling HR images with *this* kernel, so PSNR parity
with the reference depends on reproducing it exactly
(reference: third_party/matlab_imresize/imresize.py:21-136).

Algorithm (standard MATLAB ``imresize``):
- cubic kernel a=-0.5 variant: f(x) = 1.5|x|^3 - 2.5|x|^2 + 1 on |x|<=1,
  -0.5|x|^3 + 2.5|x|^2 - 4|x| + 2 on 1<|x|<=2.
- On downscale the kernel is widened by 1/scale (antialiasing) and scaled.
- Sample positions u = (x+1)/scale + 0.5*(1 - 1/scale) for output pixel x
  (0-based), window of ceil(kernel_width)+2 taps, weights normalized to sum 1.
- Out-of-range taps are mirrored symmetrically (edge-inclusive reflection).
- Dimensions are processed in order of increasing scale; a uint8 input is
  rounded and clipped to uint8 after *each* dimension pass (this intermediate
  quantization is part of the parity contract).

On TPU, resizing with fixed (in, out) sizes is two small dense matmuls
(out = W_rows @ img @ W_cols^T) which XLA maps straight onto the MXU — no
gather needed, because the precomputed weight matrices already encode the
mirrored indices.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def cubic(x):
    x = np.asarray(x, dtype=np.float64)
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    f = (1.5 * ax3 - 2.5 * ax2 + 1.0) * (ax <= 1) + (
        -0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0
    ) * ((ax > 1) & (ax <= 2))
    return f


def contributions(in_length, out_length, scale):
    """Per-output-pixel tap weights and (mirrored) source indices.

    Returns (weights [out, P], indices [out, P]) float64/int32.
    """
    kernel_width = 4.0
    if scale < 1.0:
        h = lambda x: scale * cubic(scale * x)
        kernel_width = kernel_width / scale
    else:
        h = cubic
    x = np.arange(1, out_length + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1.0 - 1.0 / scale)
    left = np.floor(u - kernel_width / 2.0)
    P = int(math.ceil(kernel_width)) + 2
    ind = left[:, None] + np.arange(P, dtype=np.float64) - 1.0
    indices = ind.astype(np.int64)
    weights = h(u[:, None] - indices.astype(np.float64) - 1.0)
    weights = weights / weights.sum(axis=1, keepdims=True)
    # Mirror out-of-range indices (edge-inclusive symmetric reflection).
    aux = np.concatenate(
        [np.arange(in_length), np.arange(in_length - 1, -1, -1)]
    ).astype(np.int64)
    indices = aux[np.mod(indices, aux.size)]
    # Drop taps whose weight is zero for every output pixel.
    keep = np.nonzero(np.any(weights != 0, axis=0))[0]
    return weights[:, keep], indices[:, keep].astype(np.int32)


def resize_matrix(in_length, out_length, scale=None, dtype=np.float64):
    """Dense (out, in) resize matrix — scatter the tap weights into a matrix so
    the per-dimension resize becomes one matmul (the TPU-friendly form)."""
    if scale is None:
        scale = out_length / in_length
    w, idx = contributions(in_length, out_length, scale)
    m = np.zeros((out_length, in_length), dtype=np.float64)
    for p in range(w.shape[1]):
        np.add.at(m, (np.arange(out_length), idx[:, p]), w[:, p])
    return m.astype(dtype)


def derive_size_from_scale(shape, scale):
    return [int(math.ceil(scale * shape[k])) for k in range(2)]


def _resize_along_dim_np(img, dim, weights, indices):
    # img: (H, W, C) float64; gather taps along `dim` and reduce.
    if dim == 0:
        taps = img[indices]  # (out, P, W, C)
        out = np.einsum("op,opwc->owc", weights, taps.astype(np.float64))
    else:
        taps = img[:, indices]  # (H, out, P, C)
        out = np.einsum("op,hopc->hoc", weights, taps.astype(np.float64))
    return out


def imresize_np(I, scalar_scale=None, output_shape=None):
    """Host golden-path MATLAB-exact imresize.

    I: (H, W) or (H, W, C) uint8 or float. uint8 in → uint8 out with per-dim
    rounding; float in → float64 out (no clipping), exactly as MATLAB.
    """
    I = np.asarray(I)
    if scalar_scale is not None:
        scale = [float(scalar_scale)] * 2
        out_size = derive_size_from_scale(I.shape, float(scalar_scale))
    elif output_shape is not None:
        scale = [output_shape[k] / I.shape[k] for k in range(2)]
        out_size = list(output_shape)
    else:
        raise ValueError("need scalar_scale or output_shape")

    order = np.argsort(np.array(scale), kind="stable")
    wi = [contributions(I.shape[k], out_size[k], scale[k]) for k in range(2)]

    B = I
    was_2d = B.ndim == 2
    if was_2d:
        B = B[:, :, None]
    is_uint8 = I.dtype == np.uint8
    for k in range(2):
        dim = int(order[k])
        w, idx = wi[dim]
        B = _resize_along_dim_np(B.astype(np.float64), dim, w, idx)
        if is_uint8:
            B = np.around(np.clip(B, 0, 255)).astype(np.uint8)
    if was_2d:
        B = B[:, :, 0]
    return B


def convert_double_to_byte(I):
    return np.around(255.0 * np.clip(I, 0.0, 1.0)).astype(np.uint8)


# --------------------------------------------------------------------------
# On-device (JAX) path: resize as two dense matmuls with precomputed weights.
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=256)
def _plan(in_hw, out_hw, dtype_name):
    # NOTE: cache numpy (not jnp) — a jnp constant created inside a jit trace
    # would cache a tracer and leak out of the transformation.
    scales = [out_hw[k] / in_hw[k] for k in range(2)]
    order = tuple(int(o) for o in np.argsort(np.array(scales), kind="stable"))
    mats = tuple(
        resize_matrix(in_hw[k], out_hw[k], scales[k], dtype=dtype_name)
        for k in range(2)
    )
    return order, mats


def imresize_jax(img, out_hw, quantize_uint8=False, dtype=jnp.float32):
    """Resize (..., H, W, C) images on device with MATLAB-exact weights.

    If ``quantize_uint8`` the image is assumed to live on the 0..255 grid in
    [0,1] units and is re-quantized to that grid after each dimension pass,
    mirroring the reference's uint8 intermediate rounding
    (third_party/matlab_imresize/imresize.py:88-91).
    """
    in_hw = (img.shape[-3], img.shape[-2])
    order, mats = _plan(in_hw, tuple(out_hw), np.dtype(dtype).name)

    def q(x):
        return jnp.clip(jnp.round(x * 255.0), 0.0, 255.0) / 255.0

    x = img.astype(dtype)
    # precision=HIGHEST: true-f32 matmuls — the TPU default (bf16 passes) would
    # break the 1/255-exact degradation contract.
    hi = jax.lax.Precision.HIGHEST
    mats = tuple(jnp.asarray(m) for m in mats)
    for dim in order:
        m = mats[dim]
        if dim == 0:
            x = jnp.einsum("oh,...hwc->...owc", m, x, precision=hi)
        else:
            x = jnp.einsum("ow,...hwc->...hoc", m, x, precision=hi)
        if quantize_uint8:
            x = q(x)
    return x


def bicubic_downsample(hr, scale, quantize_uint8=True):
    """Bicubic degradation HR→LR on device (the training-data path).

    hr: (..., H, W, C) float in [0,1] on the 255 grid, H and W divisible by
    ``scale``.

    Exactness contract: matches `imresize_np(uint8_hr, 1/scale)` except at
    exact .5 rounding ties — at dyadic scales (1/2, 1/4) the bicubic weights
    are dyadic rationals, so ~0.1% of pixels land exactly on a .5 boundary in
    255-space and float32 cannot reproduce float64 tie-breaking; those pixels
    may differ by 1/255. Bit-exact degradation (for cached eval pairs) is the
    host path `imresize_np`.
    """
    h, w = hr.shape[-3], hr.shape[-2]
    return imresize_jax(hr, (h // scale, w // scale), quantize_uint8=quantize_uint8)
