"""Bilinear resize with exact PyTorch ``F.interpolate`` semantics, as dense
per-dimension matmuls (MXU-friendly, precomputed per (in, out) size).

The reference mixes both conventions:
- align_corners=True for SpyNet flow upsampling (models/spynet_arch.py:65)
- align_corners=False for frame resizes and the bilinear eval baseline
  (models/basicvsr_arch.py:98-99, utils/estimate.py)
"""

import functools

import jax.numpy as jnp
import numpy as np


def linear_resize_matrix(in_len, out_len, align_corners=False, dtype=np.float32):
    """(out, in) interpolation matrix matching torch's upsample_bilinear2d."""
    m = np.zeros((out_len, in_len), dtype=np.float64)
    if out_len == 1:
        if align_corners:
            m[0, 0] = 1.0  # torch: src index 0
        else:
            # torch: src = in/2 - 0.5 (the center), bilinear between the two
            # middle pixels for even in_len
            src = np.asarray([max(0.0, in_len / 2.0 - 0.5)])
            i0 = min(int(np.floor(src[0])), in_len - 1)
            i1 = min(i0 + 1, in_len - 1)
            w1 = float(src[0] - i0)
            m[0, i0] += 1.0 - w1
            m[0, i1] += w1
        return m.astype(dtype)
    dst = np.arange(out_len, dtype=np.float64)
    if align_corners:
        src = dst * (in_len - 1) / (out_len - 1)
    else:
        src = np.maximum(0.0, (dst + 0.5) * in_len / out_len - 0.5)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_len - 1)
    i1 = np.minimum(i0 + 1, in_len - 1)
    w1 = src - i0
    w0 = 1.0 - w1
    np.add.at(m, (np.arange(out_len), i0), w0)
    np.add.at(m, (np.arange(out_len), i1), w1)
    return m.astype(dtype)


@functools.lru_cache(maxsize=512)
def _matrices(in_hw, out_hw, align_corners, dtype_name):
    # NOTE: cache numpy (not jnp) — a jnp constant created inside a jit trace
    # would cache a tracer and leak out of the transformation.
    mh = linear_resize_matrix(in_hw[0], out_hw[0], align_corners, dtype=dtype_name)
    mw = linear_resize_matrix(in_hw[1], out_hw[1], align_corners, dtype=dtype_name)
    return mh, mw


def resize_bilinear(x, out_hw, align_corners=False, precision=None):
    """x: (..., H, W, C) → (..., out_h, out_w, C).

    precision None (default) resolves by dtype: true-f32 matmuls for f32
    inputs (torch-parity — the TPU default bf16 passes would drift ~1e-3),
    plain bf16 matmuls for bf16 inputs (the caller already chose reduced
    precision; 'highest' there would trigger slow multi-pass emulation)."""
    if precision is None:
        precision = "default" if x.dtype == jnp.bfloat16 else "highest"
    in_hw = (x.shape[-3], x.shape[-2])
    out_hw = tuple(int(s) for s in out_hw)
    if in_hw == out_hw:
        return x
    dtype_name = "float32" if x.dtype == jnp.bfloat16 else np.dtype(x.dtype).name
    mh, mw = _matrices(in_hw, out_hw, bool(align_corners), dtype_name)
    mh = jnp.asarray(mh, dtype=x.dtype)
    mw = jnp.asarray(mw, dtype=x.dtype)
    # Formulate each pass as ONE large matmul M @ (in_len, everything_else) so
    # the long fused dim is the matmul N dimension — an einsum batched over
    # (batch, h) with N=C(=3) runs at ~2% MXU efficiency.
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    oh, ow = out_hw
    # rows: (oh, h) @ (h, B*w*c)
    xr = jnp.moveaxis(x.reshape(-1, h, w, c), 1, 0).reshape(h, -1)
    xr = jnp.dot(mh, xr, precision=precision)
    x = jnp.moveaxis(xr.reshape(oh, -1, w, c), 0, 1)
    # cols: (ow, w) @ (w, B*oh*c)
    xc = jnp.moveaxis(x, 2, 0).reshape(w, -1)
    xc = jnp.dot(mw, xc, precision=precision)
    x = jnp.moveaxis(xc.reshape(ow, -1, oh, c), 0, 2)
    return x.reshape(*lead, oh, ow, c)


def avg_pool_2x2(x):
    """2x2 stride-2 average pool on (..., H, W, C) with even H, W (the SpyNet
    pyramid sizes are multiples of 32 so no padding ever occurs —
    count_include_pad is irrelevant)."""
    h, w = x.shape[-3], x.shape[-2]
    lead = x.shape[:-3]
    x = x.reshape(*lead, h // 2, 2, w // 2, 2, x.shape[-1])
    return x.mean(axis=(-4, -2))


def replicate_pad_hw(x, pad_bottom=0, pad_right=0):
    """Replicate-pad the spatial dims of (..., H, W, C)."""
    if pad_bottom:
        x = jnp.concatenate([x] + [x[..., -1:, :, :]] * pad_bottom, axis=-3)
    if pad_right:
        x = jnp.concatenate([x] + [x[..., :, -1:, :]] * pad_right, axis=-2)
    return x
