"""Evaluation metrics, numerically matching the reference recipes.

Reference: common/metrics.py:10-68. These exact formulas define eval parity:

- ``psnr``:   quantize SR to the 255 grid (round, clamp), shave a border, MSE per
  image over (H, W, C), ``-10*log10``; returns the **batch sum** (the caller
  divides by the total count — reference common/metrics.py:19).
- ``psnr_y``: the reference computes the 255-quantized copy but then (keeping its
  exact behavior, common/metrics.py:24-25) uses only ``clamp(0, 1)`` on the SR
  before the Y-channel projection with weights [0.257, 0.504, 0.098].
- ``ssim``:   SR quantized to 255 grid; both images projected to Y with
  [65.738, 129.057, 25.064]/256; border shaved; gaussian-weighted SSIM
  (win 11, sigma 1.5, K1=0.01, K2=0.03, data_range 1.0), matching
  skimage.metrics.structural_similarity with gaussian_weights=True.

All functions take NHWC float arrays in [0, 1] (TPU-native layout; the reference
uses NCHW).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_Y_WEIGHTS = (0.257, 0.504, 0.098)
_SSIM_GRAY = (65.738 / 256.0, 129.057 / 256.0, 25.064 / 256.0)


def _quantize(sr):
    return jnp.clip(jnp.round(sr * 255.0), 0.0, 255.0) / 255.0


def psnr(sr, hr, shave=4):
    """Batch-summed PSNR. sr/hr: (..., H, W, C) in [0,1]."""
    sr = _quantize(sr.astype(hr.dtype))
    sr = jnp.clip(sr, 0.0, 1.0)
    diff = sr - hr
    if shave:
        diff = diff[..., shave:-shave, shave:-shave, :]
    mse = jnp.mean(diff**2, axis=(-3, -2, -1))
    out = -10.0 * jnp.log10(mse)
    return jnp.sum(out)


def psnr_y(sr, hr, shave=4):
    """Batch-summed PSNR on the Y channel. Keeps the reference's exact
    (un-quantized, clamped) SR path — common/metrics.py:22-38."""
    sr = sr.astype(hr.dtype)
    sr = jnp.clip(sr, 0.0, 1.0)
    diff = sr - hr
    if diff.shape[-1] == 3:
        w = jnp.asarray(_Y_WEIGHTS, dtype=diff.dtype)
        diff = jnp.sum(diff * w, axis=-1, keepdims=True)
    if shave:
        diff = diff[..., shave:-shave, shave:-shave, :]
    mse = jnp.mean(diff**2, axis=(-3, -2, -1))
    out = -10.0 * jnp.log10(mse)
    return jnp.sum(out)


def _gaussian_kernel1d(sigma=1.5, radius=5):
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _to_y_pair(sr, hr, shave):
    """Quantize sr, project both to the SSIM gray channel, shave borders."""
    sr = _quantize(sr.astype(hr.dtype))
    w = jnp.asarray(_SSIM_GRAY, dtype=hr.dtype)
    x = jnp.sum(sr * w, axis=-1)
    y = jnp.sum(hr * w, axis=-1)
    if shave:
        x = x[..., shave:-shave, shave:-shave]
        y = y[..., shave:-shave, shave:-shave]
    return x, y


def _filter2_valid(img, kernel1d):
    """Separable 'valid' 2-D correlation on a (H, W) image, float64-equivalent
    math done in float32 under jit (use ssim_np for float64 parity checks)."""
    k = jnp.asarray(kernel1d, dtype=img.dtype)
    # rows
    img = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1, out_axes=1)(img)
    img = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"), in_axes=0, out_axes=0)(img)
    return img


def _ssim_map(x, y, kernel1d, k1=0.01, k2=0.03, data_range=1.0, win_size=11):
    """Float32-stable SSIM map, algebraically identical to the textbook form.

    The naive ``E[x^2] - E[x]^2`` moments cancel catastrophically in float32
    when sr ~= hr (values ~1, variances ~1e-6): window sums carry ~1e-7 ulp
    noise that lands directly on the tiny numerator/denominator gap and the
    mean SSIM can exceed 1 (observed 1.05 at PSNR ~57). Two exact rewrites
    remove the cancellation:

    - images are centered by a per-image scalar before the second moments
      (variance/covariance are shift-invariant), so products sit at the
      fluctuation scale instead of ~1;
    - the luminance/structure *gaps* are carried by the difference image:
      ``b1 - a1 = (ux - uy)^2`` and ``b2 - a2 = var(x - y)`` — both computed
      from ``d = x - y`` directly, so SSIM <= 1 holds by construction (up to
      one ulp of var(d)'s own arithmetic).
    """
    NP = win_size * win_size
    cov_norm = NP / (NP - 1)  # sample covariance, matching skimage default
    f = functools.partial(_filter2_valid, kernel1d=kernel1d)
    ux, uy = f(x), f(y)
    # center second moments at the joint mean: exact for (co)variances
    c = 0.5 * (jnp.mean(x) + jnp.mean(y))
    xc, yc = x - c, y - c
    vx = cov_norm * (f(xc * xc) - f(xc) * f(xc))
    vy = cov_norm * (f(yc * yc) - f(yc) * f(yc))
    # gap terms from the difference image (small where sr ~= hr)
    d = x - y
    ud = f(d)  # == ux - uy by linearity
    vd = cov_norm * (f(d * d) - ud * ud)  # == vx + vy - 2*vxy
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    a1 = b1 - ud * ud  # == 2*ux*uy + c1
    a2 = b2 - vd  # == 2*vxy + c2
    return (a1 * a2) / (b1 * b2)


def ssim(sr, hr, shave=4):
    """Gaussian-weighted SSIM on the Y channel. sr/hr: (..., H, W, C) in
    [0,1]; leading axes (batch, or batch+time for video) return the per-image
    SUM (the same accounting as ``psnr`` — callers divide by their own
    total). The 'valid' window means no boundary handling is needed (skimage
    crops the filter radius, which equals our shrinkage).

    Leading axes are vmapped — one fused XLA program per (H, W) shape instead
    of a per-frame host loop (the reference evals SSIM frame-by-frame on the
    CPU, utils/estimate.py:103-108; train/evaluate.py uses this batched form
    on-device)."""
    if sr.ndim == 3:
        x, y = _to_y_pair(sr, hr, shave)
        return jnp.mean(_ssim_map(x, y, _gaussian_kernel1d()))
    sr = sr.reshape((-1,) + sr.shape[-3:])
    hr = hr.reshape((-1,) + hr.shape[-3:])
    x, y = _to_y_pair(sr, hr, shave)
    maps = jax.vmap(lambda a, b: _ssim_map(a, b, _gaussian_kernel1d()))(x, y)
    return jnp.sum(jnp.mean(maps, axis=(-2, -1)))


def ssim_np(sr, hr, shave=4):
    """float64 numpy SSIM (host-side golden path for eval parity). Batched
    input returns the per-image SUM like ``ssim``."""
    sr = np.asarray(sr, dtype=np.float64)
    hr = np.asarray(hr, dtype=np.float64)
    if sr.ndim == 4:
        return float(sum(ssim_np(s, h, shave) for s, h in zip(sr, hr)))
    sr = np.clip(np.around(sr * 255.0), 0, 255) / 255.0
    w = np.asarray(_SSIM_GRAY, dtype=np.float64)
    x = (sr * w).sum(-1)
    y = (hr * w).sum(-1)
    if shave:
        x = x[shave:-shave, shave:-shave]
        y = y[shave:-shave, shave:-shave]
    k = _gaussian_kernel1d()

    def f(img):
        img = np.apply_along_axis(lambda c: np.convolve(c, k, mode="valid"), 0, img)
        img = np.apply_along_axis(lambda r: np.convolve(r, k, mode="valid"), 1, img)
        return img

    NP = 11 * 11
    cov_norm = NP / (NP - 1)
    ux, uy = f(x), f(y)
    vx = cov_norm * (f(x * x) - ux * ux)
    vy = cov_norm * (f(y * y) - uy * uy)
    vxy = cov_norm * (f(x * y) - ux * uy)
    c1, c2 = 0.01**2, 0.03**2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    return float(s.mean())
