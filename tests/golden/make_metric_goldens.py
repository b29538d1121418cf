"""Generate independent float64 metric goldens (run once; output checked in).

The SSIM recipe parity anchor: the reference computes SSIM via
skimage.metrics.structural_similarity (/root/reference/common/metrics.py:41-68)
with win_size=11, gaussian_weights=True, data_range=1.0, K1/K2=0.01/0.03,
sigma=1.5. skimage is not installed here, so this script re-implements
skimage's EXACT code path from scratch in torch float64 — scipy-style
gaussian kernel (radius = int(truncate*sigma + 0.5), truncate=3.5),
axis-sequential correlation with edge padding, crop(pad) with
pad=(win_size-1)//2, sample covariance cov_norm = NP/(NP-1), explicit
data_range — entirely independent of mobilesuperresolution_tpu/metrics.

PSNR and PSNR-Y goldens follow the reference's torch code literally
(common/metrics.py:10-38), including the PSNR-Y quirk of projecting the
UN-quantized clamped SR.

Inputs are regenerated deterministically at test time (seeded
np.random.default_rng is platform-stable); only the golden scalars are
stored in metric_goldens.npz.

Usage: python tests/golden/make_metric_goldens.py
"""

import os

import numpy as np
import torch


# --------------------------------------------------------------------------
# scipy.ndimage._gaussian_kernel1d, re-derived (order 0)
def gaussian_kernel1d(sigma, radius):
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    return phi / phi.sum()


def gaussian_filter_2d(img, sigma=1.5, truncate=3.5):
    """scipy.ndimage.gaussian_filter on a 2-D float64 array: the 1-D kernel
    applied sequentially per axis with edge padding. The edge mode is
    irrelevant to the final SSIM because crop(pad) removes every pixel whose
    window touches the border (pad == kernel radius)."""
    radius = int(truncate * sigma + 0.5)
    k = torch.from_numpy(gaussian_kernel1d(sigma, radius))  # symmetric
    t = torch.from_numpy(np.ascontiguousarray(img))[None, None]  # (1,1,H,W)
    t = torch.nn.functional.pad(t, (0, 0, radius, radius), mode="replicate")
    t = torch.nn.functional.conv2d(t, k.view(1, 1, -1, 1))
    t = torch.nn.functional.pad(t, (radius, radius, 0, 0), mode="replicate")
    t = torch.nn.functional.conv2d(t, k.view(1, 1, 1, -1))
    return t[0, 0].numpy()


def crop(arr, pad):
    return arr[pad:-pad, pad:-pad]


def structural_similarity_from_scratch(
    im1, im2, win_size=11, data_range=1.0, K1=0.01, K2=0.03, sigma=1.5
):
    """skimage.metrics.structural_similarity, gaussian_weights=True path,
    use_sample_covariance=True, written from its published algorithm."""
    im1 = np.asarray(im1, np.float64)
    im2 = np.asarray(im2, np.float64)
    NP = win_size * win_size
    cov_norm = NP / (NP - 1)
    f = gaussian_filter_2d
    ux = f(im1, sigma)
    uy = f(im2, sigma)
    uxx = f(im1 * im1, sigma)
    uyy = f(im2 * im2, sigma)
    uxy = f(im1 * im2, sigma)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux * ux + uy * uy + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    pad = (win_size - 1) // 2
    return crop(S, pad).mean(dtype=np.float64)


# --------------------------------------------------------------------------
# the reference's metric wrappers, literally (common/metrics.py; NCHW torch)
def ref_psnr(sr, hr, shave=4):
    sr = sr.to(hr.dtype)
    sr = (sr * 255).round().clamp(0, 255) / 255
    sr = sr.clamp(0, 1)
    diff = sr - hr
    if shave:
        diff = diff[..., shave:-shave, shave:-shave]
    mse = diff.pow(2).mean([-3, -2, -1])
    return float((-10 * mse.log10()).sum())


def ref_psnr_y(sr, hr, shave=4):
    sr = sr.to(hr.dtype)
    _ = (sr * 255).round().clamp(0, 255) / 255  # computed, unused (quirk)
    sr = sr.clamp(0, 1)
    diff = sr - hr
    if diff.shape[1] == 3:
        filters = torch.tensor([0.257, 0.504, 0.098], dtype=diff.dtype)
        diff = torch.nn.functional.conv2d(diff, filters.view([1, -1, 1, 1]))
    if shave:
        diff = diff[..., shave:-shave, shave:-shave]
    mse = diff.pow(2).mean([-3, -2, -1])
    return float((-10 * mse.log10()).sum())


def ref_ssim(X, Y, shave=4):
    X = X.to(Y.dtype)
    X = (X * 255).round().clamp(0, 255) / 255
    gray_coeffs = [65.738, 129.057, 25.064]
    convert = X.new_tensor(gray_coeffs).view(1, 3, 1, 1) / 256
    Xg = X.mul(convert).sum(dim=1)
    Yg = Y.mul(convert).sum(dim=1)
    Xg = Xg[..., shave:-shave, shave:-shave].squeeze().numpy().astype(np.float64)
    Yg = Yg[..., shave:-shave, shave:-shave].squeeze().numpy().astype(np.float64)
    return float(
        structural_similarity_from_scratch(
            Xg, Yg, win_size=11, data_range=1.0, K1=0.01, K2=0.03, sigma=1.5
        )
    )


# --------------------------------------------------------------------------
def make_pairs():
    """Deterministic natural-ish (sr, hr) pairs in [0,1], NHWC float32.
    Regenerated identically by the test."""
    pairs = {}
    rng = np.random.default_rng(1234)
    for name, (h, w) in {"a": (37, 53), "b": (64, 64), "c": (48, 41)}.items():
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        base = (
            0.5
            + 0.25 * np.sin(2 * np.pi * xx / 17.0)
            + 0.2 * np.cos(2 * np.pi * yy / 11.0)
        )
        hr = np.stack(
            [
                np.clip(base + 0.05 * rng.standard_normal((h, w)), 0, 1),
                np.clip(0.9 * base + 0.05, 0, 1),
                np.clip(base**1.5, 0, 1),
            ],
            axis=-1,
        )
        noise = 0.03 * rng.standard_normal(hr.shape)
        sr = np.clip(hr + noise, 0, 1)
        pairs[name] = (sr.astype(np.float32), hr.astype(np.float32))
    return pairs


def main():
    out = {}
    for name, (sr, hr) in make_pairs().items():
        # NHWC float32 -> NCHW float64 torch (the reference's layout)
        sr_t = torch.from_numpy(sr.astype(np.float64)).permute(2, 0, 1)[None]
        hr_t = torch.from_numpy(hr.astype(np.float64)).permute(2, 0, 1)[None]
        for shave in (4, 8):
            out[f"{name}_psnr_s{shave}"] = ref_psnr(sr_t, hr_t, shave)
            out[f"{name}_psnr_y_s{shave}"] = ref_psnr_y(sr_t, hr_t, shave)
            out[f"{name}_ssim_s{shave}"] = ref_ssim(sr_t, hr_t, shave)
    path = os.path.join(os.path.dirname(__file__), "metric_goldens.npz")
    np.savez(path, **{k: np.float64(v) for k, v in out.items()})
    print(f"wrote {len(out)} goldens -> {path}")
    for k in sorted(out):
        print(f"  {k} = {out[k]:.10f}")


if __name__ == "__main__":
    main()
