"""YUV420 planar → RGB conversion for the NEMO raw-frame pipeline.

Reference: datasets/yuv420_to_bgr.py:5-39 (cv2 upsample + merge + cvtColor →
interleaved BGR .raw files). Implemented here in pure numpy (BT.601 full-range,
matching cv2.COLOR_YUV2BGR) with an optional cv2 fast path; we store RGB order
since the TPU pipeline is RGB end-to-end (the reference's BGR rawfiles are
flipped on read in data/nemo.py).
"""

import os

import numpy as np


def yuv420_to_rgb(y, u, v):
    """y: (H, W) uint8; u, v: (H/2, W/2) uint8 → (H, W, 3) uint8 RGB."""
    h, w = y.shape
    u = u.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.float64) - 128.0
    v = v.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.float64) - 128.0
    yf = y.astype(np.float64)
    # BT.601 full-range (cv2 YUV2RGB coefficients)
    r = yf + 1.403 * v
    g = yf - 0.344 * u - 0.714 * v
    b = yf + 1.773 * u
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def convert_yuv_dir(src_dir, dst_dir, hw):
    """Convert per-frame .y/.u/.v planar files → interleaved .raw RGB files
    (the converter CLI of datasets/yuv420_to_bgr.py). Uses the native
    multithreaded core (native/loader.cc) when built — bit-identical output."""
    from mobilesuperresolution_tpu.data import native_loader

    h, w = hw
    os.makedirs(dst_dir, exist_ok=True)
    names = sorted(
        os.path.splitext(f)[0] for f in os.listdir(src_dir) if f.endswith(".y")
    )
    for name in names:
        y = np.fromfile(os.path.join(src_dir, name + ".y"), np.uint8).reshape(h, w)
        u = np.fromfile(os.path.join(src_dir, name + ".u"), np.uint8).reshape(
            h // 2, w // 2
        )
        v = np.fromfile(os.path.join(src_dir, name + ".v"), np.uint8).reshape(
            h // 2, w // 2
        )
        rgb = native_loader.yuv420_to_rgb(y, u, v)
        rgb.tofile(os.path.join(dst_dir, name + ".raw"))
    return len(names)
