"""Shared eval harness — image and video branches with the reference's exact
accounting (reference: utils/estimate.py:23-133).

Semantics kept for parity:
- video (5-D output): shave=4 for psnr/psnr_y and the bilinear baseline;
  total count advances by T per clip; per-frame SR/bilinear/HR PNG dumps for
  VMAF scoring.
- image (4-D output): psnr shave=scale+6, psnr_y shave=scale, ssim
  shave=scale; bilinear baseline uses align_corners=True (:122) with
  shave=scale+6; count advances by batch.
- all metric functions return batch sums; the harness divides by the total at
  the end (common/metrics.py:19).
The reference's out-of-scope ``hr_each`` in the image-branch bilinear SSIM
(:129) is fixed to ``hr`` (one eval harness with clean adapters — SURVEY §7.4).
"""

import os
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from mobilesuperresolution_tpu.metrics import psnr, psnr_y, ssim, ssim_np
from mobilesuperresolution_tpu.ops.resize import resize_bilinear
from mobilesuperresolution_tpu.train.losses import charbonnier_loss


def _save_png(path, arr):
    """arr: (H, W, C) float [0,1]. PIL is present in the image; gate anyway."""
    try:
        from PIL import Image
    except ImportError:
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = np.asarray(np.clip(np.asarray(arr), 0, 1) * 255.0 + 0.5, dtype=np.uint8)
    Image.fromarray(img).save(path)


@dataclass
class EvalResult:
    psnr: float = 0.0
    psnr_y: float = 0.0
    ssim: float = 0.0
    bilinear_psnr: float = 0.0
    bilinear_ssim: float = 0.0
    loss: float = 0.0
    total: int = 0

    def as_tuple(self):
        """The reference's 6-tuple layout (utils/estimate.py:132), means."""
        t = max(self.total, 1)
        return (
            self.psnr / t,
            self.psnr_y / t,
            self.ssim / t,
            None,
            self.bilinear_psnr / t,
            self.bilinear_ssim / t,
        )

    def as_dict(self):
        t = max(self.total, 1)
        return {
            "PSNR": self.psnr / t,
            "PSNR_Y": self.psnr_y / t,
            "SSIM": self.ssim / t,
            "bilinear_PSNR": self.bilinear_psnr / t,
            "bilinear_SSIM": self.bilinear_ssim / t,
            "loss": self.loss / t,
        }


def evaluate(
    forward_fn,
    eval_batches,
    scale,
    job_dir=None,
    eval_data_name="eval",
    save=False,
    compute_ssim=True,
    ssim_on_host=False,
):
    """forward_fn(lr, out_h, out_w) -> sr (NHWC or NTHWC, [0,1] float).

    eval_batches yields (name, lr, hr) with lr (B,H,W,C) or (B,T,H,W,C).

    SSIM runs on-device by default (batched jit ``metrics.ssim`` — one XLA
    call per clip instead of a per-frame float64 host loop, ~40x less eval
    wall-clock on video sets). ``ssim_on_host=True`` selects the float64
    numpy golden path (``ssim_np``); the two agree to ~1e-5 SSIM on natural
    images (tests/test_eval_and_misc.py::TestOnDeviceSSIM).
    """
    res = EvalResult()

    def _ssim_sum(a, b, shave):
        if ssim_on_host:
            return float(
                sum(
                    ssim_np(np.asarray(ai), np.asarray(bi), shave=shave)
                    for ai, bi in zip(
                        np.asarray(a).reshape((-1,) + a.shape[-3:]),
                        np.asarray(b).reshape((-1,) + b.shape[-3:]),
                    )
                )
            )
        return float(ssim(a, b, shave=shave))
    for name, lr_in, hr in eval_batches:
        lr_in = jnp.asarray(lr_in)
        hr = jnp.asarray(hr)
        is_video = hr.ndim == 5
        out_h, out_w = hr.shape[-3], hr.shape[-2]
        sr = forward_fn(lr_in, out_h, out_w)
        if isinstance(sr, tuple):  # NAS models return (sr, speed)
            sr = sr[0]

        if is_video:
            b, t = hr.shape[:2]
            res.total += int(t) * int(b)
            baseline = resize_bilinear(lr_in, (out_h, out_w), align_corners=False)[
                ..., :3
            ]
            res.bilinear_psnr += float(psnr(baseline, hr, shave=4))
            res.psnr_y += float(psnr_y(sr, hr, shave=4))
            res.psnr += float(psnr(sr, hr, shave=4))
            res.loss += float(charbonnier_loss(sr, hr)) * t * b
            if compute_ssim:
                res.ssim += _ssim_sum(sr, hr, shave=4)
                res.bilinear_ssim += _ssim_sum(baseline, hr, shave=4)
            if save and job_dir is not None:
                for i in range(t):
                    base = f"{name}{i:03d}.png"
                    _save_png(
                        os.path.join(job_dir, "eval", eval_data_name, base), sr[0, i]
                    )
                    _save_png(
                        os.path.join(job_dir, "eval", "bilinear", base), baseline[0, i]
                    )
                    _save_png(os.path.join(job_dir, "eval", "hr", base), hr[0, i])
        else:
            b = hr.shape[0]
            res.total += int(b)
            res.loss += float(charbonnier_loss(sr, hr)) * b
            baseline = resize_bilinear(lr_in, (out_h, out_w), align_corners=True)[
                ..., :3
            ]
            res.psnr += float(psnr(sr, hr, shave=scale + 6))
            res.psnr_y += float(psnr_y(sr, hr, shave=scale))
            res.bilinear_psnr += float(psnr(baseline, hr, shave=scale + 6))
            if compute_ssim:
                res.ssim += _ssim_sum(sr, hr, shave=scale)
                res.bilinear_ssim += _ssim_sum(baseline, hr, shave=scale)
            if save and job_dir is not None:
                _save_png(
                    os.path.join(job_dir, "eval", eval_data_name, f"{name}.png"), sr[0]
                )
    return res
