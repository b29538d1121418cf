"""Architecture-parity check against the reference's pretrained WDSR-B
checkpoint: the torch forward (re-derived from the state dict with plain torch
ops — weight-norm conv chain) and our flax BasicModel with converted weights
must produce the same SR image.

Skips when the reference checkpoint is unavailable.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from mobilesuperresolution_tpu.models.wdsr_basic import BasicModel
from mobilesuperresolution_tpu.train.torch_convert import load_reference_wdsr

CKPT = "/root/reference/models/pretrained_weights/wdsr_b_x2_8_24.pt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference checkpoint not available"
)


def _torch_forward(sd, x_nchw, image_mean=0.5):
    """WDSR-B forward from the raw state dict (weight-norm applied manually).
    Independent of the reference code — only torch ops."""
    import torch
    import torch.nn.functional as F

    def wn_conv(x, prefix, padding):
        v = sd[f"{prefix}.weight_v"]
        g = sd[f"{prefix}.weight_g"]
        b = sd[f"{prefix}.bias"]
        norm = v.flatten(1).norm(dim=1).view(-1, 1, 1, 1)
        w = g / norm * v
        return F.conv2d(x, w, b, padding=padding)

    x = x_nchw - image_mean
    y = wn_conv(x, "head", 1)
    i = 0
    while f"body.{i}.body.0.weight_v" in sd:
        z = wn_conv(y, f"body.{i}.body.0", 0)
        z = F.relu(z)
        z = wn_conv(z, f"body.{i}.body.2", 0)
        z = wn_conv(z, f"body.{i}.body.3", 1)
        y = y + z
        i += 1
    y = wn_conv(y, "tail", 1)
    y = y + wn_conv(x, "skip.0", 2)
    y = F.pixel_shuffle(y, 2)
    return y + image_mean


def test_pretrained_forward_parity():
    import torch

    sd = torch.load(CKPT, map_location="cpu")
    params, num_blocks, units = load_reference_wdsr(CKPT)
    assert num_blocks == 8 and units == 24

    rng = np.random.default_rng(0)
    x = rng.random((1, 24, 28, 3)).astype(np.float32)

    with torch.no_grad():
        want = (
            _torch_forward(sd, torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )

    model = BasicModel(num_blocks=num_blocks, num_residual_units=units, scale=2)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pretrained_sr_quality():
    """Converted pretrained weights must beat bicubic on a real SR task."""
    from mobilesuperresolution_tpu.data.imresize import imresize_np
    from mobilesuperresolution_tpu.data.synthetic import synthetic_image
    from mobilesuperresolution_tpu.metrics import psnr

    params, num_blocks, units = load_reference_wdsr(CKPT)
    model = BasicModel(num_blocks=num_blocks, num_residual_units=units, scale=2)

    hr_u8 = synthetic_image(7, (96, 96))
    lr = imresize_np(hr_u8, scalar_scale=0.5).astype(np.float32) / 255.0
    hr = hr_u8.astype(np.float32) / 255.0
    sr = model.apply({"params": params}, jnp.asarray(lr[None]))
    p_sr = float(psnr(sr, jnp.asarray(hr[None]), shave=8))
    bic = imresize_np(imresize_np(hr_u8, scalar_scale=0.5), scalar_scale=2.0)
    p_bic = float(
        psnr(jnp.asarray(bic[None].astype(np.float32) / 255.0), jnp.asarray(hr[None]), shave=8)
    )
    # trained SR must beat bicubic upscaling
    assert p_sr > p_bic, (p_sr, p_bic)
