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


class TestSpyNetParity:
    """Full-module SpyNet parity: our flax pyramid (incl. the s2d fast path
    and the replicate-pad odd-level handling) vs a torch forward written
    from the reference semantics (spynet_arch.py:29-96), random weights."""

    def _torch_forward(self, weights, ref, supp):
        import torch
        import torch.nn.functional as F

        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        refs = [(ref - mean) / std]
        supps = [(supp - mean) / std]
        for _ in range(5):
            refs.insert(0, F.avg_pool2d(refs[0], 2, 2, count_include_pad=False))
            supps.insert(0, F.avg_pool2d(supps[0], 2, 2, count_include_pad=False))
        n = ref.shape[0]
        flow = torch.zeros(n, 2, refs[0].shape[2] // 2, refs[0].shape[3] // 2)
        for level in range(6):
            up = (
                F.interpolate(flow, scale_factor=2, mode="bilinear", align_corners=True)
                * 2.0
            )
            if up.shape[2] != refs[level].shape[2]:
                up = F.pad(up, [0, 0, 0, 1], mode="replicate")
            if up.shape[3] != refs[level].shape[3]:
                up = F.pad(up, [0, 1, 0, 0], mode="replicate")
            h, w = supps[level].shape[2:]
            gy, gx = torch.meshgrid(
                torch.arange(h).float(), torch.arange(w).float(), indexing="ij"
            )
            v = torch.stack((gx, gy), 2).unsqueeze(0) + up.permute(0, 2, 3, 1)
            vx = 2.0 * v[..., 0] / max(w - 1, 1) - 1.0
            vy = 2.0 * v[..., 1] / max(h - 1, 1) - 1.0
            warped = F.grid_sample(
                supps[level],
                torch.stack((vx, vy), 3),
                mode="bilinear",
                padding_mode="border",
                align_corners=True,
            )
            x = torch.cat([refs[level], warped, up], 1)
            for j in range(5):
                x = F.conv2d(x, weights[level][j][0], weights[level][j][1], padding=3)
                if j < 4:
                    x = F.relu(x)
            flow = x + up
        return flow

    def test_random_weight_parity(self):
        import torch

        from mobilesuperresolution_tpu.models.spynet import (
            _SPYNET_CHANNELS,
            SpyNet,
        )

        rng = np.random.default_rng(7)
        # 96x64: multiple of 32 (no input resize), coarsest level 3x2 (odd →
        # exercises the replicate-pad flow upsample AND the non-s2d module
        # path; finer even levels take the s2d path)
        ref = rng.random((2, 96, 64, 3)).astype(np.float32)
        supp = rng.random((2, 96, 64, 3)).astype(np.float32)

        t_weights, params = [], {}
        for level in range(6):
            lw, lp = [], {}
            for j, (cin, cout) in enumerate(_SPYNET_CHANNELS):
                w = (rng.standard_normal((cout, cin, 7, 7)) * 0.05).astype(np.float32)
                b = (rng.standard_normal((cout,)) * 0.05).astype(np.float32)
                lw.append((torch.from_numpy(w), torch.from_numpy(b)))
                lp[f"conv{j}_kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
                lp[f"conv{j}_bias"] = jnp.asarray(b)
            t_weights.append(lw)
            params[f"level_{level}"] = lp

        flow_torch = (
            self._torch_forward(
                t_weights,
                torch.from_numpy(ref.transpose(0, 3, 1, 2)),
                torch.from_numpy(supp.transpose(0, 3, 1, 2)),
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        flow_ours = np.asarray(
            SpyNet().apply({"params": params}, jnp.asarray(ref), jnp.asarray(supp))
        )
        assert flow_ours.shape == flow_torch.shape == (2, 96, 64, 2)
        np.testing.assert_allclose(flow_ours, flow_torch, atol=2e-4, rtol=1e-3)
