"""SpyNet coarse-to-fine optical flow (reference: models/spynet_arch.py:10-96).

6-level pyramid: inputs are ImageNet-normalized, avg-pooled 5 times; at each
level a 5-conv 7x7 stack (8→32→64→32→16→2) refines a 2x-upsampled flow
(align_corners=True, flow doubled). Non-multiple-of-32 inputs are resized up
front (align_corners=False) and the flow rescaled back — all static-shape under
jit.

TPU notes: both flow directions of a clip are batched into ONE SpyNet call by
the VSR models (B·(T-1)·2 images per level) to keep the MXU busy; all convs
are NHWC.
"""

import math

import flax.linen as nn
import jax.numpy as jnp

from mobilesuperresolution_tpu.ops.layers import PlainConv
from mobilesuperresolution_tpu.ops.resize import avg_pool_2x2, replicate_pad_hw, resize_bilinear
from mobilesuperresolution_tpu.ops.warp import flow_warp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class SpyNetBasicModule(nn.Module):
    """conv7x7 stack 8→32→64→32→16→2 with ReLUs (spynet_arch.py:17-22)."""

    @nn.compact
    def __call__(self, x):
        for feats in (32, 64, 32, 16):
            x = nn.relu(PlainConv(feats, 7)(x))
        return PlainConv(2, 7)(x)


class SpyNet(nn.Module):
    """Returns flow (N, H, W, 2) with channel 0 = dx, 1 = dy, in input pixels."""

    levels: int = 6

    def _preprocess(self, x):
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        return (x - mean) / std

    @nn.compact
    def __call__(self, ref, supp):
        assert ref.shape == supp.shape
        n, h, w, _ = ref.shape
        h32 = int(math.ceil(h / 32.0) * 32)
        w32 = int(math.ceil(w / 32.0) * 32)
        ref_r = resize_bilinear(ref, (h32, w32), align_corners=False)
        supp_r = resize_bilinear(supp, (h32, w32), align_corners=False)

        # pyramid, finest last
        refs = [self._preprocess(ref_r)]
        supps = [self._preprocess(supp_r)]
        for _ in range(self.levels - 1):
            refs.insert(0, avg_pool_2x2(refs[0]))
            supps.insert(0, avg_pool_2x2(supps[0]))

        h0, w0 = refs[0].shape[1:3]
        flow = jnp.zeros((n, max(h0 // 2, 1), max(w0 // 2, 1), 2), ref.dtype)
        modules = [SpyNetBasicModule(name=f"level_{i}") for i in range(self.levels)]
        for level in range(self.levels):
            th, tw = refs[level].shape[1:3]
            up = (
                resize_bilinear(
                    flow,
                    (flow.shape[1] * 2, flow.shape[2] * 2),
                    align_corners=True,
                )
                * 2.0
            )
            # odd level sizes leave the 2x-upsampled flow one short —
            # replicate-pad like the reference (spynet_arch.py:67-70); crop
            # covers the degenerate 1x1 coarsest level of tiny test inputs.
            if up.shape[1] < th or up.shape[2] < tw:
                up = replicate_pad_hw(
                    up,
                    pad_bottom=max(th - up.shape[1], 0),
                    pad_right=max(tw - up.shape[2], 0),
                )
            up = up[:, :th, :tw]
            warped = flow_warp(supps[level], up, padding_mode="border")
            inp = jnp.concatenate([refs[level], warped, up], axis=-1)
            flow = modules[level](inp) + up

        flow = resize_bilinear(flow, (h, w), align_corners=False)
        scale = jnp.asarray([w / w32, h / h32], flow.dtype)
        return flow * scale
