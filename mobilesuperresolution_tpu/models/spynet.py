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
import jax
import jax.numpy as jnp
import numpy as np

from mobilesuperresolution_tpu.ops.layers import (
    depth_to_space,
    space_to_depth,
    torch_bias_init,
    torch_conv_init,
)
from mobilesuperresolution_tpu.ops.quant import conv2d_maybe_quantized
from mobilesuperresolution_tpu.ops.resize import avg_pool_2x2, replicate_pad_hw, resize_bilinear
from mobilesuperresolution_tpu.ops.s2d_conv import s2d_transform_weights
from mobilesuperresolution_tpu.ops.warp import flow_warp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

_SPYNET_CHANNELS = ((8, 32), (32, 64), (64, 32), (32, 16), (16, 2))


class SpyNetBasicModule(nn.Module):
    """conv7x7 stack 8→32→64→32→16→2 with ReLUs (spynet_arch.py:17-22).

    TPU fast path: on even-sized levels the whole stack runs in
    space-to-depth form — ONE s2d, five exact-transformed 5x5 convs at 4x
    channels / quarter spatial (4x lane utilization, ~2x fewer MACs), ONE d2s
    (ops/s2d_conv.py). ReLUs are elementwise so the rearrangement commutes.
    Falls back to direct 7x7 convs on odd sizes (tiny pyramid tops).
    """

    use_s2d: bool = True
    quantized: bool = False  # int8 dynamic-range convs (ops/quant.py)

    @nn.compact
    def __call__(self, x):
        kernels, biases = [], []
        for i, (cin, cout) in enumerate(_SPYNET_CHANNELS):
            kernels.append(
                self.param(f"conv{i}_kernel", torch_conv_init, (7, 7, cin, cout))
            )
            biases.append(
                self.param(f"conv{i}_bias", torch_bias_init(cin * 49), (cout,))
            )

        even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        dn = ("NHWC", "HWIO", "NHWC")
        if self.use_s2d and even:
            y = space_to_depth(x, 2)
            for i in range(5):
                w2 = s2d_transform_weights(kernels[i].astype(y.dtype))
                y = conv2d_maybe_quantized(
                    y, w2, jnp.repeat(biases[i].astype(y.dtype), 4),
                    quantized=self.quantized, dimension_numbers=dn,
                )
                if i < 4:
                    y = nn.relu(y)
            return depth_to_space(y, 2)
        y = x
        for i in range(5):
            y = conv2d_maybe_quantized(
                y, kernels[i].astype(y.dtype), biases[i].astype(y.dtype),
                quantized=self.quantized, dimension_numbers=dn,
            )
            if i < 4:
                y = nn.relu(y)
        return y


class SpyNet(nn.Module):
    """Returns flow (N, H, W, 2) with channel 0 = dx, 1 = dy, in input pixels."""

    levels: int = 6
    quantized: bool = False  # int8 dynamic-range convs in every BasicModule

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
        modules = [
            SpyNetBasicModule(quantized=self.quantized, name=f"level_{i}")
            for i in range(self.levels)
        ]
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


def flow_downscale_hw(h, w, d):
    """Flow-computation resolution for a 1/d SpyNet input downscale."""
    return (max(h // d, 1), max(w // d, 1)) if d > 1 else (h, w)


def downscale_frames(x, fh, fw):
    """(B, T, H, W, C) clip resized per frame to (fh, fw) for flow input."""
    b, t, h, w, c = x.shape
    if (fh, fw) == (h, w):
        return x
    return resize_bilinear(
        x.reshape(b * t, h, w, c), (fh, fw), align_corners=False
    ).reshape(b, t, fh, fw, c)


def upsample_flow(flow, h, w):
    """(..., fh, fw, 2) flow → (..., h, w, 2) with values rescaled — channel
    0 = dx scales with width, 1 = dy with height (the SpyNet convention,
    ops/warp.py). Shared by every flow_downscale model so the subtle scale
    vector lives in ONE place."""
    fh, fw = flow.shape[-3], flow.shape[-2]
    if (fh, fw) == (h, w):
        return flow
    flow = resize_bilinear(flow, (h, w), align_corners=False)
    return flow * jnp.asarray([w / fw, h / fh], flow.dtype)
