"""Per-frame "single" video model — no temporal fusion; the baseline for
temporal-model comparisons.

Reference: models/single_image_model.py:20-108. Per frame: WN encoder 3→ch →
residual body (blocks of [conv k → ReLU → conv k] + identity, then a final
conv, all over the whole body residual) → ConvTranspose(ch→3, 5, stride=scale)
→ bilinear resize to (H, W). The reference defines but never uses a skip conv
and an img_upsample (single_image_model.py:70,88) — not reproduced.

TPU shape: frames batched as B·T through one compiled forward (the reference
loops frames in Python).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mobilesuperresolution_tpu.ops.layers import SubpixelConvTranspose, WNConv


class _DoubleConv(nn.Module):
    """Conv_sep(separate=False) in the reference: conv k → ReLU → conv k
    (single_image_model.py:151-156)."""

    features: int
    kernel_size: int
    quantized: bool = False  # int8 dynamic-range convs (ops/quant.py)

    @nn.compact
    def __call__(self, x):
        q = self.quantized
        x = WNConv(self.features, self.kernel_size, g_init=None, quantized=q)(x)
        x = nn.relu(x)
        x = WNConv(self.features, self.kernel_size, g_init=None, quantized=q)(x)
        return x


class SingleImageModel(nn.Module):
    scale: int = 4
    channel: int = 32
    blocks: int = 8
    kernel: int = 3
    compute_dtype: Any = jnp.float32
    # int8 dynamic-range inference convs (ops/quant.py); the sub-pixel
    # reconstruction stays float (output-adjacent). Inference-only.
    quantized: bool = False

    @nn.compact
    def __call__(self, x, height=1080, width=1920):
        in_dtype = x.dtype
        x = x.astype(self.compute_dtype)
        b, t, h, w, c = x.shape
        xf = x.reshape(b * t, h, w, c)

        q = self.quantized
        y = WNConv(self.channel, 3, g_init=None, name="encoder", quantized=q)(xf)
        z = y
        for i in range(self.blocks):
            z = _DoubleConv(self.channel, self.kernel, quantized=q,
                            name=f"block_{i}")(z) + z
        z = WNConv(self.channel, 3, g_init=None, name="body_tail", quantized=q)(z)
        y = z + y
        y = SubpixelConvTranspose(
            3, kernel_size=5, stride=self.scale, name="shuf"
        )(y, out_hw=(height, width), align_corners=False)
        return y.reshape(b, t, height, width, c).astype(in_dtype)
