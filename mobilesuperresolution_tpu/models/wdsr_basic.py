"""Fixed WDSR-B baseline (the SISR pretrain target).

Reference: models/basic_wdsr_b.py:16-144. Architecture: weight-normed 3x3 head
→ N residual blocks (1x1 expand x6 g=2.0 → ReLU → 1x1 linear x0.84 g=2.0 → kxk
g=1/sqrt(N)) → 3x3 tail to scale²·C channels, plus a 5x5 skip conv from the
input, then PixelShuffle(scale).

TPU-native shape: NHWC, compute in ``compute_dtype`` (bfloat16 by default for
the MXU) with float32 params; the whole body is one fused XLA program — the 1x1
convs are plain matmuls over the channel (lane) dimension.
"""

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mobilesuperresolution_tpu.ops.layers import WNConv, depth_to_space


class BasicBlock(nn.Module):
    num_residual_units: int
    kernel_size: int = 3
    res_scale: float = 1.0
    expand: float = 6.0
    linear: float = 0.84
    quantized: bool = False  # int8 dynamic-range convs (ops/quant.py)

    @nn.compact
    def __call__(self, x):
        r = self.num_residual_units
        q = self.quantized
        y = WNConv(int(r * self.expand), 1, g_init=2.0, quantized=q)(x)
        y = nn.relu(y)
        y = WNConv(int(r * self.linear), 1, g_init=2.0, quantized=q)(y)
        y = WNConv(r, self.kernel_size, g_init=self.res_scale, quantized=q)(y)
        return x + y


class BasicModel(nn.Module):
    """WDSR-B ``BASIC_MODEL``."""

    num_blocks: int = 16
    num_residual_units: int = 24
    scale: int = 2
    num_channels: int = 3
    image_mean: float = 0.5
    compute_dtype: Any = jnp.float32
    # int8 dynamic-range inference convs (ops/quant.py) — the numerics class
    # of the reference's int8 TFLite deployment of this net, on the TPU int8
    # MXU path. Inference-only (round() kills gradients); same param tree.
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        x = x.astype(self.compute_dtype) - jnp.asarray(
            self.image_mean, self.compute_dtype
        )
        num_outputs = self.scale * self.scale * self.num_channels
        q = self.quantized
        y = WNConv(self.num_residual_units, 3, g_init=1.0, quantized=q)(x)
        res_scale = 1.0 / math.sqrt(self.num_blocks)
        for _ in range(self.num_blocks):
            y = BasicBlock(self.num_residual_units, 3, res_scale, quantized=q)(y)
        y = WNConv(num_outputs, 3, g_init=1.0, quantized=q)(y)
        if self.num_channels != num_outputs:
            y = y + WNConv(num_outputs, 5, g_init=1.0, quantized=q)(x)
        else:
            y = y + x
        if self.scale > 1:
            y = depth_to_space(y, self.scale)
        y = y + jnp.asarray(self.image_mean, self.compute_dtype)
        return y.astype(in_dtype)
