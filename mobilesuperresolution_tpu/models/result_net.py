"""Discrete searched SISR model rebuilt from the ``block_index.txt`` artifact.

Reference: models/result_net.py:30-117. Per searched block [IN, split, kernel]:
the first IN−split channels pass through, the last ``split`` channels go
through a residual conv (conv k → ReLU) — expressed here as a static channel
slice + concat, which XLA compiles to views.

Faithful quirks kept: the forward subtracts image_mean but never adds it back
(result_net.py:89-93), and the per-block Conv_sep is a single conv+ReLU (not
the supernet's two-conv form).
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mobilesuperresolution_tpu.nas.artifact import read_block_index
from mobilesuperresolution_tpu.ops.layers import WNConv, depth_to_space


class _SplitConvBlock(nn.Module):
    channels_in: int
    split: int
    kernel_size: int
    quantized: bool = False  # int8 dynamic-range convs (ops/quant.py)

    @nn.compact
    def __call__(self, x):
        passthrough = self.channels_in - self.split
        if passthrough > 0:
            x1, x2 = x[..., :passthrough], x[..., passthrough:]
        else:
            x1, x2 = None, x
        y = WNConv(self.split, self.kernel_size, g_init=None,
                   quantized=self.quantized)(x2)
        y = nn.relu(y)
        x2 = y + x2
        if x1 is not None:
            x2 = jnp.concatenate([x1, x2], axis=-1)
        return x2


class ResultNet(nn.Module):
    """idx: sequence of (IN, split, kernel) triples — the final line of
    block_index.txt (see nas/artifact.py)."""

    scale: int
    idx: Tuple[Tuple[int, int, int], ...]
    image_mean: float = 0.5
    compute_dtype: Any = jnp.float32
    # int8 dynamic-range inference convs (ops/quant.py) — this searched net
    # is exactly what the reference deploys as int8 TFLite; inference-only.
    quantized: bool = False

    @classmethod
    def from_artifact(cls, path, scale, **kw):
        _, width = read_block_index(path)
        return cls(scale=scale, idx=tuple(tuple(b) for b in width), **kw)

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        x = x.astype(self.compute_dtype) - jnp.asarray(
            self.image_mean, self.compute_dtype
        )
        num_outputs = self.scale * self.scale * 3
        ch = self.idx[0][0]
        q = self.quantized
        y = WNConv(ch, 3, g_init=None, name="head", quantized=q)(x)
        for i, (cin, split, kernel) in enumerate(self.idx):
            y = _SplitConvBlock(cin, split, kernel, quantized=q,
                                name=f"block_{i}")(y)
        y = WNConv(num_outputs, 3, g_init=None, name="tail", quantized=q)(y)
        y = y + WNConv(num_outputs, 5, g_init=None, name="skip", quantized=q)(x)
        if self.scale > 1:
            y = depth_to_space(y, self.scale)
        # reference never re-adds image_mean here (result_net.py:89-93)
        return y.astype(in_dtype)
