"""NAS-searched multi-frame VSR ("multi" type) — the variant actually used by
the VSR entry points.

Reference: models/naive_multi_model_easy.py:34-154. Per frame: WN encoder
3→ch; block 0 consumes temporal context — concat(flow, warped previous-frame
encoding, current encoding) with IN = 2·ch + 2 (naive_multi_model_easy.py:
62-74,124-140); later blocks are plain [conv k → ReLU → conv k]; every block
output is added residually to the running feature. Output = PixelShuffle(tail)
+ 4x-bilinear base (scale_factor=4 is hard-coded in the reference :142).

TPU-native observation: unlike BasicVSR, the temporal context here is only the
*previous frame's encoder output* — a value known for all frames after one
batched encoder pass. The model is therefore fully frame-parallel: encode all
B·T frames at once, warp the time-shifted encodings, and run the body batched
over B·T. No sequential scan, maximal MXU occupancy.

SpyNet is frozen in training (handled by the optimizer mask, not the model).
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.models.spynet import (
    SpyNet,
    downscale_frames,
    flow_downscale_hw,
    upsample_flow,
)
from mobilesuperresolution_tpu.nas.artifact import read_block_index
from mobilesuperresolution_tpu.ops.layers import PlainConv, WNConv, depth_to_space
from mobilesuperresolution_tpu.ops.resize import resize_bilinear
from mobilesuperresolution_tpu.ops.warp import flow_warp


class _PlainBlock(nn.Module):
    """conv k → ReLU → conv k (naive_multi_model_easy.py:157-183; its split
    logic and skip conv are dead code in the reference)."""

    features: int
    kernel_size: int
    quantized: bool = False  # int8 dynamic-range convs (ops/quant.py)

    @nn.compact
    def __call__(self, x):
        x = PlainConv(self.features, self.kernel_size,
                      quantized=self.quantized)(x)
        x = nn.relu(x)
        x = PlainConv(self.features, self.kernel_size,
                      quantized=self.quantized)(x)
        return x


class NaiveMultiModel(nn.Module):
    scale: int
    idx: Tuple[Tuple[int, int, int], ...]
    compute_dtype: Any = jnp.float32
    # >1: SpyNet on 1/d-res frames, flow upsampled with rescaled values —
    # same opt-in speed/quality trade as BasicVSRBase.flow_downscale.
    flow_downscale: int = 1
    # int8 dynamic-range inference convs (SpyNet + encoder + blocks + decode;
    # ops/quant.py). Inference-only.
    quantized: bool = False
    # Training-only: stop gradients at the flow outputs — EXACT because this
    # model's SpyNet is ALWAYS frozen (the reference sets requires_grad=False,
    # naive_multi_model_easy.py:48-49, which in torch skips the SpyNet
    # backward; this flag is the jax equivalent — models/basicvsr.py has the
    # full rationale).
    stop_flow_grad: bool = False

    @classmethod
    def from_artifact(cls, path, scale, **kw):
        _, width = read_block_index(path)
        return cls(scale=scale, idx=tuple(tuple(b) for b in width), **kw)

    @nn.compact
    def __call__(self, x, height=None, width=None):
        in_dtype = x.dtype
        x = x.astype(self.compute_dtype)
        b, t, h, w, c = x.shape
        ch = self.idx[0][0]

        # forward flows for all (t-1, t) pairs in one SpyNet batch
        fh, fw = flow_downscale_hw(h, w, self.flow_downscale)
        xf = downscale_frames(x, fh, fw)
        x1 = xf[:, :-1].reshape(b * (t - 1), fh, fw, c)
        x2 = xf[:, 1:].reshape(b * (t - 1), fh, fw, c)
        ff = upsample_flow(
            SpyNet(name="flownet", quantized=self.quantized)(x2, x1), h, w
        )
        if self.stop_flow_grad:
            ff = jax.lax.stop_gradient(ff)
        ff = ff.reshape(b, t - 1, h, w, 2)
        # frame 0: zero flow (naive_multi_model_easy.py:125-128); explicit
        # shape so T=1 clips work
        flows = jnp.concatenate([jnp.zeros((b, 1, h, w, 2), x.dtype), ff], axis=1)

        # one batched encoder pass over all frames
        enc = WNConv(ch, 3, g_init=None, name="encode",
                     quantized=self.quantized)(
            x.reshape(b * t, h, w, c)
        ).reshape(b, t, h, w, ch)
        # previous-frame encodings, frame 0 warps its own (warp(enc0, 0)=enc0)
        prev = jnp.concatenate([enc[:, :1], enc[:, :-1]], axis=1)
        x_warp = flow_warp(
            prev.reshape(b * t, h, w, ch), flows.reshape(b * t, h, w, 2)
        )

        y = enc.reshape(b * t, h, w, ch)
        for i, (cin, split, kernel) in enumerate(self.idx):
            if i == 0:
                x_c = jnp.concatenate([flows.reshape(b * t, h, w, 2), x_warp, y], -1)
            else:
                x_c = y
            y = _PlainBlock(ch, kernel, quantized=self.quantized,
                            name=f"block_{i}")(x_c) + y

        num_outputs = self.scale * self.scale * 3
        out = WNConv(num_outputs, 3, g_init=None, name="decode",
                     quantized=self.quantized)(y)
        out = depth_to_space(out, self.scale)
        base = resize_bilinear(
            x.reshape(b * t, h, w, c),
            (h * self.scale, w * self.scale),
            align_corners=False,
        )
        out = out + base
        oh, ow = out.shape[1:3]
        return out.reshape(b, t, oh, ow, c).astype(in_dtype)
