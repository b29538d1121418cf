"""NAS-searched multi-frame VSR, v1: every block consumes temporal context.

Reference: models/naive_multi_model.py:33-150 (the earlier generation kept in
the repo alongside the 'easy' variant the entry points import). Per frame and
per block: x_warp = warp(previous frame's POST-BLOCK feature at this block,
forward flow) — frame 0 uses the current feature itself; the block input is
concat(x_warp, x) with 2·IN channels through [conv3 2IN→IN, conv3 IN→IN,
ReLU] plus a 1x1 skip 2IN→IN. Output = PixelShuffle(decode(feat) +
skip5x5(x - mean)) with NO bilinear base (unlike the easy variant).

TPU-native: this one is a true recurrence (per-block carried features) — a
``lax.scan`` over frames with carry (num_blocks, B, H, W, IN); the frame-0
"warp self" special case is a branch-free ``jnp.where`` on a per-step flag.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mobilesuperresolution_tpu.models.spynet import SpyNet
from mobilesuperresolution_tpu.nas.artifact import read_block_index
from mobilesuperresolution_tpu.ops.layers import PlainConv, WNConv, depth_to_space
from mobilesuperresolution_tpu.ops.warp import flow_warp


class _BlockV1(nn.Module):
    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x_cat):
        y = PlainConv(self.features, self.kernel_size)(x_cat)
        y = PlainConv(self.features, self.kernel_size)(y)
        y = nn.relu(y)
        return y + PlainConv(self.features, 1, name="skip")(x_cat)


class _FrameStepV1(nn.Module):
    idx: Tuple[Tuple[int, int, int], ...]
    channel: int
    image_mean: float
    scale: int

    @nn.compact
    def __call__(self, carry, xs):
        x_i, flow, is_first = xs  # (B,H,W,3), (B,H,W,2), scalar bool
        x_in = x_i - self.image_mean
        y = WNConv(self.channel, 3, g_init=None, name="encode")(x_in)
        new_feats = []
        for i, (cin, split, kernel) in enumerate(self.idx):
            warped = flow_warp(carry[i], flow, padding_mode="zeros")
            x_warp = jnp.where(is_first, y, warped)
            y = _BlockV1(self.channel, kernel, name=f"block_{i}")(
                jnp.concatenate([x_warp, y], axis=-1)
            )
            new_feats.append(y)
        num_outputs = self.scale * self.scale * 3
        out = WNConv(num_outputs, 3, g_init=None, name="decode")(y)
        out = out + WNConv(num_outputs, 5, g_init=None, name="skip")(x_in)
        out = depth_to_space(out, self.scale)
        return jnp.stack(new_feats), out


class NaiveMultiModelV1(nn.Module):
    scale: int
    idx: Tuple[Tuple[int, int, int], ...]
    compute_dtype: Any = jnp.float32

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

        x1 = x[:, :-1].reshape(b * (t - 1), h, w, c)
        x2 = x[:, 1:].reshape(b * (t - 1), h, w, c)
        ff = SpyNet(name="flownet")(x2, x1).reshape(b, t - 1, h, w, 2)
        ff = jnp.moveaxis(ff, 1, 0)  # (T-1, B, H, W, 2)
        flows = jnp.concatenate([jnp.zeros((1, b, h, w, 2), x.dtype), ff], axis=0)

        xt = jnp.moveaxis(x, 1, 0)
        is_first = jnp.asarray([True] + [False] * (t - 1))
        carry0 = jnp.zeros((len(self.idx), b, h, w, ch), x.dtype)
        step = nn.scan(
            _FrameStepV1,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(
            idx=self.idx,
            channel=ch,
            image_mean=0.5,
            scale=self.scale,
            name="frame_step",
        )
        _, outs = step(carry0, (xt, flows, is_first))  # (T, B, H*s, W*s, 3)
        return jnp.moveaxis(outs, 0, 1).astype(in_dtype)
