"""BasicVSR-style bidirectional recurrent video SR.

Reference: models/basicvsr_arch.py (mobile-modified) and
models/basicvsr_arch_origin.py (faithful BasicVSR). TPU-native redesign:

- The two temporal recurrences run as ONE ``lax.scan`` (via ``nn.scan`` with
  broadcast params) with a resident ``feat_prop`` carry — O(1) memory in T and
  one compiled step regardless of clip length. The backward leg scans reversed
  time on the batch axis next to the forward leg, and the per-direction trunks
  execute as a single block-diagonal conv stack (see _DualTrunk).
- Both flow directions are computed in ONE batched SpyNet call
  (2·B·(T-1) images) instead of the reference's two sequential calls.
- The per-frame reconstruction (fusion → upsample → +base) has no temporal
  dependency, so it runs batched over B·T after the scans.
- The first step of each scan warps the all-zeros initial carry, which is a
  no-op — this replaces the reference's Python ``if i < n-1`` branch with
  branch-free code (warp(0, anything) = 0).

Mobile-modified reconstruction quirk: the reference's ``conv_last`` maps
2·nf → nf channels and then adds the 3-channel base
(models/basicvsr_arch.py:36,96-100), which cannot broadcast — its sibling
``mvvsr_arch.py:37`` maps 2·nf → 3. We use the working 2·nf → 3 convention for
both (SURVEY §7.4: emulate semantics, not bugs).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.models.spynet import (
    SpyNet,
    downscale_frames,
    flow_downscale_hw,
    upsample_flow,
)
from mobilesuperresolution_tpu.ops.layers import (
    PlainConv,
    SubpixelConvTranspose,
    torch_bias_init,
    torch_conv_init,
)
from mobilesuperresolution_tpu.ops.quant import conv2d_maybe_quantized
from mobilesuperresolution_tpu.ops.resize import resize_bilinear
from mobilesuperresolution_tpu.ops.warp import flow_warp


def lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class _DualTrunk(nn.Module):
    """Both directions' trunks (conv → lrelu → num_block residual blocks,
    basicvsr_arch.py:108-124) evaluated as ONE dense conv stack on
    channel-stacked input [backward | forward] with block-diagonal kernels.

    TPU rationale: at num_feat=24 a single-direction conv uses 24 of the
    MXU's 128 output lanes (~19%). Stacking the directions doubles the lanes
    for the same wall-clock-critical op count — measured ~1.4x over two
    separate scans on v5e (and half the sequential scan iterations). Grouped
    conv (feature_group_count=2) was measured 4x SLOWER than block-diagonal
    dense, and a vmap-stacked-kernel merged scan 2.5x slower end-to-end —
    XLA handles convolutions with batched kernel operands poorly."""

    num_feat: int
    num_block: int
    quantized: bool = False

    @nn.compact
    def __call__(self, y, row_mask=None):
        """row_mask: optional 0/1 mask broadcastable to (..., H, W, C),
        multiplied onto EVERY conv output (and assumed pre-applied to the
        input). Used by the spatially-sharded path (parallel/vsr_spatial.py)
        to reproduce full-frame 'SAME' zero padding at true image edges
        inside halo windows: full-frame padding re-zeroes out-of-image rows
        at every layer, while un-masked halo rows would accumulate
        bias/activation values (see parallel/halo.py's note)."""
        cin = y.shape[-1] // 2
        nf = self.num_feat
        dn = ("NHWC", "HWIO", "NHWC")

        def dual_conv(name, ci, co):
            ks, bs = [], []
            for d in ("backward", "forward"):
                ks.append(
                    self.param(f"{d}_{name}_kernel", torch_conv_init, (3, 3, ci, co))
                )
                bs.append(
                    self.param(f"{d}_{name}_bias", torch_bias_init(ci * 9), (co,))
                )
            k = jnp.zeros((3, 3, 2 * ci, 2 * co), y.dtype)
            k = k.at[:, :, :ci, :co].set(ks[0].astype(y.dtype))
            k = k.at[:, :, ci:, co:].set(ks[1].astype(y.dtype))
            b = jnp.concatenate(bs).astype(y.dtype)
            return k, b

        def conv(z, k, b):
            out = conv2d_maybe_quantized(
                z, k, b, quantized=self.quantized, dimension_numbers=dn
            )
            if row_mask is not None:
                out = out * row_mask.astype(out.dtype)
            return out

        k0, b0 = dual_conv("conv0", cin, nf)
        y = lrelu(conv(y, k0, b0))
        for i in range(self.num_block):
            k1, b1 = dual_conv(f"block{i}_conv1", nf, nf)
            k2, b2 = dual_conv(f"block{i}_conv2", nf, nf)
            z = nn.relu(conv(y, k1, b1))
            y = y + conv(z, k2, b2)
        return y


class _MergedPropagationStep(nn.Module):
    """One recurrence step for BOTH directions: warp each direction's carry by
    its own flow (direction-stacked on batch), then run both trunks as one
    block-diagonal conv stack (channel-stacked)."""

    num_feat: int
    num_block: int
    quantized: bool = False

    @nn.compact
    def __call__(self, feat_prop, xs):
        x_i, flow = xs  # (2B, H, W, C), (2B, H, W, 2)
        feat_prop = flow_warp(feat_prop, flow, padding_mode="zeros")
        b = feat_prop.shape[0] // 2
        inp = jnp.concatenate([x_i, feat_prop], axis=-1)  # (2B, H, W, C+nf)
        y = jnp.concatenate([inp[:b], inp[b:]], axis=-1)  # (B, .., 2(C+nf))
        y = _DualTrunk(
            self.num_feat, self.num_block, quantized=self.quantized, name="trunks"
        )(y)
        nf = self.num_feat
        feat = jnp.concatenate([y[..., :nf], y[..., nf:]], axis=0)  # (2B,..,nf)
        return feat, feat


def _scan_propagation(num_feat, num_block, remat=False, unroll=5, quantized=False):
    """remat=True recomputes each step's trunks in the backward pass instead
    of storing their activations — O(T) → O(1) activation memory in clip
    length, the standard trade for long-clip training (SURVEY §5.7).
    unroll: scan steps per loop iteration — lets XLA schedule across step
    boundaries (forced to 1 under remat, which needs the per-step
    checkpoint)."""
    step = nn.remat(_MergedPropagationStep) if remat else _MergedPropagationStep
    return nn.scan(
        step,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=0,
        out_axes=0,
        unroll=1 if remat else unroll,
    )(num_feat=num_feat, num_block=num_block, quantized=quantized,
      name="propagation")


def compute_flows(spynet_apply, x, flow_downscale=1, pair_hint=None):
    """Flow staging shared by ``BasicVSRBase._flows`` and the spatially-
    sharded forward (parallel/vsr_spatial.py) — ONE source of truth for the
    pair construction and the fb/ff split convention.

    x: (B, T, H, W, C) → (flows_forward, flows_backward), each
    (T-1, B, H, W, 2), both directions in one ``spynet_apply(ref, supp)``
    batch. ``pair_hint`` optionally maps (ref, supp) → (ref, supp) before the
    SpyNet call (the sharded path inserts a device placement hint there)."""
    b, t, h, w, c = x.shape
    fh, fw = flow_downscale_hw(h, w, flow_downscale)
    # resize the T frames once (not each of the 2(T-1) pair slots)
    xf = downscale_frames(x, fh, fw)
    x1 = xf[:, :-1].reshape(b * (t - 1), fh, fw, c)
    x2 = xf[:, 1:].reshape(b * (t - 1), fh, fw, c)
    ref = jnp.concatenate([x1, x2], axis=0)
    supp = jnp.concatenate([x2, x1], axis=0)
    if pair_hint is not None:
        ref, supp = pair_hint(ref, supp)
    flows = upsample_flow(spynet_apply(ref, supp), h, w)
    fb = flows[: b * (t - 1)].reshape(b, t - 1, h, w, 2)
    ff = flows[b * (t - 1) :].reshape(b, t - 1, h, w, 2)
    # time-major for scan
    return jnp.moveaxis(ff, 1, 0), jnp.moveaxis(fb, 1, 0)


def stack_directions(x, flows_forward, flows_backward):
    """Direction-stacked scan inputs shared by ``BasicVSRBase._propagate``
    and the spatially-sharded forward: the backward leg runs over reversed
    time next to the forward leg on the batch axis.

    x: (B, T, H, W, C) → frames (T, 2B, H, W, C) = [reversed | forward] and
    flows (T, 2B, H, W, 2) with a dummy zero flow prepended for the first
    step (it warps the all-zeros carry, a no-op) — built explicitly so T=1
    clips (empty flow sequence) scan."""
    b = x.shape[0]
    xt = jnp.moveaxis(x, 1, 0)  # (T, B, H, W, C)
    dummy = jnp.zeros((1, b) + xt.shape[2:4] + (2,), x.dtype)
    frames = jnp.concatenate([xt[::-1], xt], axis=1)
    flows = jnp.concatenate(
        [
            jnp.concatenate([dummy, flows_backward[::-1]], axis=0),
            jnp.concatenate([dummy, flows_forward], axis=0),
        ],
        axis=1,
    )
    return frames, flows


class BasicVSRBase(nn.Module):
    """Shared propagation machinery. Subclasses define the reconstruction."""

    num_feat: int = 64
    num_block: int = 15
    scale: int = 4
    compute_dtype: Any = jnp.float32
    remat: bool = False
    # >1: run SpyNet on 1/d-resolution frames and bilinearly upsample the
    # flow (values rescaled). SpyNet is ~60% of the 1080p x4 pipeline
    # (DESIGN.md) and its cost is quadratic in resolution, so d=2 removes
    # ~3/4 of it. Opt-in speed/quality trade — d=1 (default) is the exact
    # reference computation (basicvsr_arch.py:45-54).
    flow_downscale: int = 1
    # int8 dynamic-range quantized convs for SpyNet + propagation trunks
    # (ops/quant.py — the reference's TFLite deployment numerics on the TPU
    # int8 MXU path). Opt-in; off = exact reference computation. The
    # reconstruction convs stay float (small cost share, output-adjacent).
    quantized: bool = False
    # Training-only lever: stop gradients at the flow outputs. EXACT when
    # SpyNet is frozen (the reference's convention,
    # train_video_superresolution.py:160-163): flows depend only on the
    # input frames and the frozen SpyNet params, so no gradient path from
    # any TRAINABLE param passes through them — but without this flag JAX
    # still differentiates through the whole SpyNet pyramid to produce
    # cotangents the optax mask then zeroes. torch skips that backward
    # automatically via requires_grad=False; this flag is the jax
    # equivalent (measured: see DESIGN.md "Training attribution").
    stop_flow_grad: bool = False

    def _flows(self, x, flows=None):
        """x: (B, T, H, W, C) → (flows_forward, flows_backward), each
        (T-1, B, H, W, 2), both directions in one SpyNet batch.

        flows: optional precomputed ``(flows_forward, flows_backward)`` in
        that same time-major layout — used by the flow-reuse serving path
        (serve/flow_cache.py), where overlapping temporal windows share pair
        flows instead of recomputing SpyNet per window (SpyNet is ~60% of
        the pipeline, DESIGN.md). When given, SpyNet is skipped entirely
        (its params are simply not looked up by the trace)."""
        if flows is not None:
            ff, fb = flows
            return ff.astype(x.dtype), fb.astype(x.dtype)
        spynet = SpyNet(name="spynet", quantized=self.quantized)
        ff, fb = compute_flows(spynet, x, self.flow_downscale)
        if self.stop_flow_grad:
            ff, fb = jax.lax.stop_gradient((ff, fb))
        return ff, fb

    def _propagate(self, x, flows_forward, flows_backward):
        """Bidirectional propagation as ONE scan: the backward leg runs over
        reversed time and the forward leg over forward time, stacked on the
        batch axis, with block-diagonal dual trunks (see _DualTrunk). Step
        j>=1 of the backward leg processes frame i=T-1-j with
        flows_backward[i] (basicvsr_arch.py:70-74)."""
        b, t, h, w, _ = x.shape
        init = jnp.zeros((2 * b, h, w, self.num_feat), x.dtype)
        frames, flows = stack_directions(x, flows_forward, flows_backward)
        _, out = _scan_propagation(
            self.num_feat, self.num_block, self.remat, quantized=self.quantized
        )(init, (frames, flows))
        out_b = out[:, :b][::-1]  # back to forward time order
        out_f = out[:, b:]
        return jnp.moveaxis(out_b, 0, 1), jnp.moveaxis(out_f, 0, 1)


class BasicVSR(BasicVSRBase):
    """Mobile-modified BasicVSR (reference models/basicvsr_arch.py:10-105):
    fusion 1x1 (2nf→2nf) → lrelu → ConvTranspose(5, stride=scale) → bilinear
    resize to (H, W) → + bilinear base."""

    num_feat: int = 24
    num_block: int = 8

    @nn.compact
    def __call__(self, x, height=1080, width=1920, flows=None):
        in_dtype = x.dtype
        x = x.astype(self.compute_dtype)
        b, t, h, w, c = x.shape
        ff, fb = self._flows(x, flows)
        out_b, out_f = self._propagate(x, ff, fb)

        # reconstruction, batched over B*T
        feats = jnp.concatenate([out_b, out_f], axis=-1).reshape(
            b * t, h, w, 2 * self.num_feat
        )
        out = lrelu(PlainConv(2 * self.num_feat, 1, use_bias=True, name="fusion")(feats))
        out = SubpixelConvTranspose(
            3, kernel_size=5, stride=self.scale, name="conv_last"
        )(out, out_hw=(height, width), align_corners=False)
        base = resize_bilinear(
            x.reshape(b * t, h, w, c), (height, width), align_corners=False
        )
        out = out + base
        return out.reshape(b, t, height, width, c).astype(in_dtype)


class BasicVSROrigin(BasicVSRBase):
    """Faithful BasicVSR reconstruction (models/basicvsr_arch_origin.py:10-96):
    fusion 1x1 (2nf→nf) → 2x (conv + PixelShuffle(2) + lrelu) → conv_hr →
    conv_last → + 4x bilinear base → resize to (H, W)."""

    num_feat: int = 64
    num_block: int = 30

    @nn.compact
    def __call__(self, x, height=1080, width=1920, flows=None):
        from mobilesuperresolution_tpu.ops.layers import depth_to_space

        in_dtype = x.dtype
        x = x.astype(self.compute_dtype)
        b, t, h, w, c = x.shape
        ff, fb = self._flows(x, flows)
        out_b, out_f = self._propagate(x, ff, fb)

        feats = jnp.concatenate([out_b, out_f], axis=-1).reshape(
            b * t, h, w, 2 * self.num_feat
        )
        out = lrelu(PlainConv(self.num_feat, 1, name="fusion")(feats))
        out = lrelu(depth_to_space(PlainConv(self.num_feat * 4, 3, name="upconv1")(out), 2))
        out = lrelu(depth_to_space(PlainConv(64 * 4, 3, name="upconv2")(out), 2))
        out = lrelu(PlainConv(64, 3, name="conv_hr")(out))
        out = PlainConv(3, 3, name="conv_last")(out)
        base = resize_bilinear(
            x.reshape(b * t, h, w, c), (h * 4, w * 4), align_corners=False
        )
        out = out + base
        out = resize_bilinear(out, (height, width), align_corners=False)
        return out.reshape(b, t, height, width, c).astype(in_dtype)
