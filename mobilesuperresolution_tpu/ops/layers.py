"""Flax layers: weight-normalized convolutions and depth↔space reshapes.

Weight norm matches torch.nn.utils.weight_norm(dim=0) on a conv: the effective
kernel is ``g[o] * v[..., o] / ||v[..., o]||`` with the norm taken over all
non-output axes. The reference initializes ``g`` to specific constants
(1.0 head/tail, 2.0 expand convs, res_scale for the last block conv —
models/basic_wdsr_b.py:40,115,136) which we reproduce via ``g_init``.

Layout: NHWC activations, HWIO kernels ('SAME' padding == torch's k//2 for the
odd kernels used everywhere in the reference).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

# Matches torch's Conv2d default kaiming_uniform(a=sqrt(5)):
# Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)).
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in):
    """torch's conv bias default: CENTERED Uniform(-1/sqrt(fan_in),
    +1/sqrt(fan_in)). (flax's nn.initializers.uniform samples [0, scale) —
    using it would bias every conv positive.)"""
    import jax

    bound = float(1.0 / np.sqrt(fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class WNConv(nn.Module):
    """Weight-normalized 2-D convolution.

    ``g_init=None`` initializes g to ||v|| per output channel so the initial
    effective kernel equals the raw init — the behavior of wrapping an existing
    torch conv in weight_norm without touching weight_g (used by the supernet's
    Conv_sep branches, reference models/wdsr_b.py:375-402).
    """

    features: int
    kernel_size: int = 3
    g_init: Optional[float] = 1.0
    use_bias: bool = True
    feature_group_count: int = 1
    # int8 dynamic-range inference path (ops/quant.py): quantizes the
    # weight-normalized effective kernel per-output-channel and the input
    # per-sample. Same params as the float path (quantization is in-graph).
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1] // self.feature_group_count
        k = self.kernel_size
        v = self.param("v", torch_conv_init, (k, k, in_ch, self.features), jnp.float32)
        if self.g_init is None:
            g_init_fn = lambda key, shape, dtype=jnp.float32: jnp.sqrt(
                jnp.sum(v * v, axis=(0, 1, 2))
            ).astype(dtype)
        else:
            g_init_fn = nn.initializers.constant(self.g_init)
        g = self.param("g", g_init_fn, (self.features,), jnp.float32)
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2)) + 1e-12)
        kernel = (g / norm) * v
        if self.quantized:
            from mobilesuperresolution_tpu.ops.quant import qconv2d

            y = qconv2d(
                x, kernel, feature_group_count=self.feature_group_count
            )
        else:
            y = nn.Conv(
                features=self.features,
                kernel_size=(k, k),
                padding="SAME",
                use_bias=False,
                feature_group_count=self.feature_group_count,
                dtype=x.dtype,
            ).apply({"params": {"kernel": kernel}}, x)
        if self.use_bias:
            b = self.param(
                "b", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + b.astype(y.dtype)
        return y


class _QConvParams(nn.Module):
    """int8 dynamic-range conv whose params mirror nn.Conv's ({kernel, bias},
    same shapes/inits) — PlainConv's quantized branch, scope-named "Conv_0"
    so float checkpoints load into the quantized model unchanged."""

    features: int
    kernel_size: int
    use_bias: bool
    feature_group_count: int

    @nn.compact
    def __call__(self, x):
        from mobilesuperresolution_tpu.ops.quant import qconv2d

        k = self.kernel_size
        in_ch = x.shape[-1] // self.feature_group_count
        fan_in = in_ch * k * k
        kernel = self.param(
            "kernel", torch_conv_init, (k, k, in_ch, self.features), jnp.float32
        )
        bias = (
            self.param("bias", torch_bias_init(fan_in), (self.features,),
                       jnp.float32)
            if self.use_bias
            else None
        )
        return qconv2d(
            x, kernel, bias=bias, feature_group_count=self.feature_group_count
        )


class PlainConv(nn.Module):
    """Plain conv with torch-default init (for the VSR models, which do not use
    weight norm — models/basicvsr_arch.py)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    feature_group_count: int = 1
    quantized: bool = False  # int8 dynamic-range inference path (ops/quant.py)

    @nn.compact
    def __call__(self, x):
        fan_in = (x.shape[-1] // self.feature_group_count) * self.kernel_size**2
        if self.quantized:
            # param holder named like nn.Conv's default scope so the tree is
            # IDENTICAL to the float path (checkpoints load unchanged)
            return _QConvParams(
                features=self.features,
                kernel_size=self.kernel_size,
                use_bias=self.use_bias,
                feature_group_count=self.feature_group_count,
                name="Conv_0",
            )(x)
        y = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            padding="SAME",
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_init=torch_conv_init,
            bias_init=torch_bias_init(fan_in) if self.use_bias else nn.initializers.zeros,
            dtype=x.dtype,
        )(x)
        return y


def subpixel_transpose_kernel(w, stride):
    """Rearrange a ConvTranspose kernel (K, K, Cin, Cout) into the equivalent
    sub-pixel conv kernel (M, M, Cin, Cout·s²), M = ceil(K/s).

    ConvTranspose VALID computes out[o] = Σ_i x[i]·W[K-1-(o-s·i)] (flax
    conv_transpose uses the un-mirrored kernel over the s-dilated input with
    K-1 padding). Writing o = s·a + p per phase p∈[0,s)² collapses it to an
    M-tap conv per phase; the phase kernels are this gather of W with zeros
    where p + s·m ≥ K. Output channels are ordered for ``depth_to_space``
    (c·s² + py·s + px)."""
    K = w.shape[0]
    cin, cout = w.shape[2], w.shape[3]
    s = stride
    M = -(-K // s)
    out = jnp.zeros((M, M, cin, cout, s, s), w.dtype)
    for ky in range(M):
        for kx in range(M):
            for py in range(s):
                for px in range(s):
                    a = py + s * (M - 1 - ky)
                    b = px + s * (M - 1 - kx)
                    if a < K and b < K:
                        out = out.at[ky, kx, :, :, py, px].set(
                            w[K - 1 - a, K - 1 - b]
                        )
    return out.reshape(M, M, cin, cout * s * s)


class SubpixelConvTranspose(nn.Module):
    """Drop-in for ``nn.ConvTranspose(features, (K, K), strides=(s, s),
    padding='VALID')`` — identical parameters (same names, shapes, and default
    initializers, so checkpoints interchange) and identical output, computed
    as a dense M×M conv at LOW resolution + depth_to_space + crop.

    TPU rationale: XLA lowers transposed conv to a conv over the s-dilated
    input — a mostly-zeros high-resolution conv. The sub-pixel form does the
    same MACs without the zeros (measured ~2x on the BasicVSR tail) and is
    the layout PixelShuffle-style mobile deployments use anyway."""

    features: int
    kernel_size: int = 5
    stride: int = 4
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, out_hw=None, align_corners=False):
        """out_hw=None: plain transpose output. out_hw=(oh, ow): the FUSED
        transpose+bilinear-resize path — equals
        ``resize_bilinear(self(x), out_hw, align_corners)`` but contracts the
        resize matrices directly over the conv's phase channels, so the
        depth_to_space lane→spatial transpose (measured ~12 ms on the 1080p
        BasicVSR tail, vs ~0.5 ms of actual conv math) never materializes."""
        K, s = self.kernel_size, self.stride
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (K, K, cin, self.features),
            jnp.float32,
        )
        M = -(-K // s)
        w = subpixel_transpose_kernel(kernel.astype(x.dtype), s)
        pad = ((M - 1, M), (M - 1, M))
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # flax VALID transpose output size: H*s + max(K-s, 0); positions past
        # the tap support (H-1)*s+K are zero, which the phase kernels produce.
        h, wd = x.shape[-3], x.shape[-2]
        ex = max(K - s, 0)
        th, tw = h * s + ex, wd * s + ex

        if out_hw is None:
            y = depth_to_space(y, s)[..., :th, :tw, :]
        else:
            from mobilesuperresolution_tpu.ops.resize import linear_resize_matrix

            oh, ow = int(out_hw[0]), int(out_hw[1])
            hc, wc = y.shape[-3], y.shape[-2]
            lead = y.shape[:-3]
            y = y.reshape(*lead, hc, wc, self.features, s, s)
            # phase-indexed resize matrices: RY[o, hc, i] = Ry[o, hc*s + i]
            # (zero past the crop), likewise RX — the d2s row/col permutation
            # and the crop are absorbed into the matmul operands.
            ry = np.zeros((oh, hc, s), np.float32)
            m = linear_resize_matrix(th, oh, align_corners)
            ry.reshape(oh, hc * s)[:, :th] = m
            rx = np.zeros((ow, wc, s), np.float32)
            m = linear_resize_matrix(tw, ow, align_corners)
            rx.reshape(ow, wc * s)[:, :tw] = m
            ry = jnp.asarray(ry, y.dtype)
            rx = jnp.asarray(rx, y.dtype)
            # precision mirrors resize_bilinear: true-f32 for f32 inputs,
            # plain bf16 matmuls when the caller already chose bf16
            prec = "default" if y.dtype == jnp.bfloat16 else "highest"
            y = jnp.einsum("ohi,...hwcij->...owcj", ry, y, precision=prec)
            y = jnp.einsum("pwj,...owcj->...opc", rx, y, precision=prec)

        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + b.astype(y.dtype)
        return y


def depth_to_space(x, r):
    """PixelShuffle with torch channel ordering: in channel (c*r*r + i*r + j)
    → out pixel offset (i, j) of channel c. x: (..., H, W, C*r*r)."""
    return rearrange(x, "... h w (c i j) -> ... (h i) (w j) c", i=r, j=r)


def space_to_depth(x, r):
    return rearrange(x, "... (h i) (w j) c -> ... h w (c i j)", i=r, j=r)
