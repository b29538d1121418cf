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


class PlainConv(nn.Module):
    """Plain conv with torch-default init (for the VSR models, which do not use
    weight norm — models/basicvsr_arch.py)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x):
        fan_in = (x.shape[-1] // self.feature_group_count) * self.kernel_size**2
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


def depth_to_space(x, r):
    """PixelShuffle with torch channel ordering: in channel (c*r*r + i*r + j)
    → out pixel offset (i, j) of channel c. x: (..., H, W, C*r*r)."""
    return rearrange(x, "... h w (c i j) -> ... (h i) (w j) c", i=r, j=r)


def space_to_depth(x, r):
    return rearrange(x, "... (h i) (w j) c -> ... h w (c i j)", i=r, j=r)
