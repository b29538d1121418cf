"""Motion-vector VSR: BasicVSR where flows come free from the codec bitstream.

Reference: models/mvvsr_arch.py:11-109. Input is (B, T, H, W, 5) = RGB + 2
motion-vector channels; flows_forward = mv[:, 1:], flows_backward = -forward
(mvvsr_arch.py:63-67). A SpyNet is constructed in the reference but bypassed;
we simply omit it (no dead parameters). Reconstruction is the working
2nf→3 ConvTranspose form (mvvsr_arch.py:37,96-104).
"""

import flax.linen as nn
import jax.numpy as jnp

from mobilesuperresolution_tpu.models.basicvsr import BasicVSRBase, lrelu
from mobilesuperresolution_tpu.ops.layers import PlainConv, SubpixelConvTranspose
from mobilesuperresolution_tpu.ops.resize import resize_bilinear


class MotionVectorVSR(BasicVSRBase):
    num_feat: int = 20
    num_block: int = 8

    @nn.compact
    def __call__(self, x_mv, height=1080, width=1920):
        in_dtype = x_mv.dtype
        x_mv = x_mv.astype(self.compute_dtype)
        x = x_mv[..., :3]
        mv = x_mv[..., 3:5]
        b, t, h, w, c = x.shape

        # flows from the bitstream, time-major (T-1, B, H, W, 2)
        ff = jnp.moveaxis(mv[:, 1:], 1, 0)
        fb = -ff
        out_b, out_f = self._propagate(x, ff, fb)

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
