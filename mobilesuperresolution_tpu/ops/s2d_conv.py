"""Space-to-depth convolution transform — the standard TPU optimization for
small-channel convolutions, applied to SpyNet's 7x7 stacks.

A 7x7 stride-1 SAME conv on (H, W, C) with C as small as 3-8 uses ~6% of the
TPU's 128 lanes. The exact identity

    conv7x7(x, W) == d2s( conv5x5( s2d(x), T(W) ) )

runs the same math on (H/2, W/2, 4C) with 4x the lane utilization AND fewer
mathematical FLOPs (25/49 taps x4 channel pairs ≈ 2.04x fewer MACs... taps:
4·25 vs 49 per output → 2.04x MORE taps but each at quarter spatial = net
25·4/49/4 = 25/49 of the work per output pixel grid).

T(W) places original tap W[2α+r−p, 2β+s−q] at transformed tap (α, β) from
input phase block (r, s) to output phase block (p, q), zero elsewhere.
Channel ordering matches ops.layers.space_to_depth ('(c i j)': ch = c·4+i·2+j).

Requires even H, W (all SpyNet pyramid levels after the /32 input resize when
h32/32 is even; callers fall back to the direct conv otherwise).
"""

import functools

import jax.numpy as jnp
import numpy as np

from mobilesuperresolution_tpu.ops.layers import depth_to_space, space_to_depth


@functools.lru_cache(maxsize=1)
def _scatter_tensor():
    """Constant M[a,b,r,s,p,q,u,v] = 1 iff transformed tap (a,b) of
    input-phase (r,s) → output-phase (p,q) reads original tap (u,v).
    (numpy, so it stays a compile-time constant under jit.)"""
    m = np.zeros((5, 5, 2, 2, 2, 2, 7, 7), np.float32)
    for a in range(5):
        for b in range(5):
            for r in (0, 1):
                for s in (0, 1):
                    for p in (0, 1):
                        for q in (0, 1):
                            u = 2 * (a - 2) + r - p + 3
                            v = 2 * (b - 2) + s - q + 3
                            if 0 <= u <= 6 and 0 <= v <= 6:
                                m[a, b, r, s, p, q, u, v] = 1.0
    return m


def s2d_transform_weights(w7):
    """w7: (7, 7, Cin, Cout) → (5, 5, 4·Cin, 4·Cout). One einsum against a
    constant scatter tensor (a stack-based construction emits thousands of
    tiny ops and explodes XLA compile time)."""
    cin, cout = w7.shape[2], w7.shape[3]
    m = jnp.asarray(_scatter_tensor(), w7.dtype)
    w2 = jnp.einsum("abrspquv,uvcd->abcrsdpq", m, w7)
    # (a, b, c, r, s, d, p, q): flatten (c,r,s) → c*4+r*2+s and (d,p,q)
    # matching space_to_depth's '(c i j)' channel ordering.
    return w2.reshape(5, 5, 4 * cin, 4 * cout)


def conv7_via_s2d(x, w7, bias=None):
    """Exact 7x7 SAME conv on even-sized NHWC x via the s2d/5x5/d2s path."""
    import jax

    x2 = space_to_depth(x, 2)
    w2 = s2d_transform_weights(w7)
    y2 = jax.lax.conv_general_dilated(
        x2,
        w2,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = depth_to_space(y2, 2)
    if bias is not None:
        y = y + bias
    return y
