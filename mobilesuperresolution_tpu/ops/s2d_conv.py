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

Factor choice (measured on v5e, 18x256x448 SpyNet stack, bf16): direct 57 ms,
factor-2 23 ms, factor-4 25 ms — factor 4's 2.9x tap redundancy outweighs its
extra lane utilization, so factor 2 is the production setting.
"""

import functools

import jax.numpy as jnp
import numpy as np

from mobilesuperresolution_tpu.ops.layers import depth_to_space, space_to_depth


def transformed_kernel_size(k, f):
    """Tap count per dim after factor-f s2d: u = f·α + r − p + (k//2) must
    cover [0, k) for r, p ∈ [0, f) → α ∈ [-(k//2+f-1)//f, (k//2+f-1)//f]."""
    half = (k // 2 + f - 1) // f
    return 2 * half + 1


@functools.lru_cache(maxsize=8)
def _scatter_tensor(k=7, f=2):
    """Constant M[a,b,r,s,p,q,u,v] = 1 iff transformed tap (a,b) of
    input-phase (r,s) → output-phase (p,q) reads original tap (u,v), for a
    kxk conv under factor-f space-to-depth. (numpy, so it stays a
    compile-time constant under jit.)"""
    kn = transformed_kernel_size(k, f)
    half = kn // 2
    m = np.zeros((kn, kn, f, f, f, f, k, k), np.float32)
    for a in range(kn):
        for b in range(kn):
            for r in range(f):
                for s in range(f):
                    for p in range(f):
                        for q in range(f):
                            u = f * (a - half) + r - p + k // 2
                            v = f * (b - half) + s - q + k // 2
                            if 0 <= u < k and 0 <= v < k:
                                m[a, b, r, s, p, q, u, v] = 1.0
    return m


def s2d_transform_weights(wk, factor=2):
    """wk: (k, k, Cin, Cout) → (k', k', f²·Cin, f²·Cout). One einsum against a
    constant scatter tensor (a stack-based construction emits thousands of
    tiny ops and explodes XLA compile time)."""
    k = wk.shape[0]
    cin, cout = wk.shape[2], wk.shape[3]
    f = factor
    m = jnp.asarray(_scatter_tensor(k, f), wk.dtype)
    w2 = jnp.einsum("abrspquv,uvcd->abcrsdpq", m, wk)
    # (a, b, c, r, s, d, p, q): flatten (c,r,s) → c*f²+r*f+s and (d,p,q)
    # matching space_to_depth's '(c i j)' channel ordering.
    kn = transformed_kernel_size(k, f)
    return w2.reshape(kn, kn, f * f * cin, f * f * cout)


def conv7_via_s2d(x, w7, bias=None, factor=2):
    """Exact kxk SAME conv on NHWC x (H, W divisible by factor) via the
    s2d / smaller-conv / d2s path."""
    import jax

    x2 = space_to_depth(x, factor)
    w2 = s2d_transform_weights(w7, factor)
    y2 = jax.lax.conv_general_dilated(
        x2,
        w2,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = depth_to_space(y2, factor)
    if bias is not None:
        y = y + bias
    return y
