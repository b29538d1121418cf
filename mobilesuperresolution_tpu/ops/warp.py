"""Optical-flow bilinear warping — the TPU equivalent of
``torch.nn.functional.grid_sample`` as used by the reference's ``flow_warp``
(models/spynet_arch.py:98-129, align_corners=True).

With align_corners=True the reference's normalize-to-[-1,1]-then-grid_sample
round-trips exactly back to pixel coordinates, so we sample directly at
``grid + flow`` in pixel space:
- 'zeros' padding: each of the 4 bilinear taps contributes only when its
  integer index is in bounds (matches grid_sample zeros semantics per-tap).
- 'border' padding: sample coordinates are clamped to the valid range first.

The gather is expressed as a flat take-along-axis over H*W which XLA lowers to
an efficient dynamic-gather; channels stay vectorized in the lane dimension.
"""

import jax.numpy as jnp


def flow_warp(x, flow, padding_mode="zeros"):
    """Warp NHWC images/features by per-pixel flow.

    x: (N, H, W, C); flow: (N, H, W, 2) with flow[..., 0] = dx (width
    direction) and flow[..., 1] = dy, in pixels. Returns (N, H, W, C).
    """
    n, h, w, c = x.shape
    dtype = x.dtype
    gy = jnp.arange(h, dtype=dtype)[:, None]
    gx = jnp.arange(w, dtype=dtype)[None, :]
    vx = gx + flow[..., 0]
    vy = gy + flow[..., 1]

    if padding_mode == "border":
        vx = jnp.clip(vx, 0.0, w - 1)
        vy = jnp.clip(vy, 0.0, h - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode {padding_mode}")

    ix0 = jnp.floor(vx)
    iy0 = jnp.floor(vy)
    fx = vx - ix0
    fy = vy - iy0
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    x_flat = x.reshape(n, h * w, c)

    def tap(iy, ix, wgt):
        if padding_mode == "zeros":
            valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
            wgt = wgt * valid.astype(dtype)
        iyc = jnp.clip(iy, 0, h - 1)
        ixc = jnp.clip(ix, 0, w - 1)
        idx = (iyc * w + ixc).reshape(n, h * w)
        vals = jnp.take_along_axis(x_flat, idx[..., None], axis=1)
        return vals.reshape(n, h, w, c) * wgt[..., None]

    out = (
        tap(iy0, ix0, (1 - fy) * (1 - fx))
        + tap(iy0, ix1, (1 - fy) * fx)
        + tap(iy1, ix0, fy * (1 - fx))
        + tap(iy1, ix1, fy * fx)
    )
    return out
