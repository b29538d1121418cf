"""Optical-flow bilinear warping — the TPU equivalent of
``torch.nn.functional.grid_sample`` as used by the reference's ``flow_warp``
(models/spynet_arch.py:98-129, align_corners=True).

With align_corners=True the reference's normalize-to-[-1,1]-then-grid_sample
round-trips exactly back to pixel coordinates, so we sample directly at
``grid + flow`` in pixel space.

TPU formulation ("quad-pack"): gathers dominate warp cost on TPU (the copy
engine pays per gathered row), so instead of 4 separate taps we build ONE
tensor whose channels hold the 2x2 neighborhood — q[h, w] = (xp[h, w],
xp[h, w+1], xp[h+1, w], xp[h+1, w+1]) over a 1-pixel zero-padded xp — and
gather it ONCE at (floor(vy), floor(vx)). The zero pad makes both padding
modes exact with no validity masks:
- 'zeros':  clamping v to [-1, size] lands out-of-range taps on the zero pad
  (and fully-out samples interpolate pure zeros), matching grid_sample's
  per-tap zeros semantics;
- 'border': v is clamped to [0, size-1] first; the only pad touch is the
  +1 tap at v == size-1, whose bilinear weight is exactly 0.
4x fewer gather rows; verified bit-comparable to torch.grid_sample in tests.
"""

import jax.numpy as jnp


def flow_warp(x, flow, padding_mode="zeros"):
    """Warp NHWC images/features by per-pixel flow.

    x: (N, H, W, C); flow: (N, H, W, 2) with flow[..., 0] = dx (width
    direction) and flow[..., 1] = dy, in pixels. Returns (N, H, W, C).
    """
    n, h, w, c = x.shape
    dtype = x.dtype
    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    vx = gx + flow[..., 0].astype(jnp.float32)
    vy = gy + flow[..., 1].astype(jnp.float32)

    if padding_mode == "border":
        vx = jnp.clip(vx, 0.0, w - 1)
        vy = jnp.clip(vy, 0.0, h - 1)
    elif padding_mode == "zeros":
        # land far-out samples on the zero pad; in-range math is unchanged
        vx = jnp.clip(vx, -1.0, float(w))
        vy = jnp.clip(vy, -1.0, float(h))
    else:
        raise ValueError(f"unsupported padding_mode {padding_mode}")

    iy0 = jnp.floor(vy)
    ix0 = jnp.floor(vx)
    fy = (vy - iy0).astype(dtype)[..., None]
    fx = (vx - ix0).astype(dtype)[..., None]

    # 1-px zero pad; quad channels = the 2x2 neighborhood
    hp, wp = h + 2, w + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    q = jnp.concatenate(
        [
            xp,
            jnp.pad(x, ((0, 0), (1, 1), (0, 2), (0, 0))),  # xp shifted left:  xp[h, w+1]
            jnp.pad(x, ((0, 0), (0, 2), (1, 1), (0, 0))),  # xp shifted up:    xp[h+1, w]
            jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0))),  # both:             xp[h+1, w+1]
        ],
        axis=-1,
    )  # (N, H+2, W+2, 4C)

    iyp = jnp.clip(iy0.astype(jnp.int32) + 1, 0, hp - 1)
    ixp = jnp.clip(ix0.astype(jnp.int32) + 1, 0, wp - 1)
    # ONE flat gather with the batch folded into a global row index:
    # measured ~1.8x faster than batched take_along_axis on TPU (the batched
    # gather form lowers to a slower per-batch loop).
    idx = iyp * wp + ixp + (jnp.arange(n, dtype=jnp.int32) * (hp * wp))[:, None, None]
    q_flat = q.reshape(n * hp * wp, 4 * c)
    # Gather mode: the default (FILL_OR_DROP) measured equal-or-faster than
    # PROMISE_IN_BOUNDS ('wrap') in the full pipeline (98.9 vs 98.2 fps) and
    # in-scan (13.0 vs 14.4 ms) despite PIB skipping the per-row bounds
    # select — the gather is row-overhead-bound either way (DESIGN.md).
    taps = jnp.take(q_flat, idx.reshape(-1), axis=0, unique_indices=False,
                    indices_are_sorted=False).reshape(n, h, w, 4, c)
    t00, t01, t10, t11 = taps[..., 0, :], taps[..., 1, :], taps[..., 2, :], taps[..., 3, :]

    top = t00 * (1 - fx) + t01 * fx
    bot = t10 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy
