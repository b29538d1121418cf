"""Spatially-sharded convolutional inference — exact, with overlap windows.

The reference bounds memory at high resolution by tiling frames into
overlapping 64x64 patches on ONE device and accepting edge error
(test_video_superresolution_by_patch.py:165-226). The TPU-native version
shards the image height across the mesh's ``spatial`` axis and is *exact*:

- Each shard computes a window of ``H/n + 2·radius`` rows. Interior windows
  are centered on their output rows, so every conv sees real neighbor pixels.
- At the true top/bottom image edges, the window is shifted inward so that it
  *ends exactly at the image edge* — the model's own per-layer 'SAME' zero
  padding then reproduces the full-frame boundary math bit-for-bit. (A naive
  zero halo is NOT equivalent: after one conv layer, the full-frame pad rows
  are re-zeroed while halo rows hold bias/activation values.)
- Window shapes are uniform; only the output crop offset differs per shard,
  and shard count is static, so the crops are static slices.

The model forward is vmapped over the (sharded) window axis; XLA partitions it
over the mesh, and the gather/concat ride ICI.

Requires H/n ≥ 2·radius and a pure-conv model whose total receptive-field
radius is ≤ ``radius``.
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def receptive_radius_wdsr(num_blocks, block_kernel=3):
    """Total receptive radius of the WDSR family: head 3x3 + per-block kxk +
    tail 3x3 (the 5x5 skip path is shallower)."""
    return 1 + num_blocks * (block_kernel // 2) + 1


def shard_offsets(h, n, radius):
    """Per-shard window start rows: interior windows centered on their output
    rows, edge windows shifted inward to end exactly at the image edge."""
    hs = h // n
    win = hs + 2 * radius
    return [min(max(i * hs - radius, 0), h - win) for i in range(n)]


def build_windows(x, n, radius):
    """x: (B, H, W, C) → (n, B, H/n + 2·radius, W, C) overlap windows (static
    slices — differentiable; the overlap gather is the halo exchange)."""
    h = x.shape[1]
    hs = h // n
    win = hs + 2 * radius
    offsets = shard_offsets(h, n, radius)
    return jnp.stack([x[:, o : o + win] for o in offsets])


def crop_concat(y, h, n, radius, scale=1):
    """y: (n, B, win·scale, W·scale, C') per-window outputs → (B, H·scale,
    W·scale, C'): keep each window's central H/n output rows (disjoint, cover
    the image exactly once)."""
    hs = h // n
    offsets = shard_offsets(h, n, radius)
    parts = [
        y[i, :, (i * hs - offsets[i]) * scale : (i * hs - offsets[i] + hs) * scale]
        for i in range(n)
    ]
    return jnp.concatenate(parts, axis=1)


def _check_shardable(h, n, radius):
    # ValueError, not assert: under `python -O` a stripped assert would
    # silently drop output rows instead of failing
    if h % n != 0:
        raise ValueError(f"H={h} not divisible by {n} shards")
    hs = h // n
    if hs < 2 * radius and n != 1:
        raise ValueError(f"shard height {hs} must be >= 2*radius={2 * radius}")


def spatially_sharded_apply(apply_fn, x, mesh, radius, scale=1, axis="spatial"):
    """Run ``apply_fn`` (pure conv forward, e.g. partial(model.apply, params))
    on x: (B, H, W, C) with H split over the mesh's ``axis``. Returns the
    full (B, H*scale, W*scale, C') output, numerically identical to
    ``apply_fn(x)``.
    """
    n = mesh.shape[axis]
    b, h, w, c = x.shape
    _check_shardable(h, n, radius)
    if n == 1:
        return apply_fn(x)
    windows = build_windows(x, n, radius)  # (n, B, win, W, C)
    windows = jax.device_put(
        windows, NamedSharding(mesh, P(axis, None, None, None, None))
    )
    y = jax.vmap(apply_fn)(windows)  # (n, B, win*scale, W*scale, C')
    return crop_concat(y, h, n, radius, scale)
