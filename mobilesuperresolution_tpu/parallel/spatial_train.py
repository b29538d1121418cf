"""Spatially-sharded SISR training — exact gradients over a (data, spatial)
mesh.

The reference trains on small random patches because a full frame does not
fit one device's activation memory (datasets/_isr.py:87-107 samples 48-96 px
patches). The TPU-native alternative: shard the image HEIGHT over the mesh's
'spatial' axis with the same shifted-overlap-window construction as
spatially-sharded inference (parallel/halo.py) — and because every output
pixel's window-forward is bit-identical to its full-frame forward and each
output row is kept by exactly one shard, the L1 loss and therefore the
parameter gradients are EXACTLY those of the unsharded step (tested to
machine epsilon). Activation memory per device scales as H/n + 2·radius.

This composes with data parallelism: windows are laid out
(spatial_shards, B, win, W, C) and sharded P('spatial', 'data', ...), so
the gradient psum over both axes is implicit in the sharding — no explicit
collectives (SURVEY §5.8's DDP → mesh translation, extended to a second
axis the reference never had).

Restricted to pure-conv models (WDSR family: head/body/tail/skip convs +
PixelShuffle — all spatially local). Models with global spatial ops (e.g.
SpyNet's resize-to-multiple-of-32) are not window-exact.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from mobilesuperresolution_tpu.parallel.halo import (
    _check_shardable,
    build_windows,
    crop_concat,
)
from mobilesuperresolution_tpu.train.steps import make_sisr_step


def spatial_sharded_forward(apply_fn, x, n, radius, scale, mesh=None):
    """Differentiable window-sharded forward: (B, H, W, C) → (B, H·s, W·s, C').

    Identical values AND gradients to ``apply_fn(x)``; with ``mesh``, windows
    are laid out P('spatial', 'data', ...) so XLA partitions the vmapped
    forward across the mesh (the overlap rows in the window gather are the
    halo exchange, paid once at the input instead of per conv layer)."""
    h = x.shape[1]
    _check_shardable(h, n, radius)
    if n == 1:
        return apply_fn(x)
    windows = build_windows(x, n, radius)  # (n, B, win, W, C)
    if mesh is not None:
        windows = jax.device_put(
            windows, NamedSharding(mesh, P("spatial", "data", None, None, None))
        )
    y = jax.vmap(apply_fn)(windows)
    return crop_concat(y, h, n, radius, scale)


def make_spatial_sisr_step(state, mesh, radius, scale, spatial_shards=None):
    """step(state, (lr, hr)) -> (state, metrics): the data-parallel SISR step
    (train/steps.py::make_sisr_step) with the forward additionally sharded
    over the mesh's 'spatial' axis. Loss/gradients match the plain step
    exactly."""
    n = spatial_shards if spatial_shards is not None else mesh.shape["spatial"]

    def forward(apply_closure, lr_img):
        return spatial_sharded_forward(apply_closure, lr_img, n, radius, scale, mesh)

    return make_sisr_step(state, forward=forward)
