"""Pallas kernel: fused separable-conv block — depthwise kxk → ReLU → 1x1.

This is the supernet's hot block (ConvSep, reference models/wdsr_b.py:375-402;
our models/wdsr_nas.ConvSep) and the retrained ResultNet's conv. Unfused, XLA
materializes the depthwise output in HBM between the two convs; the fused
kernel keeps it in VMEM:

  row-tile window (+halo) in VMEM → k² shifted VPU multiply-accumulates
  (depthwise) → ReLU → one (TILE·W, C) @ (C, C_out) MXU matmul (the 1x1)
  → store.

Implementation notes: Mosaic requires DMA slices to be 128-aligned on the
minor (lane) dim, which small channel counts violate — so instead of manual
halo DMA the caller materializes the overlapping row windows once in HBM
(stack of (tile+2p) windows, ~1+2p/tile extra traffic) and the standard
BlockSpec pipeline streams them. All in-kernel ops are rank-3 vector ops plus
one matmul — fully Mosaic-lowerable (unlike depth-to-space, see
fused_tail.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _convsep_kernel(x_ref, wd_ref, bd_ref, wp_ref, bp_ref, out_ref, *, tile, w_img, c, c_out, k):
    acc = jnp.zeros((tile, w_img, c), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            patch = x_ref[0, dy : dy + tile, dx : dx + w_img, :]
            acc = acc + patch * wd_ref[dy, dx]
    acc = acc + bd_ref[0, 0]
    acc = jnp.maximum(acc, 0.0)
    y = jnp.dot(
        acc.reshape(tile * w_img, c),
        wp_ref[:],
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = y.reshape(tile, w_img, c_out) + bp_ref[0, 0]


def fused_convsep(x, w_depth, b_depth, w_point, b_point, tile=8, interpret=False):
    """Fused depthwise kxk (SAME) → ReLU → 1x1.

    x: (B, H, W, C); w_depth: (k, k, C); b_depth: (C,);
    w_point: (C, C_out); b_point: (C_out,). Returns (B, H, W, C_out).
    Equivalent to:
      relu(depthwise_conv(x, w_depth) + b_depth) @ w_point + b_point
    """
    b, h, w, c = x.shape
    k = w_depth.shape[0]
    p = k // 2
    c_out = w_point.shape[-1]
    assert h % tile == 0, (h, tile)
    n_t = h // tile
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    # overlapping row windows, stacked (grid blocks must not overlap)
    windows = jnp.stack(
        [xp[:, i * tile : i * tile + tile + 2 * p] for i in range(n_t)], axis=1
    ).reshape(b * n_t, tile + 2 * p, w + 2 * p, c)

    kern = functools.partial(
        _convsep_kernel, tile=tile, w_img=w, c=c, c_out=c_out, k=k
    )
    out = pl.pallas_call(
        kern,
        grid=(b * n_t,),
        in_specs=[
            pl.BlockSpec(
                (1, tile + 2 * p, w + 2 * p, c),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((k, k, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c_out), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, w, c_out), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * n_t, tile, w, c_out), jnp.float32),
        interpret=interpret,
    )(
        windows,
        w_depth.astype(jnp.float32),
        b_depth.reshape(1, 1, -1).astype(jnp.float32),
        w_point.astype(jnp.float32),
        b_point.reshape(1, 1, -1).astype(jnp.float32),
    )
    return out.reshape(b, h, w, c_out)
