"""Pallas kernel: fused WDSR-B residual block.

The hot block of the flagship SISR model (reference models/basic_wdsr_b.py:
96-144; ours models/wdsr_basic.BasicBlock): 1x1 expand (C→6C) → ReLU → 1x1
linear (6C→0.84C) → 3x3 conv (→C) → + residual. Unfused, XLA writes the 6C
expansion (the largest tensor in the network) to HBM; fused, it lives only in
VMEM:

  row-tile window (+1-row halo) → (TILE·W, C) @ (C, 6C) MXU → ReLU →
  @ (6C, M) MXU → 9 shifted (TILE·W, M) @ (M, C) matmuls (the 3x3) →
  + residual → store.

Weights arrive pre-weight-normalized (g·v/||v||, done cheaply outside).
Same pre-windowed BlockSpec pipelining as fused_convsep (Mosaic alignment).

MEASURED (v5e, 360x544x24, f32, tile=4): XLA 1.70 ms vs this kernel 1.75 ms —
XLA's own fusion of the 1x1 chain into the conv is already near-optimal at
these channel counts, so the XLA path remains production. Kept as a validated
reference (correct on-chip to 6e-3) and a base for future quantized variants,
where Pallas fusion composes with int8 rescaling that XLA cannot fuse.
VMEM note: the 6C expansion must be computed row-by-row and tile<=4 at
production widths or the kernel blows the 16 MB VMEM budget.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref,
    *, tile, w_img, c, c_mid, k, n_tiles,
):
    p = k // 2
    win_w = w_img + 2 * p
    rows = tile + 2 * p
    x = x_ref[0]  # (rows, win_w, C)

    # 1x1 expand + ReLU + 1x1 linear over the padded window (the halo rows'
    # values are needed by the 3x3 below). Computed ROW BY ROW so the big 6C
    # expansion never exists for more than one row at a time — the full-window
    # h1 blows the 16 MB VMEM budget at production widths.
    h2_rows = []
    for j in range(rows):
        h1_row = jnp.dot(
            x[j], w1_ref[:], preferred_element_type=jnp.float32
        ) + b1_ref[0, 0]
        h1_row = jnp.maximum(h1_row, 0.0)
        h2_rows.append(
            jnp.dot(h1_row, w2_ref[:], preferred_element_type=jnp.float32)
            + b2_ref[0, 0]
        )
    h2 = jnp.stack(h2_rows)  # (rows, win_w, c_mid)

    # The reference 3x3 sees ZERO h2 at the true image boundary (SAME padding
    # happens after the 1x1s) — but on the zero-padded window the 1x1 chain
    # produces relu(b1)@w2+b2 ≠ 0 there. Mask the true-pad positions: the
    # side columns always; the top/bottom halo rows only on boundary tiles.
    i = pl.program_id(0) % n_tiles
    row_in_image = jax.lax.broadcasted_iota(jnp.int32, (rows, win_w), 0) + i * tile
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, win_w), 1)
    h_img = n_tiles * tile
    valid = (
        (row_in_image >= p)
        & (row_in_image < h_img + p)
        & (col >= p)
        & (col < w_img + p)
    )
    # cast before the minor-dim expand — Mosaic only inserts minor dims on
    # 32-bit types, not bools
    h2 = h2 * valid.astype(h2.dtype)[:, :, None]

    # 3x3 as 9 shifted matmuls
    acc = jnp.zeros((tile * w_img, c), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            patch = h2[dy : dy + tile, dx : dx + w_img, :]
            acc = acc + jnp.dot(
                patch.reshape(tile * w_img, c_mid),
                w3_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
    y = acc.reshape(tile, w_img, c) + b3_ref[0, 0]
    # residual: interior of the input window
    out_ref[0] = y + x[p : p + tile, p : p + w_img, :]


def fused_wdsr_block(x, w1, b1, w2, b2, w3, b3, tile=4, interpret=False):
    """x: (B, H, W, C). w1: (C, 6C); w2: (6C, M); w3: (k, k, M, C) — all
    already weight-normalized. Returns x + conv3x3(linear(relu(expand(x)))).
    """
    b, h, w, c = x.shape
    k = w3.shape[0]
    p = k // 2
    c_mid = w3.shape[2]
    assert h % tile == 0, (h, tile)
    n_t = h // tile
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    windows = jnp.stack(
        [xp[:, i * tile : i * tile + tile + 2 * p] for i in range(n_t)], axis=1
    ).reshape(b * n_t, tile + 2 * p, w + 2 * p, c)

    kern = functools.partial(
        _block_kernel, tile=tile, w_img=w, c=c, c_mid=c_mid, k=k, n_tiles=n_t
    )
    c_exp = w1.shape[1]
    out = pl.pallas_call(
        kern,
        grid=(b * n_t,),
        in_specs=[
            pl.BlockSpec(
                (1, tile + 2 * p, w + 2 * p, c),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c, c_exp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c_exp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_exp, c_mid), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c_mid), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, c_mid, c), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * n_t, tile, w, c), jnp.float32),
        interpret=interpret,
    )(
        windows,
        w1.astype(jnp.float32),
        b1.reshape(1, 1, -1).astype(jnp.float32),
        w2.astype(jnp.float32),
        b2.reshape(1, 1, -1).astype(jnp.float32),
        w3.astype(jnp.float32),
        b3.reshape(1, 1, -1).astype(jnp.float32),
    )
    return out.reshape(b, h, w, c)
