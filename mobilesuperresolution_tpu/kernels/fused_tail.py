"""Pallas kernel: fused 3x3 conv + depth-to-space (PixelShuffle) — the WDSR
tail (BASELINE.json north star; reference equivalent: models/basic_wdsr_b.py
tail conv + nn.PixelShuffle).

Why fuse: the unfused tail materializes a (H, W, s²·3) tensor in HBM, then
reads it back for the shuffle's reshape/transpose. The fused kernel keeps the
conv accumulator in VMEM, performs the shuffle as a register/VMEM relayout and
writes the final (H·s, W·s, 3) tile once — one HBM round trip.

Formulation: the 3x3 conv is 9 shifted (TILE·W, C) @ (C, s²·3) matmuls on the
MXU over a VMEM scratch holding the row tile + 1-row halo (input is
pre-padded spatially in JAX, so the kernel does interior math only). Grid =
(B, H / TILE). DMA of the overlapping row window is manual (BlockSpec blocks
cannot overlap).

STATUS: correct in interpret mode (tests) but NOT lowerable by current Mosaic
on-device — depth-to-space inherently moves channel (lane) data into spatial
(sublane) positions, and Mosaic rejects every formulation of that relayout
("unsupported shape cast", tried rank-5 transpose and contiguous rank-3/4
merges). Production uses the XLA conv+depth_to_space path; this kernel is
kept as the reference implementation for when Mosaic grows lane→sublane
relayouts. No Pallas kernel is deployed in the model paths: every candidate
measured slower than XLA's own fusion on-chip (v5e) — fused ConvSep
0.37-0.96x XLA across the supernet train shape (b16 48x48 c32) and the
speed-table protocol shape (240x426, c24/c32) at k in {3,5,7} (see DESIGN.md
"Negative results"), fused WDSR block 1.70 vs 1.75 ms, conv5x5 27.4 vs
17.5 ms.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tail_kernel(x_hbm, w_ref, b_ref, out_ref, scratch, sem, *, tile, w_img, c_in, c_out, scale):
    b = pl.program_id(0)
    t = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile, tile + 2), :, :], scratch, sem
    )
    cp.start()
    cp.wait()

    acc = jnp.zeros((tile * w_img, c_out), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = scratch[dy : dy + tile, dx : dx + w_img, :]
            acc = acc + jnp.dot(
                patch.reshape(tile * w_img, c_in),
                w_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
    y = acc.reshape(tile, w_img, c_out) + b_ref[0]
    # depth-to-space: channel index c*s*s + i*s + j → pixel offset (i, j).
    # Mosaic can't lower rank-5 reshapes/transposes, so the shuffle is done
    # with static channel reorders + contiguous rank-<=4 merges only.
    s = scale
    c3 = c_out // (s * s)
    rows = []
    for i in range(s):
        # j-major channel order so (W, s*c3) -> (W*s, c3) is a contiguous merge
        ch_idx = [c * s * s + i * s + j for j in range(s) for c in range(c3)]
        plane = jnp.concatenate([y[:, :, k : k + 1] for k in ch_idx], axis=-1)
        rows.append(plane.reshape(tile, w_img * s, c3))
    out = jnp.stack(rows, axis=1)  # (tile, s, W*s, c3)
    out_ref[0] = out.reshape(tile * s, w_img * s, c3)


def fused_conv_pixel_shuffle(x, kernel, bias, scale, tile=8, interpret=False):
    """x: (B, H, W, C); kernel: (3, 3, C, s²·C_out'); bias: (s²·C_out',).
    Returns (B, H·s, W·s, C_out') == depth_to_space(conv3x3_same(x) + bias).
    """
    b, h, w, c = x.shape
    c_out = kernel.shape[-1]
    assert c_out % (scale * scale) == 0
    assert h % tile == 0, (h, tile)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    kern = functools.partial(
        _tail_kernel, tile=tile, w_img=w, c_in=c, c_out=c_out, scale=scale
    )
    out = pl.pallas_call(
        kern,
        grid=(b, h // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # manual DMA
            pl.BlockSpec((3, 3, c, c_out), lambda b_, t_: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda b_, t_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile * scale, w * scale, c_out // (scale * scale)),
            lambda b_, t_: (b_, t_, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, h * scale, w * scale, c_out // (scale * scale)), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((tile + 2, w + 2, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, kernel.astype(jnp.float32), bias.reshape(1, -1).astype(jnp.float32))
    return out
