"""Pallas 5x5 SAME convolution as 25 shifted GEMMs — written for the SpyNet
space-to-depth conv stacks (models/spynet.py), whose XLA lowering measures
~53% MXU on v5e.

Formulation: with the input pre-padded by 2 rows/cols, each kernel tap
(dy, dx) contributes a plain (TH·W, Cin) @ (Cin, Cout) matmul of a shifted
VMEM view — all 25 slices are static, the accumulator stays in f32 scratch,
and the bias + ReLU epilogue is fused. The grid walks (batch, row-tiles);
each program DMAs its (TH+4)-row halo window from HBM ("ANY") into VMEM.

MEASURED RESULT (v5e, 18x128x224, the five SpyNet s2d stack configs):
XLA's native conv WINS — 17.5 ms vs 27.4 ms for this kernel across the
stack. The dx-shifted window views are sublane-misaligned, so Mosaic stages
a relayout copy per tap (~25 x tile x W x Cin x 2B per conv ≈ 16 GB of VMEM
copies for the finest level) which swamps the MXU gain. Kept as a validated
correctness reference and a recorded negative result — the production
SpyNet path stays on XLA convs (same conclusion as fused_wdsr_block.py:
don't hand-schedule what XLA's conv emitter already pipelines well).

Reference role: these are the convolutions of the SpyNet pyramid modules
(reference models/spynet_arch.py:17-22) after the exact s2d transform
(ops/s2d_conv.py) — 7x7@C ≡ 5x5@4C at half resolution.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref, w_ref, b_ref, o_ref, xbuf, acc_ref, sem, *, tile_h, width, relu
):
    n = pl.program_id(0)
    t = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_ref.at[n, pl.ds(t * tile_h, tile_h + 4)], xbuf, sem
    )
    dma.start()
    dma.wait()
    for dy in range(5):
        for dx in range(5):
            xs = xbuf[dy : dy + tile_h, dx : dx + width, :]
            tap = jax.lax.dot_general(
                xs,
                w_ref[dy * 5 + dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if dy == 0 and dx == 0:
                acc_ref[:] = tap
            else:
                acc_ref[:] += tap
    y = acc_ref[:] + b_ref[0].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "tile_h", "interpret"))
def conv5x5_same(x, w, b, relu=False, tile_h=None, interpret=False):
    """x: (N, H, W, Cin); w: (5, 5, Cin, Cout); b: (Cout,). Returns the SAME
    5x5 conv (N, H, W, Cout), optionally with a fused ReLU. H must be
    divisible by the row tile (auto-picked: the largest of 64/32/16/8 that
    divides H and fits VMEM)."""
    n, h, width, cin = x.shape
    cout = w.shape[-1]
    # Mosaic requires the DMA'd slice's minor dim to be lane-aligned (128);
    # zero-pad Cin up — the MXU pads K below 128 anyway, so the extra zeros
    # cost no compute, only the one-time pad copy.
    if cin % 128:
        cpad = 128 - cin % 128
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cpad), (0, 0)))
        cin += cpad
    # padded width rounded to the sublane tile (8) so the DMA'd slice is
    # aligned; the extra right-pad columns are never read by any tap
    wp = -(-(width + 4) // 8) * 8
    if tile_h is None:
        # xbuf + f32 accumulator + double-buffered output blocks + weights
        # must fit the 16 MB VMEM with ~2x headroom for Mosaic's
        # slice staging (budget calibrated on v5e); element size follows the
        # input dtype (2 for bf16, 4 for f32 — a hardcoded 2 would
        # under-budget f32 tiles 2x and overflow VMEM at compile time)
        esz = np.dtype(x.dtype).itemsize
        for cand in (64, 32, 16, 8):
            vmem = (
                (cand + 4) * wp * cin * esz
                + cand * width * cout * 4
                + 2 * cand * width * cout * esz
                + 2 * cand * width * cin * esz
                + 25 * cin * cout * esz
            )
            if h % cand == 0 and vmem < 8 * 2**20:
                tile_h = cand
                break
        else:
            raise ValueError(f"no row tile divides H={h} within VMEM")
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, wp - width - 2), (0, 0)))
    wr = w.reshape(25, cin, cout).astype(x.dtype)
    br = b.reshape(1, cout).astype(jnp.float32)
    kernel = functools.partial(_kernel, tile_h=tile_h, width=width, relu=relu)
    return pl.pallas_call(
        kernel,
        grid=(n, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, width, cout),
            lambda i, t: (i, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, width, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 4, wp, cin), x.dtype),
            pltpu.VMEM((tile_h, width, cout), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, wr, br)
