"""Shape-robust eval: exact tiled inference with O(1) compiled programs.

The per-shape retrace problem: a jitted forward recompiles per distinct eval
image shape, and on backends with ~30-50 s compiles an Urban100 pass (~100
distinct shapes, reference: utils/estimate.py:23-133) costs hours of
compilation. Zero-pad-and-mask cannot fix this exactly — after one conv
layer, the model's own SAME-pad rows diverge from explicitly padded rows
(bias/mean-shift), contaminating the valid region.

The exact fix is the principled version of the reference's overlap patch
tiling (test_video_superresolution_by_patch.py:165-226): cover the image
with fixed-shape tiles whose overlap is at least the model's receptive-field
radius, keep only each tile's uncontaminated interior, and anchor edge tiles
to the true image border so the model's own SAME zero padding reproduces the
full-frame boundary math bit-for-bit (same trick as
parallel/halo.shard_offsets). One tile shape = ONE compiled program for the
whole mixed-shape dataset. Each dimension tiles independently: a dimension
smaller than the tile uses its native size, so an elongated image (e.g.
96x2000) still tiles along its long side — bounded memory and one program
per distinct SMALL dimension value, not per distinct image shape.

Exactness requires ``radius`` ≥ the model's true receptive radius
(parallel.halo.receptive_radius_wdsr for the WDSR family) AND a
crop-invariant ``fwd``. All float models qualify; ``--quantize int8`` does
not — its dynamic activation scale is computed per sample, so a tile
quantizes by the tile's max rather than the frame's and tiled output
differs (slightly) from the whole-frame quantized forward. That matches
how the reference's int8 TFLite deployment behaves on its per-patch
inference (each invocation re-quantizes), so tiled+quantized eval is the
deployment-faithful number, not a bug — but it is not bit-equal to
whole-frame quantized eval the way float tiling is.
"""

import numpy as np


def tile_starts(n, tile, stride):
    """Start offsets covering [0, n) with a final tile anchored at the end."""
    starts = list(range(0, n - tile + 1, stride))
    if starts[-1] != n - tile:
        starts.append(n - tile)
    return starts


def make_tiled_forward(fwd, scale, radius, tile=128):
    """Wrap ``fwd(lr) -> sr`` ((B,H,W,C) -> (B,sH,sW,C)) into an exact tiled
    forward. Returns a callable with a ``.shapes_used`` set recording every
    distinct spatial shape handed to ``fwd`` (== number of traces a jitted
    fwd compiles)."""
    stride = tile - 2 * radius
    if stride <= 0:
        raise ValueError(f"tile {tile} too small for radius {radius}")

    shapes_used = set()

    def tiled(lr):
        lr = np.asarray(lr)
        b, h, w = lr.shape[:3]
        # per-dim tiling: a dim smaller than the tile runs at native size —
        # elongated images still tile along the long dim (a single program
        # per distinct small-dim value, never per full shape)
        th, tw = min(h, tile), min(w, tile)
        ys = tile_starts(h, th, stride) if h > th else [0]
        xs = tile_starts(w, tw, stride) if w > tw else [0]
        shapes_used.add((th, tw))
        out = None
        for y in ys:
            for x in xs:
                sr_tile = fwd(lr[:, y : y + th, x : x + tw])
                if isinstance(sr_tile, tuple):  # NAS models: (sr, speed)
                    sr_tile = sr_tile[0]
                sr_tile = np.asarray(sr_tile)
                if out is None:
                    out = np.zeros(
                        (b, h * scale, w * scale, sr_tile.shape[-1]),
                        sr_tile.dtype,
                    )
                # uncontaminated interior; extended to the image edge where
                # the tile is anchored on the true border
                vy0 = y if y == 0 else y + radius
                vy1 = y + th if y + th == h else y + th - radius
                vx0 = x if x == 0 else x + radius
                vx1 = x + tw if x + tw == w else x + tw - radius
                out[:, vy0 * scale : vy1 * scale, vx0 * scale : vx1 * scale] = (
                    sr_tile[
                        :,
                        (vy0 - y) * scale : (vy1 - y) * scale,
                        (vx0 - x) * scale : (vx1 - x) * scale,
                    ]
                )
        return out

    tiled.shapes_used = shapes_used
    return tiled
