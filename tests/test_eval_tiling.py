"""Shape-robust eval: exact fixed-shape tiling (train/eval_tiling.py).

VERDICT r1 #3: a mixed-shape eval set (Urban100-style) must compile O(1)
programs, and the tiled output must be bit-identical to the per-shape path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.models import BasicModel
from mobilesuperresolution_tpu.parallel.halo import receptive_radius_wdsr
from mobilesuperresolution_tpu.train.eval_tiling import (
    make_tiled_forward,
    tile_starts,
)


@pytest.fixture(scope="module")
def model_and_fwd():
    model = BasicModel(num_blocks=2, num_residual_units=8, scale=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))

    def fwd(lr):
        return model.apply(variables, lr)

    return model, fwd


def test_tile_starts_cover():
    for n in (48, 65, 100, 130):
        for tile, stride in ((48, 36), (32, 20)):
            if n < tile:
                continue
            starts = tile_starts(n, tile, stride)
            assert starts[0] == 0 and starts[-1] == n - tile
            assert all(b - a <= stride for a, b in zip(starts, starts[1:]))


def test_tiled_forward_bit_identical(model_and_fwd, rng):
    model, fwd = model_and_fwd
    radius = receptive_radius_wdsr(model.num_blocks, 3) + 2
    tiled = make_tiled_forward(fwd, scale=2, radius=radius, tile=48)
    for h, w in ((70, 90), (48, 48), (97, 53), (128, 131)):
        lr = rng.random((1, h, w, 3), dtype=np.float32)
        got = np.asarray(tiled(lr))
        want = np.asarray(fwd(lr))
        np.testing.assert_array_equal(got, want, err_msg=f"shape {(h, w)}")


def test_small_image_native_fallback(model_and_fwd, rng):
    _, fwd = model_and_fwd
    tiled = make_tiled_forward(fwd, scale=2, radius=6, tile=48)
    lr = rng.random((1, 20, 30, 3), dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(tiled(lr)), np.asarray(fwd(lr)))
    assert (20, 30) in tiled.shapes_used


def test_elongated_image_tiles_long_dim(model_and_fwd, rng):
    """An image smaller than the tile in ONE dim must still tile along the
    other (bounded memory, one program per distinct small-dim value) and
    stay bit-identical to the full forward."""
    model, fwd = model_and_fwd
    radius = receptive_radius_wdsr(model.num_blocks, 3) + 2
    tiled = make_tiled_forward(fwd, scale=2, radius=radius, tile=48)
    for h, w in ((30, 200), (200, 30)):
        lr = rng.random((1, h, w, 3), dtype=np.float32)
        np.testing.assert_array_equal(
            np.asarray(tiled(lr)), np.asarray(fwd(lr)), err_msg=f"{(h, w)}"
        )
    # the 2000-px-long dim was tiled: the forward never saw a full-length
    # window, only (30, 48)/(48, 30) tiles
    assert (30, 48) in tiled.shapes_used and (48, 30) in tiled.shapes_used
    assert (30, 200) not in tiled.shapes_used


def test_tiled_forward_strips_nas_tuple_uniformly(rng):
    """(sr, speed)-returning forwards (NAS supernet) must come back as a
    plain array from BOTH the tiled and the small-image path."""

    def fwd(lr):
        return lr.repeat(2, axis=1).repeat(2, axis=2), np.float32(7.0)

    tiled = make_tiled_forward(fwd, scale=2, radius=2, tile=16)
    small = tiled(rng.random((1, 8, 8, 3), dtype=np.float32))
    big = tiled(rng.random((1, 40, 40, 3), dtype=np.float32))
    assert isinstance(small, np.ndarray) and small.shape == (1, 16, 16, 3)
    assert isinstance(big, np.ndarray) and big.shape == (1, 80, 80, 3)


def test_hundred_distinct_shapes_one_trace(model_and_fwd, rng):
    """100 distinct eval shapes (the Urban100 scenario) -> ONE compiled
    program. Traces == distinct shapes handed to the jitted forward."""
    model, fwd_plain = model_and_fwd
    shapes_seen = set()

    def counting_fwd(lr):
        shapes_seen.add(tuple(lr.shape))
        return fwd_plain(lr)

    radius = receptive_radius_wdsr(model.num_blocks, 3) + 2
    tiled = make_tiled_forward(counting_fwd, scale=2, radius=radius, tile=48)
    for i in range(100):
        h = 48 + i  # 100 distinct heights
        w = 48 + ((i * 7) % 23)
        lr = rng.random((1, h, w, 3), dtype=np.float32)
        out = tiled(lr)
        assert out.shape == (1, 2 * h, 2 * w, 3)
    assert len(shapes_seen) == 1, shapes_seen
    assert len(tiled.shapes_used) == 1


def test_evaluate_metrics_identical_through_tiling(model_and_fwd, rng):
    """The full eval harness produces identical metrics through the tiled
    path (no SSIM for speed; PSNR paths cover the stitched pixels)."""
    from mobilesuperresolution_tpu.train.evaluate import evaluate

    model, fwd = model_and_fwd
    radius = receptive_radius_wdsr(model.num_blocks, 3) + 2
    tiled = make_tiled_forward(fwd, scale=2, radius=radius, tile=48)

    def batches():
        for i, (h, w) in enumerate(((64, 80), (50, 70))):
            hr = rng.random((1, 2 * h, 2 * w, 3), dtype=np.float32)
            lr = np.ascontiguousarray(hr[:, ::2, ::2])
            yield f"img{i}", lr, hr

    items = list(batches())
    res_plain = evaluate(
        lambda lr, oh, ow: fwd(lr), iter(items), scale=2, compute_ssim=False
    )
    res_tiled = evaluate(
        lambda lr, oh, ow: tiled(lr), iter(items), scale=2, compute_ssim=False
    )
    assert res_plain.as_dict() == res_tiled.as_dict()
