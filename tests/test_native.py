"""Native C++ bicubic core: bit-parity with the numpy golden path."""

import numpy as np
import pytest

from mobilesuperresolution_tpu.data.imresize import imresize_np
from mobilesuperresolution_tpu.data.native_imresize import (
    imresize_u8,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native lib not built (make -C native)"
)


@pytest.mark.parametrize("scale", [0.5, 0.25, 1.0 / 3.0, 2.0])
def test_native_bit_identical(rng, scale):
    img = rng.integers(0, 256, (97, 113, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        imresize_u8(img, scalar_scale=scale), imresize_np(img, scalar_scale=scale)
    )


def test_native_gray_and_output_shape(rng):
    img = rng.integers(0, 256, (50, 61), dtype=np.uint8)
    np.testing.assert_array_equal(
        imresize_u8(img, output_shape=(23, 37)),
        imresize_np(img, output_shape=(23, 37)),
    )


def test_float_input_falls_back(rng):
    img = rng.random((20, 20, 3))
    np.testing.assert_allclose(
        imresize_u8(img, scalar_scale=0.5), imresize_np(img, scalar_scale=0.5)
    )


# ---- native data-loading core (native/loader.cc) ----


def _loader_available():
    from mobilesuperresolution_tpu.data import native_loader

    return native_loader.native_available()


@pytest.mark.skipif(
    not _loader_available(), reason="libloader not built (make -C native)"
)
class TestNativeLoader:
    def test_yuv420_bit_identical(self, rng):
        from mobilesuperresolution_tpu.data import native_loader
        from mobilesuperresolution_tpu.data.yuv import yuv420_to_rgb as np_path

        h, w = 240, 426
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        np.testing.assert_array_equal(
            native_loader.yuv420_to_rgb(y, u, v), np_path(y, u, v)
        )

    def test_yuv420_matches_cv2_reference_recipe(self, rng):
        """Bit-parity with the reference's ACTUAL conversion
        (yuv420_to_bgr.py:14-17: cv2.resize INTER_LINEAR chroma +
        COLOR_YCrCb2BGR) — our integer replication of cv2's fixed point."""
        cv2 = pytest.importorskip("cv2")
        from mobilesuperresolution_tpu.data.yuv import yuv420_to_rgb

        h, w = 240, 426
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        uu = cv2.resize(u, (w, h))
        vv = cv2.resize(v, (w, h))
        want = cv2.cvtColor(cv2.merge((y, vv, uu)), cv2.COLOR_YCrCb2RGB)
        np.testing.assert_array_equal(yuv420_to_rgb(y, u, v), want)

    def test_yuv420_odd_size_falls_back(self, rng):
        from mobilesuperresolution_tpu.data import native_loader
        from mobilesuperresolution_tpu.data.yuv import yuv420_to_rgb as np_path

        # even-sized frame whose chroma planes mismatch the native contract
        y = rng.integers(0, 256, (8, 8), dtype=np.uint8)
        u = rng.integers(0, 256, (5, 5), dtype=np.uint8)
        v = rng.integers(0, 256, (5, 5), dtype=np.uint8)
        np.testing.assert_array_equal(
            native_loader.yuv420_to_rgb(y, u, v), np_path(y, u, v)
        )

    def test_raw_window_parallel_read(self, rng, tmp_path):
        from mobilesuperresolution_tpu.data import native_loader

        shape = (6, 7, 3)
        frames = [
            rng.integers(0, 256, shape, dtype=np.uint8) for _ in range(5)
        ]
        paths = []
        for i, f in enumerate(frames):
            p = tmp_path / f"{i:04d}.raw"
            f.tofile(p)
            paths.append(str(p))
        out = native_loader.load_raw_window(paths, shape)
        np.testing.assert_array_equal(out, np.stack(frames))
        # BGR->RGB swizzle
        out_flipped = native_loader.load_raw_window(paths, shape, flip_bgr=True)
        np.testing.assert_array_equal(out_flipped, np.stack(frames)[..., ::-1])

    def test_raw_window_missing_or_short_file(self, rng, tmp_path):
        from mobilesuperresolution_tpu.data import native_loader

        shape = (4, 4, 3)
        good = rng.integers(0, 256, shape, dtype=np.uint8)
        p_good = tmp_path / "a.raw"
        good.tofile(p_good)
        assert (
            native_loader.load_raw_window(
                [str(p_good), str(tmp_path / "missing.raw")], shape
            )
            is None
        )
        p_short = tmp_path / "short.raw"
        p_short.write_bytes(b"\x00" * (good.nbytes - 1))
        assert (
            native_loader.load_raw_window([str(p_short)], shape) is None
        )

    def test_nemo_window_uses_native_path(self, rng, tmp_path, monkeypatch):
        """NemoDataset._load_window returns the same frames via the native
        batch read as via the per-frame fallback."""
        from types import SimpleNamespace

        from mobilesuperresolution_tpu.core import modes
        from mobilesuperresolution_tpu.data import nemo

        h, w, c = nemo.LR_SHAPE
        frames = [
            rng.integers(0, 256, (h, w, c), dtype=np.uint8) for _ in range(3)
        ]
        lrdir = tmp_path / "lr"
        lrdir.mkdir()
        window = []
        for i, f in enumerate(frames):
            p = lrdir / f"{i:04d}.raw"
            f.tofile(p)
            window.append((f"lr/{i:04d}.raw", str(p)))
        params = SimpleNamespace(num_patches=1, image_batch=3, seed=0)
        ds = nemo.NemoDataset(
            modes.EVAL, params, [window], [window], raw_order="bgr"
        )
        got = ds._load_window(window)
        expect = [f[..., ::-1] for f in frames]
        for g, e in zip(got, expect):
            np.testing.assert_array_equal(g, e)
