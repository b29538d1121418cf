"""File-based dataset walkers: directory-structure → window/file-list logic,
using fake on-disk trees with tiny PNGs."""

import os
from types import SimpleNamespace

import numpy as np
import pytest

from mobilesuperresolution_tpu.core import modes


def _png(path, hw=(16, 16)):
    from PIL import Image

    rng = np.random.default_rng(0)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(
        (rng.random((*hw, 3)) * 255).astype(np.uint8)
    ).save(path)


def _params(tmp_path, **kw):
    base = dict(
        data_dir=str(tmp_path),
        cache_dir=None,
        scale=4,
        lr_patch_size=4,
        ignored_boundary_size=1,
        num_patches=2,
        image_batch=3,
        val_image_batch=5,
        train_sample_patch=True,
        seed=0,
    )
    base.update(kw)
    return SimpleNamespace(**base)


class TestREDSWalker:
    def test_sliding_windows_per_clip(self, tmp_path):
        from mobilesuperresolution_tpu.data.reds import list_clip_windows

        for clip in ("000", "001"):
            for f in range(6):
                _png(tmp_path / "lr" / clip / f"{f:08d}.png")
        windows = list_clip_windows(str(tmp_path / "lr"), image_batch=3)
        # 2 clips × (6 - 3 + 1) windows
        assert len(windows) == 8
        assert all(len(w) == 3 for w in windows)
        keys = [k for k, _ in windows[0]]
        assert keys == ["000/00000000.png", "000/00000001.png", "000/00000002.png"]

    def test_get_dataset_train(self, tmp_path):
        from mobilesuperresolution_tpu.data import reds

        for split, sub in (("train", "train_sharp_bicubic/X4"), ("train", "train_sharp")):
            for clip in ("000",):
                for f in range(4):
                    hw = (16, 16) if "bicubic" in sub else (64, 64)
                    _png(tmp_path / "REDS" / split / sub / clip / f"{f:08d}.png", hw)
        ds = reds.get_dataset(modes.TRAIN, _params(tmp_path, lr_patch_size=8, ignored_boundary_size=2))
        assert len(ds) == 2 * 2  # 2 windows × num_patches
        lr, hr = ds[0]
        assert lr.shape == (3, 8, 8, 3) and hr.shape == (3, 32, 32, 3)


class TestVimeoWalker:
    def test_sequence_windows_and_tag_filter(self, tmp_path):
        from mobilesuperresolution_tpu.data.vimeo import list_sequence_windows

        for seq in ("00001",):
            for sub in ("0001", "0002"):
                for i in range(3):
                    _png(tmp_path / seq / sub / f"lr_{i}.png")
                    _png(tmp_path / seq / sub / f"hr_{i}.png")
        wins = list_sequence_windows(str(tmp_path), tag="lr")
        assert len(wins) == 2
        assert all(len(w) == 3 for w in wins)
        assert all("lr" in k for w in wins for k, _ in w)
        wins_all = list_sequence_windows(str(tmp_path), tag=None)
        assert all(len(w) == 6 for w in wins_all)


class TestNemoWalker:
    def test_stride_windows(self, tmp_path):
        from mobilesuperresolution_tpu.data.nemo import list_raw_windows

        d = tmp_path / "lr"
        os.makedirs(d)
        for i in range(60):
            (d / f"{i:04d}.raw").write_bytes(b"\x00")
        train = list_raw_windows(str(d), modes.TRAIN, image_batch=10)
        # stride 25: starts 0, 25, 50 — start 50 included since 50+10 <= 60
        assert len(train) == 3
        ev = list_raw_windows(str(d), modes.EVAL, image_batch=10)
        assert len(ev) == 6  # stride == image_batch

    def test_raw_channel_order(self, tmp_path):
        from mobilesuperresolution_tpu.data.nemo import LR_SHAPE, NemoDataset

        frame = np.arange(np.prod(LR_SHAPE), dtype=np.uint8).reshape(LR_SHAPE)
        p = tmp_path / "lr_0000.raw"
        frame.tofile(p)
        win = [("lr_0000.raw", str(p))]
        ds_rgb = NemoDataset(modes.EVAL, _params(tmp_path), [win], [win], raw_order="rgb")
        ds_bgr = NemoDataset(modes.EVAL, _params(tmp_path), [win], [win], raw_order="bgr")
        a = ds_rgb._load_frame(*win[0])
        b = ds_bgr._load_frame(*win[0])
        np.testing.assert_array_equal(a, frame)
        np.testing.assert_array_equal(b, frame[..., ::-1])


class TestDiv2k:
    def test_train_dataset(self, tmp_path):
        from mobilesuperresolution_tpu.data import div2k

        for i in range(2):
            _png(tmp_path / "DIV2K" / "DIV2K_train_HR" / f"{i:04d}.png", (48, 48))
        p = _params(tmp_path, scale=2, lr_patch_size=8, num_patches=3)
        ds = div2k.get_dataset(modes.TRAIN, p)
        assert len(ds) == 6
        lr, hr = ds[0]
        assert lr.shape == (8, 8, 3) and hr.shape == (16, 16, 3)


class TestEvalSets:
    def test_set5_walker(self, tmp_path):
        from mobilesuperresolution_tpu.data import get_dataset_module

        for name in ("baby.png", "bird.png"):
            _png(tmp_path / "Set5" / name, (32, 32))
        mod = get_dataset_module("set5")
        ds = mod.get_dataset(modes.EVAL, _params(tmp_path, scale=2))
        assert len(ds) == 2
        name, lr, hr = ds[0]
        assert name == "baby"
        assert lr.shape == (16, 16, 3) and hr.shape == (32, 32, 3)


class _ScriptedRng:
    """Deterministic stand-in for the dataset RNG: scripted flip draws and
    crop positions."""

    def __init__(self, randoms, ints):
        self._r = iter(randoms)
        self._i = iter(ints)

    def random(self):
        return next(self._r)

    def integers(self, lo, hi):
        return next(self._i)


class TestRedsWithMV:
    def _tree(self, tmp_path, split):
        sub_lr = f"{split}/{split}_sharp_bicubic/X4"
        sub_hr = f"{split}/{split}_sharp"
        for clip in ("000", "153"):
            for f in range(3):
                _png(tmp_path / "REDS" / sub_lr / clip / f"{f:08d}.png", (16, 16))
                _png(tmp_path / "REDS" / sub_hr / clip / f"{f:08d}.png", (64, 64))
            mv = np.zeros((3, 16, 16, 2), dtype=np.float32)
            mv[..., 0] = 1.0  # dx
            mv[..., 1] = 2.0  # dy
            d = tmp_path / "REDS" / sub_lr / clip / "hex-me16-ref1"
            os.makedirs(d, exist_ok=True)
            np.save(d / "motion.npy", mv)

    def test_train_item_flip_negates_mv(self, tmp_path):
        from mobilesuperresolution_tpu.data import reds_with_mv

        self._tree(tmp_path, "train")
        p = _params(tmp_path, lr_patch_size=8, num_patches=1, image_batch=3)
        ds = reds_with_mv.get_dataset(modes.TRAIN, p)
        # clip 153 skipped (reference reds_with_mv.py:132) → windows only from 000
        assert len(ds) == 1
        # horizontal flip only (p1 < 0.5 ≤ p2), crop at (x=2, y=3)
        ds.rng = _ScriptedRng([0.4, 0.9], [2, 3])
        lr, hr = ds[0]
        assert lr.shape == (3, 8, 8, 5) and hr.shape == (3, 32, 32, 3)
        # width flip negates dx (channel 3), dy (channel 4) unchanged;
        # MV values are raw pixel displacements, NOT /255
        np.testing.assert_allclose(lr[..., 3], -1.0)
        np.testing.assert_allclose(lr[..., 4], 2.0)
        # RGB channels match a manual crop + width-flip of the source frame
        from PIL import Image

        src = np.asarray(
            Image.open(
                tmp_path / "REDS/train/train_sharp_bicubic/X4/000/00000000.png"
            )
        ).astype(np.float32) / 255.0
        expected = src[2:10, 3:11][:, ::-1]
        np.testing.assert_allclose(lr[0, ..., :3], expected)

    def test_eval_item(self, tmp_path):
        from mobilesuperresolution_tpu.data import reds_with_mv

        self._tree(tmp_path, "val")
        p = _params(tmp_path, image_batch=3, val_image_batch=3)
        ds = reds_with_mv.get_dataset(modes.EVAL, p)
        name, lr, hr = ds[0]
        assert name == "00000000000"
        assert lr.shape == (3, 16, 16, 5) and hr.shape == (3, 64, 64, 3)
        np.testing.assert_allclose(lr[..., 3], 1.0)
        np.testing.assert_allclose(lr[..., 4], 2.0)


class TestDataHardening:
    """Regression tests for host-side data bugs found in review."""

    def test_renumber_frames_collision_safe(self, tmp_path):
        """A rename target colliding with a not-yet-renamed source must not
        clobber it (two-phase rename)."""
        from mobilesuperresolution_tpu.data.frame_utils import renumber_frames

        contents = {"!.png": b"bang", "0000.png": b"zero", "0001.png": b"one"}
        for name, data in contents.items():
            (tmp_path / name).write_bytes(data)
        renumber_frames(str(tmp_path))
        got = sorted(os.listdir(tmp_path))
        assert got == ["0000.png", "0001.png", "0002.png"]
        # '!' sorts first → becomes 0000; originals shift, nothing lost
        assert (tmp_path / "0000.png").read_bytes() == b"bang"
        assert (tmp_path / "0001.png").read_bytes() == b"zero"
        assert (tmp_path / "0002.png").read_bytes() == b"one"

    def test_prefetch_propagates_dataset_errors(self):
        """An exception inside the prefetch worker must re-raise in the
        consumer, not truncate the epoch silently."""
        from mobilesuperresolution_tpu.data.isr import batch_iterator

        class Bad:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                if i >= 2:
                    raise RuntimeError("corrupt item")
                return np.zeros((4, 4, 3)), np.zeros((8, 8, 3))

        with pytest.raises(RuntimeError, match="corrupt item"):
            for _ in batch_iterator(Bad(), 1, shuffle=False, prefetch=2):
                pass

    def test_load_image_grayscale_is_rgb(self, tmp_path):
        from PIL import Image

        from mobilesuperresolution_tpu.data.io_cache import load_image

        p = tmp_path / "gray.png"
        Image.fromarray(np.zeros((10, 12), np.uint8), mode="L").save(p)
        img = load_image(str(p))
        assert img.shape == (10, 12, 3)

    def test_video_dataset_rejects_mismatched_trees(self, tmp_path):
        from mobilesuperresolution_tpu.data import vsr as _vsr

        p = _params(tmp_path)
        w = [[("a/0.png", None)], [("a/1.png", None)]]
        with pytest.raises(ValueError, match="mismatch"):
            _vsr.VideoSRDataset(modes.TRAIN, p, w, w[:1])


class TestArrayCacheCompression:
    """Transparent zlib compression (the reference's LZF/blosc HDF5 role,
    common/io.py:15-42): compressed round-trip, mixed raw/compressed reads,
    and a real <50%-of-raw ratio on natural-ish images."""

    def _natural(self, rng, h=256, w=256):
        # smooth field + mild texture + noise, uint8 RGB — compresses like a
        # photograph, not like random bytes
        yy, xx = np.mgrid[0:h, 0:w] / 64.0
        base = 0.5 + 0.3 * np.sin(xx) * np.cos(yy)
        img = np.stack([base, base * 0.9, base**1.3], -1)
        img = img + 0.004 * rng.standard_normal(img.shape)  # ~±1 level, photo-like
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    def test_roundtrip_and_ratio(self, tmp_path, rng):
        from mobilesuperresolution_tpu.data.io_cache import ArrayCache

        cache = ArrayCache(str(tmp_path), compress=True)
        imgs = {f"k{i}": self._natural(rng) for i in range(3)}
        for k, v in imgs.items():
            cache.add(k, v)
        for k, v in imgs.items():
            np.testing.assert_array_equal(np.asarray(cache.get(k)), v)
        assert cache.ratio() < 0.5, cache.ratio()

    def test_mixed_forms_read_back(self, tmp_path, rng):
        from mobilesuperresolution_tpu.data.io_cache import ArrayCache

        raw = ArrayCache(str(tmp_path), compress=False)
        a = self._natural(rng, 32, 32)
        raw.add("a", a)
        # a compressed-mode cache over the same dir reads the raw entry
        # (mmap fast path) and adds new entries compressed
        mixed = ArrayCache(str(tmp_path), compress=True)
        assert "a" in mixed
        got = mixed.get("a")
        assert isinstance(got, np.memmap)  # raw entries keep zero-copy reads
        np.testing.assert_array_equal(np.asarray(got), a)
        b = self._natural(rng, 32, 32)
        mixed.add("b", b)
        assert (tmp_path / "b.npz").exists() and not (tmp_path / "b.npy").exists()
        np.testing.assert_array_equal(np.asarray(raw.get("b")), b)

    def test_add_is_idempotent(self, tmp_path, rng):
        from mobilesuperresolution_tpu.data.io_cache import ArrayCache

        cache = ArrayCache(str(tmp_path), compress=True)
        a = self._natural(rng, 16, 16)
        cache.add("a", a)
        cache.add("a", np.zeros_like(a))  # ignored: key exists
        np.testing.assert_array_equal(np.asarray(cache.get("a")), a)
        assert cache.added == 1


def test_synthetic_vsr_default_flags_work():
    """The shipped synthetic_vsr defaults must produce a trainable item —
    lr_patch_size has to fit inside the 24x24 LR frames (96/scale=4) with
    the width sampler's jitter margin (review: the old default of 24 left
    no valid crop position and crashed the first item)."""
    import argparse

    from mobilesuperresolution_tpu.core import modes
    from mobilesuperresolution_tpu.data import get_dataset_module

    mod = get_dataset_module("synthetic_vsr")
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", default=0, type=int)
    mod.update_argparser(parser)
    params = parser.parse_args([])
    ds = mod.get_dataset(modes.TRAIN, params)
    lr, hr = ds[0]
    assert lr.shape[1] == lr.shape[2] == params.lr_patch_size
    assert hr.shape[1] == lr.shape[1] * params.scale


def test_train_sample_patch_flag_parses_false():
    import argparse

    from mobilesuperresolution_tpu.data import vsr as _vsr

    parser = argparse.ArgumentParser()
    _vsr.update_argparser(parser)
    assert parser.parse_args(["--train_sample_patch", "False"]).train_sample_patch is False
    assert parser.parse_args(["--train_sample_patch", "true"]).train_sample_patch is True
    assert parser.parse_args([]).train_sample_patch is True


def test_bicubic_dataset_zero_boundary(tmp_path):
    """--ignored_boundary_size 0 must train on the full patch, not an empty
    lr[0:0] slice."""
    import argparse

    from PIL import Image

    from mobilesuperresolution_tpu.core import modes
    from mobilesuperresolution_tpu.data.isr import (
        ImageSRBicubicDataset,
        update_argparser,
    )

    rng = np.random.default_rng(0)
    f = tmp_path / "img.png"
    Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(f)
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", default=0, type=int)
    update_argparser(parser)
    params = parser.parse_args(
        ["--ignored_boundary_size", "0", "--lr_patch_size", "16"]
    )
    ds = ImageSRBicubicDataset(modes.TRAIN, params, [("img", str(f))])
    lr, hr = ds[0]
    assert lr.shape == (16, 16, 3)
    assert hr.shape == (32, 32, 3)
