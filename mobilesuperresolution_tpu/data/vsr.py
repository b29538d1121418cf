"""Video super-resolution dataset base.

Reference: datasets/_vsr.py:49-256. Semantics preserved:
- an item is a window of ``image_batch`` consecutive frames; lr_files[index]
  is the list of frame keys for that window
- ONE random patch position shared by every frame of the clip (:74-87), with
  x forced to 0 when the LR height is ≤ 68 (the NEMO 240p case)
- ONE pair of flip decisions (horizontal p1, vertical p2) shared across the
  clip (:167-180); no transpose augment for video
- TRAIN length = windows × num_patches with index // num_patches (:69,185)
- EVAL returns (save_path, lr[T,h,w,C], hr[T,H,W,C]) with save_path built from
  the last two path components (:121-125)
"""

import os

import numpy as np

from mobilesuperresolution_tpu.core import modes
from mobilesuperresolution_tpu.data.io_cache import ArrayCache, load_image


def update_argparser(parser):
    import mobilesuperresolution_tpu.data as data_pkg

    data_pkg.update_argparser(parser)
    parser.add_argument("--scale", default=4, type=int)
    parser.add_argument("--lr_patch_size", default=48, type=int)
    parser.add_argument("--ignored_boundary_size", default=2, type=int)
    parser.add_argument("--num_patches", default=100, type=int)
    parser.add_argument("--image_batch", default=10, type=int)
    parser.add_argument("--train_sample_patch", default=True)
    parser.set_defaults(train_batch_size=16, eval_batch_size=1, image_mean=0.5)


class VideoSRDataset:
    """lr_windows / hr_windows: list of windows; each window is a list of
    (key, path-or-None) frame entries. Subclasses override ``_load_frame``."""

    def __init__(self, mode, params, lr_windows, hr_windows, cache_dir=None):
        self.mode = mode
        self.params = params
        self.lr_windows = lr_windows
        self.hr_windows = hr_windows
        self.cache = ArrayCache(cache_dir) if cache_dir else None
        self.rng = np.random.default_rng(getattr(params, "seed", 0))

    def prepare_cache(self):
        if self.cache is None:
            return
        for window in list(self.lr_windows) + list(self.hr_windows):
            for key, path in window:
                if path is not None and key not in self.cache:
                    self.cache.add(key, load_image(path))

    def _load_frame(self, key, path):
        if self.cache is not None and key in self.cache:
            return np.asarray(self.cache.get(key))
        return load_image(path)

    def _load_item(self, index):
        lrs = [self._load_frame(k, p) for k, p in self.lr_windows[index]]
        hrs = [self._load_frame(k, p) for k, p in self.hr_windows[index]]
        return lrs, hrs

    def __len__(self):
        if self.mode == modes.TRAIN:
            return len(self.lr_windows) * self.params.num_patches
        return len(self.lr_windows)

    def __getitem__(self, index):
        if self.mode == modes.TRAIN:
            index = index // self.params.num_patches
        lr_list, hr_list = self._load_item(index)
        p = self.params
        p1, p2 = self.rng.random(), self.rng.random()
        if self.mode == modes.TRAIN and getattr(p, "train_sample_patch", True):
            # patch coordinates are only meaningful (and only valid —
            # eval frames may be smaller than the patch) in TRAIN mode
            b = p.ignored_boundary_size
            h0, w0 = lr_list[0].shape[:2]
            if h0 <= 68:
                x = 0
            else:
                x = int(self.rng.integers(b, h0 - p.lr_patch_size + 1 - b))
            y = int(self.rng.integers(b, w0 - p.lr_patch_size + 1 - b))

        lrs, hrs = [], []
        for lr, hr in zip(lr_list, hr_list):
            if self.mode == modes.TRAIN and getattr(p, "train_sample_patch", True):
                lr = lr[x : x + p.lr_patch_size, y : y + p.lr_patch_size]
                hr = hr[
                    x * p.scale : (x + p.lr_patch_size) * p.scale,
                    y * p.scale : (y + p.lr_patch_size) * p.scale,
                ]
            lrs.append(np.ascontiguousarray(lr))
            hrs.append(np.ascontiguousarray(hr))
        lr = np.stack(lrs).astype(np.float32) / 255.0
        hr = np.stack(hrs).astype(np.float32) / 255.0

        if self.mode == modes.TRAIN:
            if p1 < 0.5:  # horizontal flip (width axis)
                lr, hr = lr[:, :, ::-1], hr[:, :, ::-1]
            if p2 < 0.5:  # vertical flip (height axis)
                lr, hr = lr[:, ::-1], hr[:, ::-1]
            return np.ascontiguousarray(lr), np.ascontiguousarray(hr)

        key0 = self.lr_windows[index][0][0]
        parts = os.path.splitext(key0)[0].split("/")
        save_path = (parts[-2] + parts[-1]) if len(parts) >= 2 else parts[-1]
        return save_path, lr, hr


def sliding_windows(frames, window, stride=1):
    """[(key, path)] → list of windows of length ``window``."""
    return [
        frames[i : i + window]
        for i in range(0, len(frames) - window + 1, stride)
    ]
