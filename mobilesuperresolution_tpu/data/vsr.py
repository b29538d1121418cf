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
    parser.add_argument("--train_sample_patch",
                        type=lambda v: str(v).lower() != "false",
                        default=True,
                        help="False = train on whole frames, no patch crop.")
    parser.set_defaults(train_batch_size=16, eval_batch_size=1, image_mean=0.5)


class VideoSRDataset:
    """lr_windows / hr_windows: list of windows; each window is a list of
    (key, path-or-None) frame entries. Subclasses override ``_load_frame``.

    short_frame_guard: pin the vertical crop to 0 for frames <= 68 px tall
    (the reference base's Vimeo-LR special case, _vsr.py:77-82; its MV
    variant omits it, _vsr.py:334-338 — RedsWithMVDataset sets False)."""

    short_frame_guard = True

    def __init__(self, mode, params, lr_windows, hr_windows, cache_dir=None):
        # LR/HR windows are paired by index: a missing/extra file in either
        # tree would silently shift every later pair, so fail loudly instead
        if len(lr_windows) != len(hr_windows):
            raise ValueError(
                f"LR/HR window count mismatch: {len(lr_windows)} vs "
                f"{len(hr_windows)} — the two directory trees are out of sync"
            )
        for lw, hw in zip(lr_windows, hr_windows):
            if len(lw) != len(hw):
                raise ValueError(
                    f"LR/HR frame count mismatch within a window: "
                    f"{[k for k, _ in lw]} vs {[k for k, _ in hw]}"
                )
        self.mode = mode
        self.params = params
        self.lr_windows = lr_windows
        self.hr_windows = hr_windows
        self.cache = (
            ArrayCache(cache_dir, compress=bool(getattr(params, "cache_compress", 1)))
            if cache_dir
            else None
        )
        self.rng = np.random.default_rng(getattr(params, "seed", 0))

    def prepare_cache(self):
        if self.cache is None:
            return
        for window in list(self.lr_windows) + list(self.hr_windows):
            for key, path in window:
                if path is not None and key not in self.cache:
                    self.cache.add(key, load_image(path))
        self.cache.log_build_stats(f"{type(self).__name__} cache")

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

    def _extra_frames(self, index):
        """Optional per-LR-frame extra channels: None, or a list (len T) of
        (H, W, Ce) float32 arrays concatenated onto the normalized LR (NOT
        /255-scaled — e.g. codec motion vectors are pixel displacements).
        They receive the same patch crop and flips as the LR frames."""
        return None

    def _flip_extra(self, lr, axis):
        """Adjust extra channels after a flip along ``axis`` ('width' or
        'height') — e.g. negate the flipped displacement component."""
        return lr

    def __getitem__(self, index):
        return self.item(index, self.rng)

    def item(self, index, rng):
        """__getitem__ with the random stream passed in — ``_batches`` derives
        it purely from (epoch seed, index) so the clip/patch/flip stream is
        replayable (mid-epoch exact resume, train/preemption.py)."""
        if self.mode == modes.TRAIN:
            index = index // self.params.num_patches
        lr_list, hr_list = self._load_item(index)
        extra_list = self._extra_frames(index)
        p = self.params
        p1, p2 = rng.random(), rng.random()
        sample = self.mode == modes.TRAIN and getattr(p, "train_sample_patch", True)
        if sample:
            # patch coordinates are only meaningful (and only valid —
            # eval frames may be smaller than the patch) in TRAIN mode
            b = p.ignored_boundary_size
            h0, w0 = lr_list[0].shape[:2]
            if self.short_frame_guard and h0 <= 68:
                x = 0
            else:
                x = int(rng.integers(b, h0 - p.lr_patch_size + 1 - b))
            y = int(rng.integers(b, w0 - p.lr_patch_size + 1 - b))
            ps, s = p.lr_patch_size, p.scale
            lr_list = [f[x : x + ps, y : y + ps] for f in lr_list]
            hr_list = [f[x * s : (x + ps) * s, y * s : (y + ps) * s] for f in hr_list]
            if extra_list is not None:
                extra_list = [m[x : x + ps, y : y + ps] for m in extra_list]

        lr = np.stack([np.ascontiguousarray(f) for f in lr_list]).astype(np.float32) / 255.0
        hr = np.stack([np.ascontiguousarray(f) for f in hr_list]).astype(np.float32) / 255.0
        if extra_list is not None:
            lr = np.concatenate(
                [lr, np.stack(extra_list).astype(np.float32)], axis=-1
            )

        if self.mode == modes.TRAIN:
            if p1 < 0.5:  # horizontal flip (width axis)
                lr, hr = lr[:, :, ::-1].copy(), hr[:, :, ::-1]
                lr = self._flip_extra(lr, "width")
            if p2 < 0.5:  # vertical flip (height axis)
                lr, hr = lr[:, ::-1].copy(), hr[:, ::-1]
                lr = self._flip_extra(lr, "height")
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
