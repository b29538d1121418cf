"""NEMO raw-frame video dataset (240p LR → 1080p HR).

Reference: datasets/nemo.py + datasets/_vsr.py:435-508 (NemoHdf5Dataset).
Frames are raw interleaved BGR uint8 files produced by the YUV420 converter
(datasets/yuv420_to_bgr.py → data/yuv.py here): LR 240x426x3, HR 1080x1920x3.
Windows: TRAIN stride 25, EVAL stride image_batch (nemo.py:146-160); the
window file lists are dumped as CSVs into the job dir (nemo.py:124-135).
"""

import csv
import os

import numpy as np

from mobilesuperresolution_tpu.core import modes
from mobilesuperresolution_tpu.data import vsr as _vsr

LR_SHAPE = (240, 426, 3)
HR_SHAPE = (1080, 1920, 3)


def update_argparser(parser):
    _vsr.update_argparser(parser)
    parser.add_argument("--val_image_batch", default=100, type=int)
    parser.add_argument("--raw_order", default="rgb", choices=["rgb", "bgr"],
                        help="Channel order of .raw frames: 'rgb' for "
                        "data/yuv.py output, 'bgr' for the reference "
                        "converter's rawfiles.")
    parser.set_defaults(
        num_channels=3, num_patches=1000, train_batch_size=16, eval_batch_size=1
    )


def list_raw_windows(d, mode, image_batch):
    files = sorted(os.listdir(d))
    files = [(f, os.path.join(d, f)) for f in files if "_" not in f]
    stride = 25 if mode == modes.TRAIN else image_batch
    n = len(files)
    return [files[i : i + image_batch] for i in range(0, n + 1 - image_batch, stride)]


class NemoDataset(_vsr.VideoSRDataset):
    """raw_order: 'rgb' for frames from this repo's converter (data/yuv.py
    writes RGB), 'bgr' for rawfiles produced by the reference's
    yuv420_to_bgr.py (channel-reversed on read)."""

    def __init__(self, mode, params, lr_windows, hr_windows, raw_order="rgb"):
        super().__init__(mode, params, lr_windows, hr_windows, cache_dir=None)
        assert raw_order in ("rgb", "bgr")
        self.raw_order = raw_order

    @staticmethod
    def _raw_shape(path):
        """Frame shape by file size (deterministic — a filename heuristic
        misclassifies e.g. hr/0240.raw); falls back to the directory tag for
        nonexistent paths (unit tests)."""
        try:
            size = os.path.getsize(path)
        except OSError:
            size = -1
        if size == int(np.prod(LR_SHAPE)):
            return LR_SHAPE
        if size == int(np.prod(HR_SHAPE)):
            return HR_SHAPE
        return LR_SHAPE if "lr" in os.path.dirname(path).lower() else HR_SHAPE

    def _load_frame(self, key, path):
        if path.endswith(".raw"):
            arr = np.fromfile(path, dtype=np.uint8).reshape(self._raw_shape(path))
            return arr[..., ::-1] if self.raw_order == "bgr" else arr
        return super()._load_frame(key, path)

    def _load_window(self, window):
        """Whole-window parallel read via the native core; per-frame numpy
        fallback (which raises the precise error) when unavailable."""
        paths = [p for _, p in window]
        if all(p.endswith(".raw") for p in paths):
            from mobilesuperresolution_tpu.data import native_loader

            batch = native_loader.load_raw_window(
                paths, self._raw_shape(paths[0]), flip_bgr=self.raw_order == "bgr"
            )
            if batch is not None:
                return list(batch)
        return [self._load_frame(k, p) for k, p in window]

    def _load_item(self, index):
        return (
            self._load_window(self.lr_windows[index]),
            self._load_window(self.hr_windows[index]),
        )


def get_dataset(mode, params):
    root = os.path.join(getattr(params, "data_dir", "data"), "nemo")
    split = "train" if mode == modes.TRAIN else "eval"
    lr_dir = os.path.join(root, split, "lr")
    hr_dir = os.path.join(root, split, "hr")
    batch = params.image_batch if mode == modes.TRAIN else params.val_image_batch
    lr_windows = list_raw_windows(lr_dir, mode, batch)
    hr_windows = list_raw_windows(hr_dir, mode, batch)

    job_dir = getattr(params, "job_dir", None)
    if job_dir:
        tag = "_train.csv" if mode == modes.TRAIN else "_eval.csv"
        for prefix, windows in (("lr", lr_windows), ("hr", hr_windows)):
            with open(os.path.join(job_dir, prefix + tag), "w", newline="") as fh:
                w = csv.writer(fh)
                for win in windows:
                    w.writerow([p for _, p in win])
    return NemoDataset(
        mode, params, lr_windows, hr_windows,
        raw_order=getattr(params, "raw_order", "rgb"),
    )
