"""REDS with codec motion vectors.

Reference: datasets/reds_with_mv.py + datasets/_vsr.py:258-433. Per clip, the
encoder dump ``<clip>/hex-me16-ref1/motion.npy`` holds per-frame (H, W, 2)
motion vectors; the item concatenates MV channels onto the LR frames →
(T, h, w, 5) with the patch crop and flips applied to the MV field too.
MV values are NOT divided by 255 (they are pixel displacements). The corrupt
clip '153' is skipped (reference reds_with_mv.py:132).
"""

import os

import numpy as np

from mobilesuperresolution_tpu.core import modes
from mobilesuperresolution_tpu.data import vsr as _vsr
from mobilesuperresolution_tpu.data.reds import list_clip_windows


def update_argparser(parser):
    _vsr.update_argparser(parser)
    parser.add_argument("--val_image_batch", default=100, type=int)
    parser.set_defaults(
        num_channels=5, num_patches=1000, train_batch_size=16, eval_batch_size=1
    )


class RedsWithMVDataset(_vsr.VideoSRDataset):
    """Base crop/flip pipeline via the _extra_frames/_flip_extra hooks; this
    class only supplies the motion-vector channels and their flip negation."""

    short_frame_guard = False  # reference MV variant crops unguarded (_vsr.py:334)

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._motion_cache = {}

    def _motion(self, clip_dir):
        """Per-clip motion.npy mmap, opened once (not per frame per item)."""
        if clip_dir not in self._motion_cache:
            self._motion_cache[clip_dir] = np.load(
                os.path.join(clip_dir, "hex-me16-ref1", "motion.npy"),
                mmap_mode="r",
            )
        return self._motion_cache[clip_dir]

    def _extra_frames(self, index):
        out = []
        for _, path in self.lr_windows[index]:
            clip_dir, frame_name = os.path.split(path)
            frame = int(frame_name.split(".")[0])
            out.append(np.asarray(self._motion(clip_dir)[frame], dtype=np.float32))
        return out  # T x (H, W, 2)

    def _flip_extra(self, lr, axis):
        # flips must NEGATE the motion-vector displacement component along
        # the flipped axis (channels 3=dx, 4=dy): a mirrored pixel that
        # moved +dx now moves -dx in the mirrored clip.
        ch = 3 if axis == "width" else 4
        lr[..., ch] = -lr[..., ch]
        return lr


def get_dataset(mode, params):
    root = os.path.join(getattr(params, "data_dir", "data"), "REDS")
    split = "train" if mode == modes.TRAIN else "val"
    lr_dir = os.path.join(root, split, f"{split}_sharp_bicubic", f"X{params.scale}")
    hr_dir = os.path.join(root, split, f"{split}_sharp")
    batch = params.image_batch if mode == modes.TRAIN else params.val_image_batch

    def keep(windows):
        return [w for w in windows if not w[0][0].startswith("153/")]

    lr_windows = keep(list_clip_windows(lr_dir, batch))
    hr_windows = keep(list_clip_windows(hr_dir, batch))
    return RedsWithMVDataset(mode, params, lr_windows, hr_windows)
