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
    def _mv_for(self, key, path):
        clip_dir, frame_name = os.path.split(path)
        frame = int(frame_name.split(".")[0])
        mv_npy = np.load(
            os.path.join(clip_dir, "hex-me16-ref1", "motion.npy"), mmap_mode="r"
        )
        return np.asarray(mv_npy[frame], dtype=np.float32)  # (H, W, 2)

    def __getitem__(self, index):
        p = self.params
        if self.mode == modes.TRAIN:
            index = index // p.num_patches
        lr_list, hr_list = self._load_item(index)
        mv_list = [self._mv_for(k, path) for k, path in self.lr_windows[index]]

        if self.mode == modes.TRAIN:
            p1, p2 = self.rng.random(), self.rng.random()
            b = p.ignored_boundary_size
            h0, w0 = lr_list[0].shape[:2]
            x = int(self.rng.integers(b, h0 - p.lr_patch_size + 1 - b))
            y = int(self.rng.integers(b, w0 - p.lr_patch_size + 1 - b))
            s, ps = p.scale, p.lr_patch_size
            lr_list = [f[x : x + ps, y : y + ps] for f in lr_list]
            mv_list = [m[x : x + ps, y : y + ps] for m in mv_list]
            hr_list = [f[x * s : (x + ps) * s, y * s : (y + ps) * s] for f in hr_list]

        lr = np.stack(lr_list).astype(np.float32) / 255.0
        hr = np.stack(hr_list).astype(np.float32) / 255.0
        mv = np.stack(mv_list).astype(np.float32)
        lr = np.concatenate([lr, mv], axis=-1)  # (T, h, w, 5)

        if self.mode == modes.TRAIN:
            # flips must also NEGATE the motion-vector displacement component
            # along the flipped axis (channels 3=dx, 4=dy): a mirrored pixel
            # that moved +dx now moves -dx in the mirrored clip.
            if p1 < 0.5:  # horizontal (width) flip
                lr, hr = lr[:, :, ::-1].copy(), hr[:, :, ::-1]
                lr[..., 3] = -lr[..., 3]
            if p2 < 0.5:  # vertical (height) flip
                lr, hr = lr[:, ::-1].copy(), hr[:, ::-1]
                lr[..., 4] = -lr[..., 4]
            return np.ascontiguousarray(lr), np.ascontiguousarray(hr)

        key0 = self.lr_windows[index][0][0]
        parts = os.path.splitext(key0)[0].split("/")
        save_path = (parts[-2] + parts[-1]) if len(parts) >= 2 else parts[-1]
        return save_path, lr, hr


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
