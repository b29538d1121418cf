"""Vimeo-90k septuplet dataset.

Reference: datasets/vimeo.py:95-148. Layout:
  <data_dir>/vimeo/<split>/<seq>/<subseq>/*.png
One window per 2-level subsequence directory; in TRAIN mode, frames are
filtered by an 'lr'/'hr' filename tag (vimeo.py:130-148).
"""

import os

from mobilesuperresolution_tpu.core import modes
from mobilesuperresolution_tpu.data import vsr as _vsr


def update_argparser(parser):
    _vsr.update_argparser(parser)
    parser.add_argument("--val_image_batch", default=7, type=int)
    parser.set_defaults(
        num_channels=3, num_patches=100, train_batch_size=16, eval_batch_size=1
    )


def list_sequence_windows(d, tag=None):
    windows = []
    for seq in sorted(os.listdir(d)):
        seq_dir = os.path.join(d, seq)
        if not os.path.isdir(seq_dir):
            continue
        for sub in sorted(os.listdir(seq_dir)):
            sub_dir = os.path.join(seq_dir, sub)
            if not os.path.isdir(sub_dir):
                continue
            frames = sorted(os.listdir(sub_dir))
            if tag is not None:
                frames = [f for f in frames if tag in f]
            windows.append(
                [
                    (os.path.join(seq, sub, f), os.path.join(sub_dir, f))
                    for f in frames
                ]
            )
    return windows


def get_dataset(mode, params):
    root = os.path.join(getattr(params, "data_dir", "data"), "vimeo")
    split = "train" if mode == modes.TRAIN else "eval"
    lr_tag = "lr" if mode == modes.TRAIN else None
    hr_tag = "hr" if mode == modes.TRAIN else None
    lr_windows = list_sequence_windows(os.path.join(root, split, "lr"), lr_tag)
    hr_windows = list_sequence_windows(os.path.join(root, split, "hr"), hr_tag)
    cache = (
        os.path.join(params.cache_dir, f"vimeo_{mode}")
        if getattr(params, "cache_dir", None)
        else None
    )
    return _vsr.VideoSRDataset(mode, params, lr_windows, hr_windows, cache_dir=cache)
