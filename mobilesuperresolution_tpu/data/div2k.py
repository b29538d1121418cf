"""DIV2K training dataset (bicubic degradation).

The reference's launchers require div2k but ``datasets/div2k.py`` is absent
from the repo (pretraining.bash:47, SURVEY §7.4) — written fresh here from the
commented-out pattern at datasets/reds.py:32-60. Layout:
  <data_dir>/DIV2K/DIV2K_train_HR/*.png   (train)
  <data_dir>/DIV2K/DIV2K_valid_HR/*.png   (eval)
LR is synthesized on the fly with the MATLAB-exact bicubic.
"""

import os

from mobilesuperresolution_tpu.core import modes
from mobilesuperresolution_tpu.data import isr as _isr
from mobilesuperresolution_tpu.data.eval_sets import list_image_files


def update_argparser(parser):
    _isr.update_argparser(parser)
    parser.set_defaults(
        num_channels=3, num_patches=100, train_batch_size=16, eval_batch_size=1
    )


def get_dataset(mode, params):
    sub = {
        modes.TRAIN: "DIV2K_train_HR",
        modes.EVAL: "DIV2K_valid_HR",
    }[mode]
    root = os.path.join(getattr(params, "data_dir", "data"), "DIV2K", sub)
    hr_files = list_image_files(root)
    cache = (
        os.path.join(params.cache_dir, f"div2k_{mode}")
        if getattr(params, "cache_dir", None)
        else None
    )
    return _isr.ImageSRBicubicDataset(mode, params, hr_files, cache_dir=cache)
