"""Standard SISR eval sets: Set5 / Set14 / BSDS100 / Urban100.

Reference: datasets/{set5,set14,bsds100,urban100}.py — thin bicubic wrappers
over ``<data_dir>/<Name>/`` PNG/BMP directories, eval-only.
"""

import os
from types import SimpleNamespace

from mobilesuperresolution_tpu.core import modes
from mobilesuperresolution_tpu.data import isr as _isr

_DIRS = {
    "set5": "Set5",
    "set14": "Set14",
    "bsds100": "BSDS100",
    "urban100": "Urban100",
}


def list_image_files(d):
    files = sorted(os.listdir(d))
    return [(f, os.path.join(d, f)) for f in files if f.endswith((".png", ".bmp"))]


def bind(name):
    dirname = _DIRS[name]

    def update_argparser(parser):
        _isr.update_argparser(parser)
        parser.set_defaults(num_channels=3, eval_batch_size=1)

    def get_dataset(mode, params):
        if mode != modes.EVAL:
            raise NotImplementedError(f"{name} is eval-only")
        root = os.path.join(getattr(params, "data_dir", "data"), dirname)
        hr_files = list_image_files(root)
        cache = (
            os.path.join(params.cache_dir, name)
            if getattr(params, "cache_dir", None)
            else None
        )
        return _isr.ImageSRBicubicDataset(mode, params, hr_files, cache_dir=cache)

    return SimpleNamespace(
        name=name, update_argparser=update_argparser, get_dataset=get_dataset
    )
