"""Procedural synthetic datasets — fake-dataset fixtures for tests, smoke
training and benchmarking without any files on disk (the test strategy the
reference lacks, SURVEY §4)."""

import numpy as np

from mobilesuperresolution_tpu.data.imresize import imresize_np
from mobilesuperresolution_tpu.data.isr import ImageSRBicubicDataset
from mobilesuperresolution_tpu.data.vsr import VideoSRDataset


def synthetic_image(seed, hw=(128, 128), textured=True):
    """Structured uint8 HWC image: gradients + sinusoid texture + noise."""
    rng = np.random.default_rng(seed)
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    f1, f2 = rng.uniform(3, 11, 2)
    img = np.stack(
        [
            127 + 90 * np.sin(yy / f1) * np.cos(xx / f2),
            127 + 110 * np.sin((xx + yy) / (f1 + f2) * 2),
            255 * xx / w,
        ],
        axis=-1,
    )
    if textured:
        img = img + rng.normal(0, 12, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


class SyntheticISRDataset(ImageSRBicubicDataset):
    def __init__(self, mode, params, num_images=8, hw=(128, 128)):
        textured = bool(getattr(params, "synthetic_textured", True))
        self._images = [
            synthetic_image(i, hw, textured=textured) for i in range(num_images)
        ]
        hr_files = [(f"synth_{i}", None) for i in range(num_images)]
        super().__init__(mode, params, hr_files)

    def _load(self, files, index):
        return self._images[index]


class SyntheticVSRDataset(VideoSRDataset):
    """Clips with simple global translation motion, LR via MATLAB bicubic."""

    def __init__(self, mode, params, num_clips=2, frames=6, hw=(96, 96)):
        t = frames
        self._lr_clips, self._hr_clips = [], []
        for c in range(num_clips):
            big = synthetic_image(100 + c, (hw[0] + 4 * t, hw[1] + 4 * t))
            hrs = [big[2 * i : 2 * i + hw[0], 2 * i : 2 * i + hw[1]] for i in range(t)]
            lrs = [imresize_np(f, scalar_scale=1.0 / params.scale) for f in hrs]
            self._hr_clips.append(hrs)
            self._lr_clips.append(lrs)
        windows = [
            [(f"clip{c}/frame{i}", None) for i in range(t)] for c in range(num_clips)
        ]
        super().__init__(mode, params, windows, windows)

    def _load_item(self, index):
        return self._lr_clips[index], self._hr_clips[index]
