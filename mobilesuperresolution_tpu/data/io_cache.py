"""Host-side decoded-image cache.

Replaces the reference's HDF5 (h5py/pytables LZF/blosc) cache
(common/io.py:8-57) with a directory of .npy files — zero extra dependencies,
memory-mapped zero-copy reads, safe for concurrent multi-process readers
(each key is one file, written atomically via rename).
"""

import os

import numpy as np


class ArrayCache:
    def __init__(self, cache_dir):
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def _path(self, key):
        safe = key.replace("/", "__")
        return os.path.join(self.cache_dir, f"{safe}.npy")

    def __contains__(self, key):
        return os.path.exists(self._path(key))

    def add(self, key, array):
        path = self._path(key)
        if os.path.exists(path):
            return
        # per-process-unique temp name: two concurrent writers must never
        # interleave into one temp file and publish a torn .npy
        tmp = f"{path}.tmp.{os.getpid()}"
        np.save(tmp, np.ascontiguousarray(array))
        os.replace(tmp + ".npy" if os.path.exists(tmp + ".npy") else tmp, path)

    def get(self, key, mmap=True):
        return np.load(self._path(key), mmap_mode="r" if mmap else None)


def load_image(path):
    """Decode an image file → uint8 HWC numpy array (PIL, gated). Grayscale
    ('L') images are expanded to RGB so every dataset item is (H, W, 3) —
    BSDS100/Urban100 contain grayscale members."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im if im.mode == "RGB" else im.convert("RGB"))
