"""Frame-file helpers (reference: utils/rename.py, datasets/test_raw.py).

- ``renumber_frames``: zero-padded sequential renaming of dumped frames so
  ffmpeg %04d patterns pick them up (the reference's rename helper).
- ``check_raw_layout``: sanity-check a raw interleaved RGB frame file by
  decoding a thumbnail (the reference wrote jpgs from raw to eyeball the
  layout; we verify shape/dtype and return the decoded corner).
"""

import os

import numpy as np


def renumber_frames(directory, ext=".png", width=4, dry_run=False):
    """Rename files in sorted order to 0000.png, 0001.png, ... Returns the
    mapping applied.

    Two-phase (via unique temp names) so a rename target colliding with a
    not-yet-renamed source file can never clobber it — e.g. ['!.png',
    '0000.png'] would otherwise overwrite the real 0000.png in pass one."""
    files = sorted(f for f in os.listdir(directory) if f.endswith(ext))
    mapping = [
        (f, f"{i:0{width}d}{ext}") for i, f in enumerate(files)
        if f != f"{i:0{width}d}{ext}"
    ]
    if dry_run or not mapping:
        return mapping
    tmp = [f"__renum_{os.getpid()}_{i}{ext}.tmp" for i in range(len(mapping))]
    for (src, _), t in zip(mapping, tmp):
        os.rename(os.path.join(directory, src), os.path.join(directory, t))
    for (_, dst), t in zip(mapping, tmp):
        os.rename(os.path.join(directory, t), os.path.join(directory, dst))
    return mapping


def check_raw_layout(path, shape):
    """Validate an interleaved uint8 RGB .raw file against the expected
    (H, W, C) shape; returns the top-left 8x8 patch for inspection."""
    data = np.fromfile(path, dtype=np.uint8)
    expected = int(np.prod(shape))
    if data.size != expected:
        raise ValueError(f"{path}: {data.size} bytes, expected {expected} for {shape}")
    img = data.reshape(shape)
    return img[:8, :8]
