"""ctypes binding for the native data-loading core (native/loader.cc).

Two entry points, each with a pure-numpy fallback when the shared library
hasn't been built (``make -C native``):

- ``yuv420_to_rgb(y, u, v)`` — multithreaded BT.601 full-range conversion,
  bit-identical to data/yuv.py's numpy path (reference:
  datasets/yuv420_to_bgr.py:5-24).
- ``load_raw_window(paths, frame_shape, flip_bgr)`` — parallel read of a
  window of raw frames into one contiguous (T, H, W, C) uint8 array, the
  native replacement for per-frame np.fromfile in the NEMO pipeline
  (reference: datasets/_vsr.py:461-489).
"""

import ctypes
import functools
import os

import numpy as np

from mobilesuperresolution_tpu.core.native_path import find_native_lib


@functools.lru_cache(maxsize=1)
def _lib():
    path = find_native_lib("libloader.so")
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.yuv420_to_rgb_u8.restype = None
    lib.yuv420_to_rgb_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.load_raw_frames.restype = ctypes.c_int
    lib.load_raw_frames.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int64,
        ctypes.c_int, ctypes.c_void_p,
    ]
    return lib


def native_available():
    return _lib() is not None


def yuv420_to_rgb(y, u, v):
    """y: (H, W) uint8; u, v: (H/2, W/2) uint8 → (H, W, 3) uint8 RGB."""
    lib = _lib()
    h, w = y.shape
    if (
        lib is None
        or y.dtype != np.uint8
        or u.dtype != np.uint8
        or v.dtype != np.uint8
        or h % 2 or w % 2
        or u.shape != (h // 2, w // 2)
        or v.shape != (h // 2, w // 2)
    ):
        from mobilesuperresolution_tpu.data.yuv import yuv420_to_rgb as np_path

        return np_path(y, u, v)
    y = np.ascontiguousarray(y)
    u = np.ascontiguousarray(u)
    v = np.ascontiguousarray(v)
    out = np.empty((h, w, 3), np.uint8)
    lib.yuv420_to_rgb_u8(
        y.ctypes.data, u.ctypes.data, v.ctypes.data, h, w, out.ctypes.data
    )
    return out


def load_raw_window(paths, frame_shape, flip_bgr=False):
    """Read ``len(paths)`` raw uint8 frames of ``frame_shape`` (H, W, C) into
    one (T, H, W, C) array. Returns None if the native library is missing or
    any frame fails (caller falls back to per-file numpy reads, which produce
    the precise exception)."""
    if flip_bgr and (len(frame_shape) < 1 or frame_shape[-1] != 3):
        # the C side swaps byte TRIPLETS (frame_bytes/3 truncates) — on a
        # non-3-channel frame that silently scrambles data, so reject here
        raise ValueError(f"flip_bgr requires 3-channel frames, got {frame_shape}")
    lib = _lib()
    if lib is None:
        return None
    n = len(paths)
    frame_bytes = int(np.prod(frame_shape))
    out = np.empty((n,) + tuple(frame_shape), np.uint8)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    rc = lib.load_raw_frames(
        arr, n, frame_bytes, 1 if flip_bgr else 0, out.ctypes.data
    )
    if rc != 0:
        return None
    return out
