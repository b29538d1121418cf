"""ctypes binding for the native bicubic core (native/imresize.cc).

Drop-in fast path for uint8 MATLAB-exact resize on the host: identical taps
and rounding as imresize_np (weights/indices are computed by the same Python
code; the C++ core only executes the gather+weighted-sum). Falls back to the
numpy path when the shared library hasn't been built (``make -C native``).
"""

import ctypes
import functools

import numpy as np

from mobilesuperresolution_tpu.data.imresize import (
    contributions,
    derive_size_from_scale,
    imresize_np,
)

from mobilesuperresolution_tpu.core.native_path import find_native_lib


@functools.lru_cache(maxsize=1)
def _lib():
    path = find_native_lib("libimresize.so")
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    for name in ("resize_rows_u8", "resize_cols_u8"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int,
        ]
    return lib


def native_available():
    return _lib() is not None


@functools.lru_cache(maxsize=256)
def _contrib_cached(in_len, out_len, scale):
    w, idx = contributions(in_len, out_len, scale)
    return np.ascontiguousarray(w), np.ascontiguousarray(idx.astype(np.int32))


def imresize_u8(I, scalar_scale=None, output_shape=None):
    """uint8 HWC MATLAB-exact resize via the native core (numpy fallback)."""
    lib = _lib()
    if lib is None or I.dtype != np.uint8:
        return imresize_np(I, scalar_scale=scalar_scale, output_shape=output_shape)

    I = np.ascontiguousarray(I)
    was_2d = I.ndim == 2
    if was_2d:
        I = I[:, :, None]
    if scalar_scale is not None:
        scale = [float(scalar_scale)] * 2
        out_size = derive_size_from_scale(I.shape, float(scalar_scale))
    elif output_shape is not None:
        scale = [output_shape[k] / I.shape[k] for k in range(2)]
        out_size = list(output_shape)
    else:
        # mirror imresize_np's explicit error (the native path would
        # otherwise die with an opaque NoneType TypeError)
        raise ValueError("need scalar_scale or output_shape")

    order = np.argsort(np.array(scale), kind="stable")
    B = I
    for k in range(2):
        dim = int(order[k])
        w, idx = _contrib_cached(B.shape[dim], out_size[dim], scale[dim])
        h, wid, c = B.shape
        if dim == 0:
            out = np.empty((out_size[0], wid, c), np.uint8)
            lib.resize_rows_u8(
                B.ctypes.data, h, wid, c,
                w.ctypes.data, idx.ctypes.data, w.shape[1],
                out.ctypes.data, out_size[0],
            )
        else:
            out = np.empty((h, out_size[1], c), np.uint8)
            lib.resize_cols_u8(
                B.ctypes.data, h, wid, c,
                w.ctypes.data, idx.ctypes.data, w.shape[1],
                out.ctypes.data, out_size[1],
            )
        B = out
    if was_2d:
        B = B[:, :, 0]
    return B
