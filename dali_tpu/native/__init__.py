"""Native (C++) host runtime bindings.

The native library (``libdali_tpu.so``, built from ``dali_tpu/native/src`` via
``build.py``) provides the GIL-releasing host hot paths, mirroring the reference's
C++ core (``dali/core``, ``dali/pipeline/util/thread_pool.h``): JPEG decode
(libjpeg/-turbo), Philox4x32-10, and batched memcpy/pad. Python falls back to
numpy/OpenCV when the library hasn't been built.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path():
    return os.path.join(os.path.dirname(__file__), "libdali_tpu.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.dali_tpu_has_jpeg.restype = ctypes.c_int
        lib.dali_tpu_decode_jpeg_shape.restype = ctypes.c_int
        lib.dali_tpu_decode_jpeg_shape.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.dali_tpu_decode_jpeg.restype = ctypes.c_int
        lib.dali_tpu_decode_jpeg.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,  # fancy_upsampling
        ]
        lib.dali_tpu_pad_stack_u8.restype = ctypes.c_int
        lib.dali_tpu_pad_stack_u8.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),  # sample ptrs
            ctypes.POINTER(ctypes.c_long),  # sample shapes [n*3]
            ctypes.c_int,  # n
            ctypes.c_void_p,  # out
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_long,  # canvas h, w, c
            ctypes.c_int,  # fill
            ctypes.c_int,  # num threads
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def has_jpeg() -> bool:
    lib = _load()
    return bool(lib and lib.dali_tpu_has_jpeg())


def decode_jpeg(data: bytes, fancy_upsampling: bool = True):
    """Decode baseline/progressive JPEG to RGB HWC uint8 via the native lib.

    Returns None on failure (caller falls back to OpenCV).
    """
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if lib.dali_tpu_decode_jpeg_shape(data, len(data), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), dtype=np.uint8)
    rc = lib.dali_tpu_decode_jpeg(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), h.value, w.value, 1 if fancy_upsampling else 0
    )
    if rc != 0:
        return None
    return out


def pad_stack_u8(samples, canvas, fill: int = 0, num_threads: int = 0):
    """Pad+stack HWC uint8 samples into [N, *canvas] using the native parallel
    memcpy. Returns None if unavailable (caller uses numpy)."""
    lib = _load()
    if lib is None:
        return None
    n = len(samples)
    ptrs = (ctypes.c_void_p * n)(*[s.ctypes.data_as(ctypes.c_void_p).value for s in samples])
    shp = (ctypes.c_long * (n * 3))()
    for i, s in enumerate(samples):
        shp[3 * i : 3 * i + 3] = (s.shape[0], s.shape[1], s.shape[2])
    out = np.full((n, *canvas), fill, dtype=np.uint8)
    rc = lib.dali_tpu_pad_stack_u8(
        ptrs,
        shp,
        n,
        out.ctypes.data_as(ctypes.c_void_p),
        canvas[0],
        canvas[1],
        canvas[2],
        fill,
        num_threads,
    )
    return out if rc == 0 else None
