"""ctypes bindings for the native library (built on demand; silently falls
back to the pure-Python decoders in asdslam_tpu.io.datasets when a toolchain
is unavailable)."""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        from asdslam_tpu.native.build import build
        path = build()
        lib = ctypes.CDLL(path)
        lib.png_gray_size.restype = ctypes.c_int
        lib.png_gray_size.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.png_decode_gray.restype = ctypes.c_int
        lib.png_decode_gray.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def decode_png_gray(data: bytes) -> Optional[np.ndarray]:
    """Decode PNG bytes to float32 [H, W] in [0, 1], or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.png_gray_size(bp, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value), np.float32)
    rc = lib.png_decode_gray(bp, len(data),
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return out
