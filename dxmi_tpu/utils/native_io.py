"""ctypes bindings for the native host-I/O library (csrc/dxmi_io.cpp).

Provides a threaded zlib PNG writer so bulk sample dumps (10k-50k images
per FID round) never stall the device loop. Auto-builds the shared
library on first use when a toolchain is present; falls back to PIL
otherwise (same API).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.join(_CSRC, "libdxmi_io.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", os.path.abspath(_CSRC)],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.dxmi_io_init.argtypes = [ctypes.c_int]
        lib.dxmi_io_write_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.dxmi_io_write_png.restype = ctypes.c_int
        lib.dxmi_io_write_png_async.argtypes = lib.dxmi_io_write_png.argtypes
        lib.dxmi_io_write_png_async.restype = ctypes.c_int
        lib.dxmi_io_flush.restype = ctypes.c_long
        lib.dxmi_io_init(0)
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _as_ptr(img: np.ndarray):
    img = np.ascontiguousarray(img, dtype=np.uint8)
    return img, img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def write_png(path: str, img: np.ndarray) -> None:
    """Synchronous PNG write. img: (H, W, C) uint8."""
    lib = _load()
    h, w, c = img.shape
    if lib is not None:
        img, ptr = _as_ptr(img)
        if lib.dxmi_io_write_png(path.encode(), ptr, h, w, c) == 0:
            return
    from PIL import Image

    Image.fromarray(img).save(path)


def write_png_async(path: str, img: np.ndarray) -> bool:
    """Queue a PNG write on the native thread pool. Returns False if the
    native library is unavailable (caller should fall back)."""
    lib = _load()
    if lib is None:
        return False
    h, w, c = img.shape
    img, ptr = _as_ptr(img)
    lib.dxmi_io_write_png_async(path.encode(), ptr, h, w, c)
    return True


def flush() -> int:
    """Wait for queued writes; returns the number of failed writes."""
    lib = _load()
    if lib is None:
        return 0
    return int(lib.dxmi_io_flush())
