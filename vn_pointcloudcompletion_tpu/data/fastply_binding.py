"""ctypes binding for the native C++ PLY reader (tools/fastply.cpp).

Built via ``make -C tools`` into ``tools/libfastply.so``; the loader falls
back to the NumPy parser transparently when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "tools", "libfastply.so"),
    os.path.join(os.path.dirname(__file__), "libfastply.so"),
]

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.fastply_read_points.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.fastply_read_points.restype = ctypes.POINTER(ctypes.c_float)
            lib.fastply_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            lib.fastply_free.restype = None
            _lib = lib
            return _lib
    return None


def available() -> bool:
    return _load() is not None


def read_points(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_int64(0)
    buf = lib.fastply_read_points(path.encode(), ctypes.byref(n))
    if not buf or n.value <= 0:
        return None
    try:
        arr = np.ctypeslib.as_array(buf, shape=(n.value, 3)).copy()
    finally:
        lib.fastply_free(buf)
    return arr
