"""ctypes binding for the native C++ image pipeline (native/libldmimg.so).

The dataset cache build (data/dataset.py) decodes + resizes + pads +
normalizes every source image once; that host-side hot path is
implemented in C++ (libjpeg/libpng, nearest resize, sigma-1 blur on
downscale, centered pad) and called here through ctypes — which releases
the GIL, so the joblib thread pool scales across cores. Falls back to
the PIL path transparently if the library isn't built (run
native/build.sh).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libldmimg.so",
)

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _LIB_PATH
    if not os.path.exists(path):
        build = os.path.join(os.path.dirname(path), "build.sh")
        if os.path.exists(build):
            try:
                subprocess.run([build], check=True, capture_output=True,
                               timeout=120)
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.ldm_preprocess.restype = ctypes.c_int
        lib.ldm_preprocess.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        if hasattr(lib, "ldm_preprocess_batch"):
            lib.ldm_preprocess_batch.restype = ctypes.c_int
            lib.ldm_preprocess_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return _load() is not None


def preprocess_batch_native(
    paths, size: int, num_threads: int = 0, out: Optional[np.ndarray] = None
):
    """Thread-pooled native batch preprocess: one C call per batch (file
    IO + decode + resize + pad all in C++, GIL released for the whole
    batch, scaling across cores with zero per-image Python dispatch).

    Returns (images float32 [n, size, size, 3], status int32 [n] with
    0 = ok) or None if the library is unavailable. `out` may supply a
    preallocated (e.g. pinned) destination buffer."""
    lib = _load()
    if lib is None or not hasattr(lib, "ldm_preprocess_batch"):
        return None
    n = len(paths)
    if out is None:
        out = np.empty((n, size, size, 3), dtype=np.float32)
    assert out.shape == (n, size, size, 3) and out.dtype == np.float32
    status = np.zeros(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(
        *[os.fsencode(p) for p in paths]
    )
    lib.ldm_preprocess_batch(
        arr, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    return out, status


def preprocess_image_native(path: str, size: int) -> Optional[np.ndarray]:
    """Native decode+preprocess; returns float32 [size, size, 3] in
    [-1, 1] or None if the library is unavailable / decode fails."""
    lib = _load()
    if lib is None:
        return None
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    out = np.empty((size, size, 3), dtype=np.float32)
    rc = lib.ldm_preprocess(
        data, len(data), size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return None
    return out
