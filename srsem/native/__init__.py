"""Native (C++) data loader: threaded JPEG/PNG decode + bicubic resize.

ctypes binding over ``decoder.cpp`` (built on first use with g++ —
pybind11 is not in this image, and the C ABI keeps the binding trivial).
Falls back cleanly when the toolchain or image libraries are absent:
callers check ``available()`` and use the PIL path otherwise
(srsem.data.preprocess).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "decoder.cpp")
_SO = os.path.join(_HERE, "libsrsem_decode.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library; returns an error string or None."""
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build_error = _build()
            if _build_error is not None:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.srsem_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.srsem_decode.restype = ctypes.c_int
        lib.srsem_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.srsem_decode_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def decode(path: str, size: int, crop_pct: float = 1.0,
           fast_jpeg: bool = False) -> Optional[np.ndarray]:
    """Decode one image → (size, size, 3) uint8, or None on failure.

    fast_jpeg enables libjpeg DCT-scaled decode (PIL ``Image.draft``
    semantics): the JPEG is decoded at the largest M/8 downscale whose
    shortest edge still covers the resize target, so the bicubic stage only
    ever downsamples.  Large inputs skip most IDCT + color-conversion work;
    outputs differ from the full decode by ~1 LSB-scale resampling noise."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.srsem_decode(
        path.encode(), size, crop_pct, int(fast_jpeg),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def decode_batch(paths: Sequence[str], size: int, crop_pct: float = 1.0,
                 n_threads: int = 16,
                 fast_jpeg: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Decode a batch in C++ worker threads.

    Returns (images (N, size, size, 3) uint8, ok (N,) bool). Failed rows are
    zero-filled with ok=False — the NaN-row contract upstream."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native decoder unavailable: {_build_error}")
    n = len(paths)
    out = np.zeros((n, size, size, 3), np.uint8)
    status = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.srsem_decode_batch(
        arr, n, size, crop_pct, int(fast_jpeg),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    return out, status == 0
