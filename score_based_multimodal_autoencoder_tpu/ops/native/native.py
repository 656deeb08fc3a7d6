"""ctypes bindings for the native host-side data kernels.

The shared library is built on first use with the system g++ (no pybind11
in this environment; plain C ABI + ctypes). All entry points degrade to
NumPy when the toolchain or build is unavailable, so the framework never
hard-depends on native code.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "gather_normalize.cpp")
_SO = os.path.join(_HERE, "libnative.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _SO, _SRC, "-pthread"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.gather_normalize_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ]
            lib.gather_normalize_u8.restype = None
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def gather_normalize_u8(src: np.ndarray, idx: np.ndarray,
                        n_threads: int = 0) -> np.ndarray:
    """Fused ``src[idx].astype(f32)/255`` over the leading axis.

    src: uint8 (N, ...); idx: int array of row indices. Returns float32
    (len(idx), ...). Falls back to NumPy without a native build.
    """
    idx = np.ascontiguousarray(idx, np.int64)
    lib = _load()
    if lib is None or src.dtype != np.uint8 or not src.flags.c_contiguous:
        return src[idx].astype(np.float32) / np.float32(255.0)
    row_elems = int(np.prod(src.shape[1:]))
    out = np.empty((len(idx),) + src.shape[1:], np.float32)
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    lib.gather_normalize_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(idx), row_elems, n_threads)
    return out
