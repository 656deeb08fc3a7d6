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
_SRCS = [os.path.join(_HERE, "gather_normalize.cpp"),
         os.path.join(_HERE, "image_decode.cpp")]
_SRC = _SRCS[0]
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
                    or os.path.getmtime(_SO) < max(os.path.getmtime(s)
                                                   for s in _SRCS)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _SO, *_SRCS, "-pthread", "-lpng", "-ljpeg"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.gather_normalize_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ]
            lib.gather_normalize_u8.restype = None
            lib.decode_images.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.decode_images.restype = ctypes.c_int64
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


def decode_images(paths, height: int, width: int, channels: int = 3,
                  n_threads: int = 0) -> np.ndarray:
    """Threaded batch decode of PNG/JPEG files -> uint8 (N, H, W, C).

    Resamples to (height, width) with PIL-BILINEAR (triangle) semantics
    when sizes differ; ``channels=1`` converts with PIL's "L" luma formula.
    Falls back to PIL without a native build (or raises ImportError if PIL
    is also unavailable).
    """
    paths = [os.fspath(p) for p in paths]
    lib = _load()
    if lib is not None:
        out = np.empty((len(paths), height, width, channels), np.uint8)
        if n_threads <= 0:
            n_threads = min(16, os.cpu_count() or 1)
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        rc = lib.decode_images(
            arr, len(paths),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            height, width, channels, n_threads)
        if rc == 0:
            return out
        raise IOError(f"native decode failed for {paths[rc - 1]!r}")
    from PIL import Image

    out = np.empty((len(paths), height, width, channels), np.uint8)
    for i, p in enumerate(paths):
        img = Image.open(p).convert("RGB" if channels == 3 else "L")
        if img.size != (width, height):
            img = img.resize((width, height), Image.BILINEAR)
        a = np.asarray(img, np.uint8)
        out[i] = a if channels == 3 else a[..., None]
    return out
