"""ctypes bindings for the native batch loader, with numpy fallbacks."""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libbatch_loader.so"
_lib = None


def build_library(force=False):
    """Compile batch_loader.cpp with g++ (no pybind11 needed)."""
    if _LIB_PATH.exists() and not force:
        return str(_LIB_PATH)
    src = _HERE / "batch_loader.cpp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        str(src), "-o", str(_LIB_PATH),
    ]
    subprocess.run(cmd, check=True)
    return str(_LIB_PATH)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            build_library()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.gather_normalize_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.rot90_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_void_p,
    ]
    lib.gather_i64.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    _lib = lib
    return lib


def library_available():
    return _load() is not None


def gather_normalize_f32(src_u8, indices, scale=1.0 / 255.0, num_threads=0):
    """src_u8: (N, ...) uint8 array/memmap; indices: (B,) int64.
    Returns (B, ...) float32 = src[indices] * scale."""
    src = np.ascontiguousarray(src_u8.reshape(src_u8.shape[0], -1)) \
        if not src_u8.flags["C_CONTIGUOUS"] else src_u8.reshape(src_u8.shape[0], -1)
    idx = np.ascontiguousarray(np.asarray(indices, np.int64))
    item = int(np.prod(src_u8.shape[1:]))
    out = np.empty((len(idx), item), np.float32)
    lib = _load()
    if lib is None:  # numpy fallback
        out[:] = src[idx].astype(np.float32) * scale
    else:
        if num_threads <= 0:
            num_threads = min(os.cpu_count() or 1, 8)
        lib.gather_normalize_f32(
            src.ctypes.data, idx.ctypes.data, len(idx), item,
            ctypes.c_float(scale), out.ctypes.data, num_threads,
        )
    return out.reshape((len(idx),) + tuple(src_u8.shape[1:]))


def rot90_f32(img_chw, k):
    """(c, h, w) float32 rotated CCW by k*90 degrees."""
    img = np.ascontiguousarray(img_chw, np.float32)
    c, h, w = img.shape
    k = k % 4
    out_shape = (c, h, w) if k % 2 == 0 else (c, w, h)
    lib = _load()
    if lib is None:
        return np.rot90(img, k, axes=(-2, -1)).copy()
    out = np.empty(out_shape, np.float32)
    lib.rot90_f32(img.ctypes.data, c, h, w, k, out.ctypes.data)
    return out


def gather_i64(src_i64, indices):
    src = np.ascontiguousarray(src_i64.reshape(src_i64.shape[0], -1))
    idx = np.ascontiguousarray(np.asarray(indices, np.int64))
    item = int(np.prod(src_i64.shape[1:]))
    out = np.empty((len(idx), item), np.int64)
    lib = _load()
    if lib is None:
        out[:] = src[idx]
    else:
        lib.gather_i64(src.ctypes.data, idx.ctypes.data, len(idx), item,
                       out.ctypes.data)
    return out.reshape((len(idx),) + tuple(src_i64.shape[1:]))
