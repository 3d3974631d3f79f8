"""ctypes bridge to the native decode kernels (swapnet_tpu/native/decoder.cpp).

Builds libswapnet_native.so with g++ on first use (cached next to the
source); every entry point has a numpy fallback so the framework runs
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "decoder.cpp")
_SO = os.path.join(_NATIVE_DIR, "libswapnet_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_f64p = ctypes.POINTER(ctypes.c_double)


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.csc_to_dense_u8.argtypes = [
            _f64p, _i32p, _i32p, ctypes.c_int32, ctypes.c_int32, _u8p
        ]
        lib.csc_to_dense_resized_u8.argtypes = [
            _f64p, _i32p, _i32p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, _u8p, _u8p,
        ]
        lib.resize_labels_nearest_u8.argtypes = [
            _u8p, ctypes.c_int32, ctypes.c_int32, _u8p, ctypes.c_int32, ctypes.c_int32
        ]
        lib.dense_u8_to_csc.argtypes = [
            _u8p, ctypes.c_int32, ctypes.c_int32, _f64p, _i32p, _i32p
        ]
        lib.dense_u8_to_csc.restype = ctypes.c_int64
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctype)


def csc_to_dense_resized(
    data: np.ndarray, indices: np.ndarray, indptr: np.ndarray,
    rows: int, cols: int, out_h: int, out_w: int,
) -> Optional[np.ndarray]:
    """Fused CSC expand + nearest resize.  Returns None if no native lib."""
    lib = get_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.float64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    scratch = np.empty((rows, cols), dtype=np.uint8)
    out = np.empty((out_h, out_w), dtype=np.uint8)
    lib.csc_to_dense_resized_u8(
        _ptr(data, _f64p), _ptr(indices, _i32p), _ptr(indptr, _i32p),
        rows, cols, out_h, out_w, _ptr(scratch, _u8p), _ptr(out, _u8p),
    )
    return out


def csc_to_dense(
    data: np.ndarray, indices: np.ndarray, indptr: np.ndarray, rows: int, cols: int
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.float64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    out = np.empty((rows, cols), dtype=np.uint8)
    lib.csc_to_dense_u8(
        _ptr(data, _f64p), _ptr(indices, _i32p), _ptr(indptr, _i32p),
        rows, cols, _ptr(out, _u8p),
    )
    return out
