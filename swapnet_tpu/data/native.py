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
_i64p = ctypes.POINTER(ctypes.c_int64)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_f64p = ctypes.POINTER(ctypes.c_double)


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    # full build first (JPEG/PNG decode; needs libjpeg/libpng headers),
    # then a decode-free build — Python falls back to PIL for images
    for extra in (
        ["-DSWAPNET_WITH_IMAGE", "-pthread", "-ljpeg", "-lpng"],
        [],
    ):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO] + extra,
                check=True, capture_output=True, timeout=120,
            )
            return _SO
        except Exception:
            continue
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
        lib.swapnet_has_image_decode.restype = ctypes.c_int32
        if lib.swapnet_has_image_decode():
            lib.decode_rgb_resize_u8.argtypes = [
                _u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                _u8p, _i32p,
            ]
            lib.decode_rgb_resize_u8.restype = ctypes.c_int32
            lib.decode_rgb_resize_batch_u8.argtypes = [
                _u8p, _i64p, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, _u8p, _i32p, _i32p,
            ]
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


def has_image_decode() -> bool:
    lib = get_lib()
    return bool(lib is not None and lib.swapnet_has_image_decode())


def decode_rgb_resized(
    data: bytes, size: int, jpeg_draft: bool = False, with_dims: bool = False
):
    """Native JPEG/PNG decode fused with PIL-compatible bilinear resize ->
    (size, size, 3) uint8 (or ((size,size,3) u8, (orig_w, orig_h)) when
    ``with_dims``).  None if unavailable or the format needs PIL (CMYK,
    exotic).  ``jpeg_draft`` enables DCT-scaled decode (decodes at the
    smallest power-of-2 scale >= size before resampling; faster, numerics
    differ slightly from full decode)."""
    lib = get_lib()
    if lib is None or not lib.swapnet_has_image_decode():
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty((size, size, 3), dtype=np.uint8)
    wh = np.zeros(2, dtype=np.int32)
    rc = lib.decode_rgb_resize_u8(
        _ptr(buf, _u8p), len(data), size, int(jpeg_draft),
        # null orig_wh skips the extra header parse draft mode would need
        _ptr(out, _u8p), _ptr(wh, _i32p) if with_dims else None,
    )
    if rc != 0:
        return None
    return (out, (int(wh[0]), int(wh[1]))) if with_dims else out


def decode_rgb_resized_batch(
    items, size: int, jpeg_draft: bool = False, nthreads: int = 0,
    with_dims: bool = False,
):
    """Threaded batch decode of byte buffers -> (n, size, size, 3) uint8.

    One ctypes call hands the whole IO batch to a real C++ thread pool —
    no GIL, no per-item Python dispatch (the torch DataLoader-worker
    analog).  Returns (array, failed_indices) — callers PIL-fallback the
    failed items — plus an (n, 2) int32 array of pre-resize (w, h) when
    ``with_dims``.  None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None or not lib.swapnet_has_image_decode():
        return None
    n = len(items)
    if nthreads <= 0:
        nthreads = min(max(os.cpu_count() or 1, 1), 16)
    offsets = np.zeros(n + 1, dtype=np.int64)
    for i, b in enumerate(items):
        offsets[i + 1] = offsets[i] + len(b)
    blob = np.empty(int(offsets[-1]), dtype=np.uint8)
    for i, b in enumerate(items):
        blob[int(offsets[i]):int(offsets[i + 1])] = np.frombuffer(b, np.uint8)
    out = np.empty((n, size, size, 3), dtype=np.uint8)
    statuses = np.zeros(n, dtype=np.int32)
    whs = np.zeros((n, 2), dtype=np.int32)
    lib.decode_rgb_resize_batch_u8(
        _ptr(blob, _u8p), _ptr(offsets, _i64p), n, size, int(jpeg_draft),
        nthreads, _ptr(out, _u8p), _ptr(statuses, _i32p),
        _ptr(whs, _i32p) if with_dims else None,
    )
    failed = [int(i) for i in np.nonzero(statuses)[0]]
    return (out, failed, whs) if with_dims else (out, failed)


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
