"""ctypes bindings for the native RLE library (native/rle.c).

Loads `native/librle.so`, building it on first use when a C compiler is
available. Everything degrades gracefully to the numpy implementation in
`rle.py` when the library can't be built (`lib()` returns None).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "librle.so"))

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                       check=True, capture_output=True, timeout=60)
        return True
    except Exception:
        return False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        L = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    c_long_p = ctypes.POINTER(ctypes.c_long)
    u8_p = ctypes.POINTER(ctypes.c_uint8)
    L.rle_encode.restype = ctypes.c_long
    L.rle_encode.argtypes = [u8_p, ctypes.c_long, c_long_p, ctypes.c_long]
    L.rle_decode.restype = ctypes.c_long
    L.rle_decode.argtypes = [c_long_p, ctypes.c_long, u8_p, ctypes.c_long]
    L.rle_area.restype = ctypes.c_long
    L.rle_area.argtypes = [c_long_p, ctypes.c_long]
    L.rle_intersection.restype = ctypes.c_long
    L.rle_intersection.argtypes = [c_long_p, ctypes.c_long, c_long_p,
                                   ctypes.c_long]
    L.rle_iou_matrix.restype = None
    L.rle_iou_matrix.argtypes = [c_long_p, c_long_p, c_long_p, ctypes.c_long,
                                 c_long_p, c_long_p, c_long_p, ctypes.c_long,
                                 u8_p, ctypes.POINTER(ctypes.c_double)]
    if hasattr(L, "rle_counts_to_string"):      # stale prebuilt .so guard
        c_char_p = ctypes.POINTER(ctypes.c_char)
        L.rle_counts_to_string.restype = ctypes.c_long
        L.rle_counts_to_string.argtypes = [c_long_p, ctypes.c_long, c_char_p,
                                           ctypes.c_long]
        L.rle_string_to_counts.restype = ctypes.c_long
        L.rle_string_to_counts.argtypes = [c_char_p, ctypes.c_long, c_long_p,
                                           ctypes.c_long]
    _lib = L
    return _lib


def _ptr_long(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_long))


def _ptr_u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def encode_counts(mask_f: np.ndarray) -> Optional[np.ndarray]:
    """mask_f: flat uint8 F-order mask → int64 counts, or None if no lib."""
    L = lib()
    if L is None:
        return None
    mask_f = np.ascontiguousarray(mask_f, dtype=np.uint8)
    out = np.empty(mask_f.size + 2, dtype=np.int64)
    n = L.rle_encode(_ptr_u8(mask_f), mask_f.size, _ptr_long(out), out.size)
    if n < 0:
        return None
    return out[:n]


def decode_counts(counts: np.ndarray, n: int) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    out = np.empty(n, dtype=np.uint8)
    if L.rle_decode(_ptr_long(counts), len(counts), _ptr_u8(out), n) != 0:
        return None
    return out


def iou_matrix(dt_counts_list, gt_counts_list, iscrowd) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    def pack(lst):
        lens = np.asarray([len(c) for c in lst], np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        cat = (np.concatenate(lst).astype(np.int64) if lst
               else np.zeros(0, np.int64))
        return np.ascontiguousarray(cat), offs, lens
    dc, do, dl = pack(dt_counts_list)
    gc_, go, gl = pack(gt_counts_list)
    crowd = np.asarray(iscrowd, np.uint8)
    out = np.zeros((len(dt_counts_list), len(gt_counts_list)), np.float64)
    L.rle_iou_matrix(_ptr_long(dc), _ptr_long(do), _ptr_long(dl),
                     len(dt_counts_list),
                     _ptr_long(gc_), _ptr_long(go), _ptr_long(gl),
                     len(gt_counts_list),
                     _ptr_u8(crowd),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def counts_to_string(counts: np.ndarray) -> Optional[str]:
    """int64 counts → pycocotools char string, or None if no lib."""
    L = lib()
    if L is None or not hasattr(L, "rle_counts_to_string"):
        return None
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    buf = ctypes.create_string_buffer(13 * max(1, len(counts)))
    n = L.rle_counts_to_string(_ptr_long(counts), len(counts), buf, len(buf))
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")


def string_to_counts(s: str) -> Optional[np.ndarray]:
    """pycocotools char string → int64 counts, or None if no lib."""
    L = lib()
    if L is None or not hasattr(L, "rle_string_to_counts"):
        return None
    raw = s.encode("ascii")
    out = np.empty(max(1, len(raw)), dtype=np.int64)
    n = L.rle_string_to_counts(
        ctypes.cast(ctypes.c_char_p(raw), ctypes.POINTER(ctypes.c_char)),
        len(raw), _ptr_long(out), out.size)
    if n < 0:
        return None
    return out[:n]
