"""Native (C++) runtime components, loaded through ctypes.

Currently: ``maskops`` — COCO RLE mask decoding for the data pipeline (the
native equivalent of the pycocotools C extension the reference depends on;
see ``maskops.cpp``).  The library is built on demand with ``g++`` the
first time it is needed; everything has a pure-Python fallback, so a
missing compiler only costs speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "maskops.cpp")
_LIB = os.path.join(_DIR, "libmaskops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    """Compile to a per-process temp path and rename atomically: spawned
    dataloader workers all hit the first-use build concurrently, and a
    half-written .so would poison every CDLL() that races it."""
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def load_maskops() -> Optional[ctypes.CDLL]:
    """The maskops library, building it if necessary; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.rle_counts_to_mask.restype = ctypes.c_int
        lib.rle_counts_to_mask.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib.rle_decode.restype = ctypes.c_int
        lib.rle_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
        _lib = lib
        return _lib


def rle_counts_to_mask_native(counts, h: int, w: int
                              ) -> Optional[np.ndarray]:
    """Run-length counts -> (h, w) uint8 mask via C++; None on fallback."""
    lib = load_maskops()
    if lib is None:
        return None
    c = np.ascontiguousarray(counts, np.int64)
    out = np.empty((h, w), np.uint8)
    rc = lib.rle_counts_to_mask(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(c), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def rle_decode_native(rle_str: str, h: int, w: int) -> Optional[np.ndarray]:
    """Compressed RLE string -> (h, w) uint8 mask via C++; None on
    fallback."""
    lib = load_maskops()
    if lib is None:
        return None
    try:
        raw = rle_str.encode("ascii")
    except UnicodeEncodeError:
        return None  # let the pure-Python fallback handle exotic strings
    out = np.empty((h, w), np.uint8)
    max_counts = len(raw) + 8
    scratch = np.empty(max_counts, np.int64)
    rc = lib.rle_decode(
        raw, len(raw), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_counts)
    return out if rc == 0 else None
