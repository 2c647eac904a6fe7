"""ctypes bindings for the native C++ PNG decoder (fldrx/data/_native/).

Builds the shared library on first use (cached beside the source; rebuild is
keyed on source mtime) and falls back to PIL transparently if the toolchain
or libpng is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_native", "decoder.cpp")
_LIB = os.path.join(_HERE, "_native", "libfldrx_decoder.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-lpng", "-lpthread", "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native decoder; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            stale = (not os.path.exists(_LIB)
                     or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
            if stale and not _build():
                _load_failed = True
                return None
            lib = ctypes.CDLL(_LIB)
            lib.fldrx_png_probe.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32)]
            lib.fldrx_png_decode.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_uint32, ctypes.c_uint32]
            lib.fldrx_png_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int]
            for f in (lib.fldrx_png_probe, lib.fldrx_png_decode,
                      lib.fldrx_png_decode_batch):
                f.restype = ctypes.c_int
            _lib = lib
        except OSError:
            _load_failed = True
    return _lib


def probe_png(path: str):
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    if lib.fldrx_png_probe(path.encode(), ctypes.byref(w), ctypes.byref(h)):
        return None
    return int(w.value), int(h.value)


def decode_png_batch_bgr(paths: List[str], threads: int = 8) -> Optional[np.ndarray]:
    """Decode same-sized PNGs → [N,H,W,3] uint8 BGR entirely in C++ threads.
    Returns None if the native path is unavailable (caller falls back to PIL).
    """
    lib = get_lib()
    if lib is None or not paths:
        return None
    wh = probe_png(paths[0])
    if wh is None:
        return None
    w, h = wh
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for arr in out])
    fails = lib.fldrx_png_decode_batch(c_paths, n, c_outs, w, h, threads)
    if fails:
        return None
    return out
