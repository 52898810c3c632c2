"""Native data-plane: C++ JPEG clip decoder (libjpeg, GIL-free).

Builds ``libclipdec.so`` from ``clipdec.cpp`` on first use (g++ + system
libjpeg) and exposes ``decode_clip``. Falls back to None when the toolchain
or libjpeg is unavailable — callers (data/video.py) use the PIL path then.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "clipdec.cpp")
_SO = os.path.join(_HERE, "libclipdec.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-ljpeg"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            if not _build():
                return None
        elif os.path.exists(_SRC) and \
                os.path.getmtime(_SRC) > os.path.getmtime(_SO):
            # stale .so: try a rebuild, but a failed rebuild (no toolchain)
            # must not disable the existing working library
            if not _build():
                import warnings
                warnings.warn("litemkd_tpu.native: clipdec.cpp is newer than "
                              "libclipdec.so and the rebuild failed; using "
                              "the existing (possibly stale) library")
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.clipdec_decode_clip.restype = ctypes.c_int
        lib.clipdec_decode_clip.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        try:
            lib.clipdec_decode_clip_mem.restype = ctypes.c_int
            lib.clipdec_decode_clip_mem.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_ulong),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
            ]
        except AttributeError:   # stale pre-mem .so kept by the fallback path
            lib.clipdec_decode_clip_mem = None
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def decode_clip(paths: List[str], resize_to: int, crop_y: int, crop_x: int,
                crop_size: int, flip: bool) -> Optional[np.ndarray]:
    """Decode+resize+crop(+flip) a clip natively → (T, S, S, 3) uint8.

    Returns None if the native library is unavailable or decoding fails
    (caller falls back to PIL). ctypes releases the GIL during the call, so
    concurrent clips decode in parallel across threads.
    """
    lib = load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, crop_size, crop_size, 3), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.clipdec_decode_clip(
        arr, n, resize_to, crop_y, crop_x, crop_size, int(flip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        return None
    return out


def decode_clip_mem(blobs: List[bytes], resize_to: int, crop_y: int,
                    crop_x: int, crop_size: int,
                    flip: bool) -> Optional[np.ndarray]:
    """In-memory variant of :func:`decode_clip` for zip-backed frame stores:
    each blob holds one frame's raw JPEG bytes. Returns None when the native
    library (or the mem entry, for a stale pre-mem .so) is unavailable."""
    lib = load()
    if lib is None or getattr(lib, "clipdec_decode_clip_mem", None) is None:
        return None
    n = len(blobs)
    out = np.empty((n, crop_size, crop_size, 3), dtype=np.uint8)
    bufs = (ctypes.c_char_p * n)(*blobs)
    lens = (ctypes.c_ulong * n)(*[len(b) for b in blobs])
    rc = lib.clipdec_decode_clip_mem(
        bufs, lens, n, resize_to, crop_y, crop_x, crop_size, int(flip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        return None
    return out
