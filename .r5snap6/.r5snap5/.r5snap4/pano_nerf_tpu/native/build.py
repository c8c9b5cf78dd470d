"""Build + ctypes bindings for the native EXR decoder.

Compiles pano_nerf_tpu/native/exr_decode.cc into a shared library on first
use (cached next to the source; rebuilt when the source is newer). Any
failure — missing compiler, missing zlib — degrades silently to the pure
Python codec in pano_nerf_tpu/data/io_exr.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "exr_decode.cc")
_LIB = os.path.join(_DIR, "libexr_decode.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB, "-lz"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_exr_decoder() -> Optional[ctypes.CDLL]:
    """Return the bound native library, building it if needed; None if
    unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        needs_build = (not os.path.exists(_LIB)
                       or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
        if needs_build and not _compile():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.exr_probe.restype = ctypes.c_int
        lib.exr_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.exr_decode.restype = ctypes.c_int
        lib.exr_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def native_read_exr(buf: bytes):
    """Decode an in-memory EXR with the native library.

    Returns (planes dict name -> [H, W] float32) or None if the native path
    is unavailable or declines the file (unsupported compression etc.).
    """
    lib = load_exr_decoder()
    if lib is None:
        return None
    width = ctypes.c_int32()
    height = ctypes.c_int32()
    nchan = ctypes.c_int32()
    comp = ctypes.c_int32()
    names = ctypes.create_string_buffer(64 * 32)
    types = (ctypes.c_int32 * 64)()
    rc = lib.exr_probe(buf, len(buf), ctypes.byref(width),
                       ctypes.byref(height), ctypes.byref(nchan), names, 64,
                       types, ctypes.byref(comp))
    if rc != 0 or nchan.value > 64:
        return None
    out = np.empty((nchan.value, height.value, width.value), np.float32)
    rc = lib.exr_decode(buf, len(buf),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    planes = {}
    for c in range(nchan.value):
        name = names.raw[32 * c:32 * (c + 1)].split(b"\x00")[0].decode("ascii")
        planes[name] = out[c]
    return planes
