"""Native (C++) runtime components, loaded via ctypes.

Build on demand with :func:`build` (g++ is in the image); every
consumer falls back to the pure-Python path when the shared library
is absent, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsdpa_reader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the native components; returns True on success."""
    if os.path.exists(_SO) and not force:
        return True
    src = os.path.join(_DIR, "sdpa_reader.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        if not os.path.exists(_SO) and not build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.sdpa_parse.restype = ctypes.c_void_p
        lib.sdpa_parse.argtypes = [ctypes.c_char_p]
        lib.sdpa_error.restype = ctypes.c_char_p
        lib.sdpa_error.argtypes = [ctypes.c_void_p]
        for f in (lib.sdpa_m, lib.sdpa_n_blocks, lib.sdpa_n_entries):
            f.restype = ctypes.c_int64
            f.argtypes = [ctypes.c_void_p]
        lib.sdpa_copy_header.restype = None
        lib.sdpa_copy_header.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_void_p]
        lib.sdpa_copy_entries.restype = None
        lib.sdpa_copy_entries.argtypes = [ctypes.c_void_p] + \
            [ctypes.c_void_p] * 5
        lib.sdpa_free.restype = None
        lib.sdpa_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib
