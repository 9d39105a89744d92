"""Build-on-demand for the native runtime library (g++ -> .so, ctypes).

The reference ships its native runtime as VS2010-built DLLs/exes
(SURVEY §2.2 build system); ours compiles lazily on first use and caches the
shared object next to the sources, rebuilding when any source is newer.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_SOURCES = ["maxflow.cpp", "sharemem.cpp"]
_SO = _DIR / "_libstitchnative.so"
_LOCK = threading.Lock()
_lib = None


def _needs_build() -> bool:
    if not _SO.exists():
        return True
    so_mtime = _SO.stat().st_mtime
    return any((_DIR / s).exists() and (_DIR / s).stat().st_mtime > so_mtime
               for s in _SOURCES)


def build() -> Path:
    srcs = [str(_DIR / s) for s in _SOURCES if (_DIR / s).exists()]
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-march=native",
           "-o", str(_SO)] + srcs + ["-lpthread", "-lrt"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _SO


def load() -> ctypes.CDLL:
    """Load (building if stale) the native library."""
    global _lib
    with _LOCK:
        if _lib is not None and not _needs_build():
            return _lib
        if _needs_build():
            build()
        _lib = ctypes.CDLL(str(_SO))
        _declare(_lib)
        return _lib


def _declare(lib: ctypes.CDLL) -> None:
    import ctypes as ct
    lib.grid_maxflow.restype = ct.c_double
    lib.grid_maxflow.argtypes = [
        ct.c_int, ct.c_int,
        ct.POINTER(ct.c_float), ct.POINTER(ct.c_float),
        ct.POINTER(ct.c_float), ct.POINTER(ct.c_float),
        ct.POINTER(ct.c_uint8),
    ]
    if hasattr(lib, "shm_ring_create"):
        lib.shm_ring_create.restype = ct.c_void_p
        lib.shm_ring_create.argtypes = [ct.c_char_p, ct.c_int, ct.c_int, ct.c_int, ct.c_int]
        lib.shm_ring_open.restype = ct.c_void_p
        lib.shm_ring_open.argtypes = [ct.c_char_p]
        lib.shm_ring_publish.restype = ct.c_int
        lib.shm_ring_publish.argtypes = [ct.c_void_p, ct.POINTER(ct.c_uint8), ct.c_int64, ct.c_int64]
        lib.shm_ring_consume.restype = ct.c_int64
        lib.shm_ring_consume.argtypes = [ct.c_void_p, ct.POINTER(ct.c_uint8), ct.c_int64,
                                         ct.POINTER(ct.c_int64), ct.c_double]
        lib.shm_ring_close.restype = None
        lib.shm_ring_close.argtypes = [ct.c_void_p, ct.c_int]
        lib.shm_ring_info.restype = ct.c_int
        lib.shm_ring_info.argtypes = [ct.c_void_p, ct.POINTER(ct.c_int)]
