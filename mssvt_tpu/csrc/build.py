"""Build + load the native host-runtime library (ctypes, no pybind11)."""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

_SRC_DIR = Path(__file__).resolve().parent
_LIB_PATH = _SRC_DIR / "libmssvt_host.so"
_SOURCES = ["voxelizer.cpp"]
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", str(_LIB_PATH),
    ] + [str(_SRC_DIR / s) for s in _SOURCES]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_library():
    """Return the ctypes library handle, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src_newer = (
            not _LIB_PATH.exists()
            or any((_SRC_DIR / s).stat().st_mtime > _LIB_PATH.stat().st_mtime
                   for s in _SOURCES)
        )
        if src_newer and not _compile():
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.voxelize.restype = ctypes.c_int32
        lib.voxelize.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _LIB = lib
        return _LIB
