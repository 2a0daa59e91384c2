"""Native (C) host-side components, built on demand with the system compiler.

The reference's host runtime is C (SURVEY.md §2.2); the TPU-native framework
keeps the genuinely serial host work — streaming Exp-Golomb decode — in C as
well, compiled once into a shared library and bound via ctypes (pybind11 is
not available in this environment).  Everything has a pure-Python/NumPy
fallback so the framework degrades gracefully without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "expgolomb.c")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_LIB = os.path.join(_BUILD_DIR, "libexpgolomb.so")

_lib = None
_tried = False


def _build() -> str | None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    for cc in (os.environ.get("CC"), "cc", "gcc", "clang"):
        if not cc:
            continue
        # Build into a temp file then rename, so concurrent builders race
        # safely.
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_BUILD_DIR)
        os.close(fd)
        cmd = [cc, "-O3", "-fPIC", "-shared", "-o", tmp, _SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, _LIB)
            return _LIB
        except (subprocess.CalledProcessError, FileNotFoundError):
            if os.path.exists(tmp):
                os.unlink(tmp)
            continue
    return None


def load():
    """Return the ctypes library handle, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.eg_encode.restype = ctypes.c_int
        lib.eg_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.eg_decode.restype = ctypes.c_int
        lib.eg_decode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.eg_decode_planar.restype = ctypes.c_int
        lib.eg_decode_planar.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.eg_decode_planar4.restype = ctypes.c_int
        lib.eg_decode_planar4.argtypes = lib.eg_decode_planar.argtypes
        lib.eg_scan.restype = ctypes.c_uint64
        lib.eg_scan.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.c_uint64,
            ctypes.c_size_t,
        ]
        lib.png_unfilter.restype = ctypes.c_int
        lib.png_unfilter.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.c_void_p,
        ]
        lib.byte_transpose.restype = None
        lib.byte_transpose.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_void_p,
        ]
        _lib = lib
    except OSError as e:  # pragma: no cover
        print(f"dct3d_tpu: native codec unavailable ({e})", file=sys.stderr)
    return _lib


def byte_transpose(a):
    """Transpose a 2-D uint8 array via the blocked C kernel (GIL released),
    falling back to numpy's strided copy when the library is unavailable."""
    import numpy as np

    lib = load()
    a = np.ascontiguousarray(a, dtype=np.uint8)
    if lib is None:
        return np.ascontiguousarray(a.T)
    out = np.empty((a.shape[1], a.shape[0]), np.uint8)
    lib.byte_transpose(
        a.ctypes.data, a.shape[0], a.shape[1], out.ctypes.data
    )
    return out
