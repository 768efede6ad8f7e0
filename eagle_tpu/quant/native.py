"""ctypes bindings for the native repacker (native/repack.cpp).

Auto-builds the shared library with g++ -O3 -fopenmp on first use; every entry
point has a numpy fallback (quant/qtensor.py), so the native path is a pure
accelerator — results are bit-identical (tested in tests/test_native.py)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

from ..gguf.constants import GGMLType

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "repack.cpp"
_LIB = _REPO_ROOT / "native" / "librepack.so"

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _SRC.exists() or not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    i8p = ctypes.POINTER(ctypes.c_int8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    lib.repack_q8_0.argtypes = [u8p, i64, i8p, f32p]
    lib.repack_q4_0.argtypes = [u8p, i64, i8p, f32p, f32p]
    lib.repack_q4_k.argtypes = [u8p, i64, i8p, f32p, f32p]
    lib.repack_q5_k.argtypes = [u8p, i64, i8p, f32p, f32p]
    lib.repack_q6_k.argtypes = [u8p, i64, i8p, f32p]
    lib.transpose_i8.argtypes = [i8p, i64, i64, i8p]
    lib.transpose_f32.argtypes = [f32p, i64, i64, f32p]
    _lib = lib
    return _lib


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def repack_native(data: np.ndarray, ggml_type: GGMLType, n: int, k: int):
    """Returns (q, scale, bias, group) like quant/qtensor.repack_numpy, or None
    if the native lib is unavailable / type unsupported."""
    lib = get_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    if ggml_type == GGMLType.Q8_0:
        nb = n * k // 32
        q = np.empty((n, k), np.int8)
        s = np.empty((n, k // 32), np.float32)
        lib.repack_q8_0(_ptr(data, ctypes.c_uint8), nb, _ptr(q, ctypes.c_int8), _ptr(s, ctypes.c_float))
        return q, s, None, 32
    if ggml_type == GGMLType.Q4_0:
        nb = n * k // 32
        q = np.empty((n, k), np.int8)
        s = np.empty((n, k // 32), np.float32)
        b = np.empty((n, k // 32), np.float32)
        lib.repack_q4_0(_ptr(data, ctypes.c_uint8), nb, _ptr(q, ctypes.c_int8), _ptr(s, ctypes.c_float), _ptr(b, ctypes.c_float))
        return q, s, b, 32
    if ggml_type in (GGMLType.Q4_K, GGMLType.Q5_K):
        nb = n * k // 256
        q = np.empty((n, k), np.int8)
        s = np.empty((n, k // 32), np.float32)
        b = np.empty((n, k // 32), np.float32)
        fn = lib.repack_q4_k if ggml_type == GGMLType.Q4_K else lib.repack_q5_k
        fn(_ptr(data, ctypes.c_uint8), nb, _ptr(q, ctypes.c_int8), _ptr(s, ctypes.c_float), _ptr(b, ctypes.c_float))
        return q, s, b, 32
    if ggml_type == GGMLType.Q6_K:
        nb = n * k // 256
        q = np.empty((n, k), np.int8)
        s = np.empty((n, k // 16), np.float32)
        lib.repack_q6_k(_ptr(data, ctypes.c_uint8), nb, _ptr(q, ctypes.c_int8), _ptr(s, ctypes.c_float))
        return q, s, None, 16
    return None


def transpose_native(a: np.ndarray) -> np.ndarray | None:
    """Fast [N, K] -> [K, N] contiguous transpose."""
    lib = get_lib()
    if lib is None:
        return None
    n, k = a.shape
    if a.dtype == np.int8:
        out = np.empty((k, n), np.int8)
        lib.transpose_i8(_ptr(a, ctypes.c_int8), n, k, _ptr(out, ctypes.c_int8))
        return out
    if a.dtype == np.float32:
        out = np.empty((k, n), np.float32)
        lib.transpose_f32(_ptr(a, ctypes.c_float), n, k, _ptr(out, ctypes.c_float))
        return out
    return None
