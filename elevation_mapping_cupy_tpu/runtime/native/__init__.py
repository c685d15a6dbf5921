"""ctypes bindings for the native sensor frontend (with NumPy fallback).

The shared library is built lazily with g++ on first use and cached next to
the source; environments without a toolchain silently use the NumPy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "pointcloud_native.cc")
_LIB = os.path.join(_DIR, "libpointcloud_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.deinterleave_f32.restype = ctypes.c_int64
        lib.deinterleave_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.pack_rgb_f32.restype = None
        lib.pack_rgb_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def deinterleave(
    data: bytes | np.ndarray,
    n_points: int,
    point_step: int,
    offsets: Sequence[int],
    drop_non_finite: bool = True,
) -> np.ndarray:
    """Interleaved sensor records → dense (kept, n_fields) float32 matrix."""
    buf = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) else np.ascontiguousarray(data, np.uint8).reshape(-1)
    n_fields = len(offsets)
    lib = _load()
    if lib is not None:
        out = np.empty((n_points, n_fields), np.float32)
        offs = np.asarray(offsets, np.int64)
        kept = lib.deinterleave_f32(
            buf.ctypes.data, n_points, point_step,
            offs.ctypes.data, n_fields, out.ctypes.data,
            1 if drop_non_finite else 0,
        )
        return out[:kept]
    # NumPy fallback: strided view per field
    cols = []
    for off in offsets:
        v = np.lib.stride_tricks.as_strided(
            buf[off:].view(np.uint8),
            shape=(n_points, 4),
            strides=(point_step, 1),
        ).copy().view(np.float32)[:, 0]
        cols.append(v)
    out = np.stack(cols, axis=1)
    if drop_non_finite:
        out = out[np.isfinite(out[:, :3]).all(axis=1)]
    return out


def pack_rgb(r: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    r = np.ascontiguousarray(r, np.uint8).reshape(-1)
    g = np.ascontiguousarray(g, np.uint8).reshape(-1)
    b = np.ascontiguousarray(b, np.uint8).reshape(-1)
    lib = _load()
    if lib is not None:
        out = np.empty(r.shape[0], np.float32)
        lib.pack_rgb_f32(r.ctypes.data, g.ctypes.data, b.ctypes.data, r.shape[0], out.ctypes.data)
        return out
    bits = (r.astype(np.uint32) << 16) | (g.astype(np.uint32) << 8) | b.astype(np.uint32)
    return bits.view(np.float32)
