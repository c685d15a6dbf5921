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
_SRCS = [
    os.path.join(_DIR, "pointcloud_native.cc"),
    os.path.join(_DIR, "frame_ring.cc"),
]
_LIB = os.path.join(_DIR, "libpointcloud_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        stale = not os.path.exists(_LIB) or any(
            os.path.getmtime(_LIB) < os.path.getmtime(s) for s in _SRCS
        )
        if stale:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, *_SRCS],
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
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_push.restype = ctypes.c_int32
        lib.ring_push.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32,
        ]
        lib.ring_pop.restype = ctypes.c_int64
        lib.ring_pop.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.ring_size.restype = ctypes.c_int64
        lib.ring_size.argtypes = [ctypes.c_void_p]
        lib.ring_stats.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 3
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


class FrameRing:
    """Preallocated native frame ring (frame_ring.cc); deque fallback.

    Frames are (header: bytes of fixed size, payload: ndarray). Memory is one
    slab allocation: capacity x slab_bytes — no per-frame heap churn, bounded
    backpressure with drop-oldest (ROS queue_size semantics) or drop-newest.
    """

    def __init__(self, capacity: int = 16, slab_bytes: int = 8 << 20,
                 header_bytes: int = 256, drop_oldest: bool = False):
        self.capacity = capacity
        self.slab_bytes = slab_bytes
        self.header_bytes = header_bytes
        self.drop_oldest = drop_oldest
        self.dropped = 0
        self._lib = _load()
        self._ring = None
        if self._lib is not None:
            self._ring = self._lib.ring_create(capacity, slab_bytes, header_bytes)
        if self._ring is None:
            from collections import deque

            self._dq = deque()

    def push(self, header: bytes, payload: np.ndarray) -> bool:
        """Returns False when the frame was rejected (full, drop_oldest off)."""
        h = header[: self.header_bytes].ljust(self.header_bytes, b"\0")
        p = np.ascontiguousarray(payload).view(np.uint8).reshape(-1)
        if self._ring is not None:
            rc = self._lib.ring_push(
                self._ring, h, p.ctypes.data, p.shape[0],
                1 if self.drop_oldest else 0,
            )
            if rc == -2:
                raise ValueError(f"payload {p.shape[0]}B > slab {self.slab_bytes}B")
            if rc != 0:
                self.dropped += 1
            return rc >= 0
        if len(self._dq) >= self.capacity:
            self.dropped += 1
            if not self.drop_oldest:
                return False
            self._dq.popleft()
        self._dq.append((h, p.copy()))
        return True

    def pop(self):
        """Returns (header bytes, payload uint8 ndarray) or None when empty.

        The returned payload is a copy sized to the frame; the slab-sized
        staging buffer is reused across pops (no per-frame slab allocation)."""
        if self._ring is not None:
            hdr = ctypes.create_string_buffer(self.header_bytes)
            if not hasattr(self, "_scratch"):
                self._scratch = np.empty(self.slab_bytes, np.uint8)
            n = self._lib.ring_pop(
                self._ring, hdr, self._scratch.ctypes.data, self.slab_bytes
            )
            if n < 0:
                return None
            return bytes(hdr.raw), self._scratch[:n].copy()
        if not self._dq:
            return None
        h, p = self._dq.popleft()
        return h, p

    def __len__(self) -> int:
        if self._ring is not None:
            return int(self._lib.ring_size(self._ring))
        return len(self._dq)

    def stats(self):
        if self._ring is not None:
            pushed = ctypes.c_int64()
            popped = ctypes.c_int64()
            dropped = ctypes.c_int64()
            self._lib.ring_stats(
                self._ring, ctypes.byref(pushed), ctypes.byref(popped),
                ctypes.byref(dropped),
            )
            return {"pushed": pushed.value, "popped": popped.value,
                    "dropped": dropped.value}
        return {"pushed": -1, "popped": -1, "dropped": self.dropped}

    def __del__(self):
        try:
            if self._ring is not None and self._lib is not None:
                self._lib.ring_destroy(self._ring)
                self._ring = None
        except Exception:
            pass
