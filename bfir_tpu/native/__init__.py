"""ctypes bindings for the native host-side codec + reblocker.

The reference's runtime is native C++ throughout; here the device math is
JAX/XLA and the host-side boundary work (PCM byte codecs, stream reblocking)
is native C++ (``codec.cpp``), loaded via ctypes (no pybind11 in this
image). Falls back to the pure-numpy implementations in ``ops.formats`` when
the shared library has not been built (``make -C bfir_tpu/native``); build
is also attempted automatically once per process.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libbfir_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _FormatDesc(ctypes.Structure):
    _fields_ = [
        ("bytes", ctypes.c_int32),
        ("sbytes", ctypes.c_int32),
        ("is_float", ctypes.c_int32),
        ("big_endian", ctypes.c_int32),
    ]


def _desc(fmt) -> _FormatDesc:
    return _FormatDesc(fmt.bytes, fmt.sbytes, int(fmt.isfloat), int(fmt.big_endian))


def load() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _HERE], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.bfir_decode_f64.restype = ctypes.c_int
    lib.bfir_encode_int.restype = ctypes.c_int
    lib.bfir_encode_float.restype = ctypes.c_int
    lib.bfir_reblocker_new.restype = ctypes.c_void_p
    lib.bfir_reblocker_push.restype = ctypes.c_int64
    lib.bfir_reblocker_fill.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def decode_f64(raw: bytes, fmt, n_channels: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    buf = np.frombuffer(raw, dtype=np.uint8)
    n_frames = buf.size // (fmt.bytes * n_channels)
    out = np.empty((n_channels, n_frames), dtype=np.float64)
    rc = lib.bfir_decode_f64(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n_frames), ctypes.c_int32(n_channels),
        ctypes.byref(_desc(fmt)),
    )
    return out if rc == 0 else None


def encode_int(q: np.ndarray, fmt) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, dtype=np.int32)
    c, n = q.shape
    out = np.empty(n * c * fmt.bytes, dtype=np.uint8)
    rc = lib.bfir_encode_int(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n), ctypes.c_int32(c), ctypes.byref(_desc(fmt)),
    )
    return out.tobytes() if rc == 0 else None


def encode_float(x: np.ndarray, fmt) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    c, n = x.shape
    out = np.empty(n * c * fmt.bytes, dtype=np.uint8)
    rc = lib.bfir_encode_float(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n), ctypes.c_int32(c), ctypes.byref(_desc(fmt)),
    )
    return out.tobytes() if rc == 0 else None


class Reblocker:
    """Native fixed-block accumulator (foo_dsp_bfir.cpp:303-351)."""

    def __init__(self, block: int, n_channels: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.block = block
        self.n_channels = n_channels
        self._h = ctypes.c_void_p(lib.bfir_reblocker_new(
            ctypes.c_int64(block), ctypes.c_int32(n_channels)))

    def push(self, frames: np.ndarray) -> np.ndarray:
        """frames [C, T] float64 -> complete blocks [n_blocks, C, block]."""
        frames = np.ascontiguousarray(frames, dtype=np.float64)
        c, t = frames.shape
        max_blocks = (t + self.fill) // self.block + 1
        out = np.empty((max_blocks, self.n_channels, self.block), dtype=np.float64)
        n = self._lib.bfir_reblocker_push(
            self._h,
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(t),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(max_blocks),
        )
        return out[:n]

    @property
    def fill(self) -> int:
        return self._lib.bfir_reblocker_fill(self._h)

    def reset(self) -> None:
        self._lib.bfir_reblocker_reset(self._h)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.bfir_reblocker_free(self._h)
            self._h = None
