"""ctypes bindings for the native data-plumbing library (native/libegtpu.so).

Builds the library on first use when a toolchain is available; every entry
point has a numpy fallback, so the framework works without it — the native
path exists because dataset decode/normalize/batch-assembly is host-side
hot-loop work (the analog of the reference's native runtime layer).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libegtpu.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    script = os.path.join(_NATIVE_DIR, "build.sh")
    if not os.path.exists(script):
        return False
    try:
        subprocess.run(
            ["sh", script], check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


_EXPECTED_VERSION = 2


def _load() -> Optional[ctypes.CDLL]:
    try:
        return ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None


def native_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = _load()
    if lib is not None:
        try:
            lib.egtpu_version.restype = ctypes.c_int32
            stale = lib.egtpu_version() != _EXPECTED_VERSION
        except AttributeError:
            stale = True
        if stale:  # out-of-date .so on disk: rebuild once and reload
            del lib
            if not _build():
                return None
            lib = _load()
    if lib is None:
        return None
    u8 = ctypes.POINTER(ctypes.c_uint8)
    i64 = ctypes.POINTER(ctypes.c_int64)
    f32 = ctypes.POINTER(ctypes.c_float)
    lib.egtpu_version.restype = ctypes.c_int32
    lib.egtpu_u8_to_f32.argtypes = [
        u8, f32, ctypes.c_int64, ctypes.c_float, ctypes.c_float
    ]
    lib.egtpu_one_hot.argtypes = [i64, f32, ctypes.c_int64, ctypes.c_int64]
    lib.egtpu_gather_rows.argtypes = [u8, i64, u8, ctypes.c_int64, ctypes.c_int64]
    lib.egtpu_shuffle_indices.argtypes = [i64, ctypes.c_int64, ctypes.c_uint64]
    lib.egtpu_crc32.argtypes = [u8, ctypes.c_int64, ctypes.c_uint32]
    lib.egtpu_crc32.restype = ctypes.c_uint32
    i32 = ctypes.POINTER(ctypes.c_int32)
    lib.egtpu_bpe_encode.argtypes = [
        u8, i64, ctypes.c_int64, i32, i32, ctypes.c_int64, i32
    ]
    lib.egtpu_bpe_encode.restype = ctypes.c_int64
    lib.egtpu_version.restype = ctypes.c_int32
    if lib.egtpu_version() != _EXPECTED_VERSION:
        return None
    _lib = lib
    return _lib


def have_native() -> bool:
    return native_lib() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def u8_to_f32(src: np.ndarray, scale: float, bias: float = 0.0) -> np.ndarray:
    """dst = src * scale + bias for u8 images (dataset normalization)."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    lib = native_lib()
    if lib is None:
        return src.astype(np.float32) * np.float32(scale) + np.float32(bias)
    dst = np.empty(src.shape, dtype=np.float32)
    lib.egtpu_u8_to_f32(
        _ptr(src, ctypes.c_uint8), _ptr(dst, ctypes.c_float),
        src.size, scale, bias,
    )
    return dst


def one_hot_native(labels: np.ndarray, classes: int) -> np.ndarray:
    labels = np.ascontiguousarray(labels, dtype=np.int64).reshape(-1)
    lib = native_lib()
    if lib is None:
        out = np.zeros((labels.size, classes), dtype=np.float32)
        out[np.arange(labels.size), labels] = 1
        return out
    out = np.empty((labels.size, classes), dtype=np.float32)
    lib.egtpu_one_hot(
        _ptr(labels, ctypes.c_int64), _ptr(out, ctypes.c_float),
        labels.size, classes,
    )
    return out


def gather_rows(src: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Batch assembly: out[i] = src[indices[i]] with one flat memcpy per row."""
    src = np.ascontiguousarray(src)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    lib = native_lib()
    if lib is None:
        return src[indices]
    out = np.empty((indices.size,) + src.shape[1:], dtype=src.dtype)
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    lib.egtpu_gather_rows(
        _ptr(src.view(np.uint8), ctypes.c_uint8),
        _ptr(indices, ctypes.c_int64),
        _ptr(out.view(np.uint8), ctypes.c_uint8),
        indices.size,
        row_bytes,
    )
    return out


def shuffle_indices(count: int, seed: int) -> np.ndarray:
    lib = native_lib()
    if lib is None:
        return np.random.default_rng(seed).permutation(count)
    out = np.empty(count, dtype=np.int64)
    lib.egtpu_shuffle_indices(_ptr(out, ctypes.c_int64), count, seed)
    return out


def crc32(data: bytes, seed: int = 0) -> int:
    lib = native_lib()
    if lib is None:
        import zlib

        return zlib.crc32(data, seed)
    arr = np.frombuffer(data, dtype=np.uint8)
    return int(lib.egtpu_crc32(_ptr(arr, ctypes.c_uint8), arr.size, seed))


def bpe_encode(data: bytes, chunk_offs: np.ndarray, merge_a: np.ndarray,
               merge_b: np.ndarray) -> Optional[np.ndarray]:
    """Byte-level BPE encode of pre-split chunks (io/tokenizer.py
    semantics, bit-exact).  Returns int32 token ids, or ``None`` when
    the native library is unavailable (caller falls back to Python)."""
    lib = native_lib()
    if lib is None or not data:
        return np.zeros(0, np.int32) if lib is not None else None
    buf = np.frombuffer(data, dtype=np.uint8)
    offs = np.ascontiguousarray(chunk_offs, dtype=np.int64)
    ma = np.ascontiguousarray(merge_a, dtype=np.int32)
    mb = np.ascontiguousarray(merge_b, dtype=np.int32)
    out = np.empty(buf.size, dtype=np.int32)
    n = lib.egtpu_bpe_encode(
        _ptr(buf, ctypes.c_uint8), _ptr(offs, ctypes.c_int64),
        offs.size - 1, _ptr(ma, ctypes.c_int32), _ptr(mb, ctypes.c_int32),
        ma.size, _ptr(out, ctypes.c_int32),
    )
    return out[:n].copy()
