"""Native (C++) input-pipeline kernels, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; the host runtime around it — batch
augmentation and shuffle-gather, the only per-byte CPU work feeding the
chip — is implemented in C++ (augment.cpp) with OpenMP. Compiled lazily on
first use with g++ into this directory; every entry point has a numpy
fallback so the package works without a toolchain.

Usage:
    from nbdt_tpu.native import augment_batch, normalize_batch, available
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "augment.cpp")
_LIB_PATH = os.path.join(_HERE, f"_augment_{sys.implementation.cache_tag}.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> Optional[str]:
    flags = ["-O3", "-march=native", "-fopenmp", "-shared", "-fPIC", "-std=c++17"]
    cmd = ["g++", *flags, _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        # retry without -march=native / -fopenmp (portability)
        try:
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                   "-o", _LIB_PATH]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return _LIB_PATH
        except Exception:
            return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("NBDT_NO_NATIVE"):
            return None
        # Reuse the cached .so only when it is newer than the source —
        # otherwise recompile (stale kernels would silently run old code;
        # the .so is a local build artifact, never distributed, so ISA
        # mismatch from -march=native is confined to this machine).
        fresh = (
            os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
        )
        path = _LIB_PATH if fresh else _compile()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i64, i32p, u8p, f32p = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
        )
        lib.augment_batch.argtypes = [
            u8p, i64, i64, i64, i64, i64, i32p, i32p, u8p, f32p, f32p, f32p,
        ]
        lib.normalize_batch.argtypes = [u8p, i64, i64, i64, f32p, f32p, f32p]
        lib.gather_batch_u8.argtypes = [
            u8p, ctypes.POINTER(ctypes.c_int64), i64, i64, u8p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def augment_batch(
    images_u8: np.ndarray,
    pad: int,
    mean: np.ndarray,
    std: np.ndarray,
    rng: np.random.RandomState,
    hflip: bool = True,
) -> Optional[np.ndarray]:
    """Fused pad+random-crop+hflip+normalize. Returns None when the native
    library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    images_u8 = np.ascontiguousarray(images_u8, dtype=np.uint8)
    n, h, w, c = images_u8.shape
    ys = rng.randint(0, 2 * pad + 1, size=n).astype(np.int32)
    xs = rng.randint(0, 2 * pad + 1, size=n).astype(np.int32)
    flips = (
        (rng.rand(n) < 0.5).astype(np.uint8)
        if hflip
        else np.zeros(n, dtype=np.uint8)
    )
    mean = np.ascontiguousarray(mean, dtype=np.float32)
    std = np.ascontiguousarray(std, dtype=np.float32)
    out = np.empty((n, h, w, c), dtype=np.float32)
    lib.augment_batch(
        _ptr(images_u8, ctypes.c_uint8), n, h, w, c, pad,
        _ptr(ys, ctypes.c_int32), _ptr(xs, ctypes.c_int32),
        _ptr(flips, ctypes.c_uint8), _ptr(mean, ctypes.c_float),
        _ptr(std, ctypes.c_float), _ptr(out, ctypes.c_float),
    )
    return out


def normalize_batch(
    images_u8: np.ndarray, mean: np.ndarray, std: np.ndarray
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    images_u8 = np.ascontiguousarray(images_u8, dtype=np.uint8)
    shape = images_u8.shape
    c = shape[-1]
    hw = int(np.prod(shape[1:-1]))
    n = shape[0]
    mean = np.ascontiguousarray(mean, dtype=np.float32)
    std = np.ascontiguousarray(std, dtype=np.float32)
    out = np.empty(shape, dtype=np.float32)
    lib.normalize_batch(
        _ptr(images_u8, ctypes.c_uint8), n, hw, c,
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
        _ptr(out, ctypes.c_float),
    )
    return out


def gather_batch_u8(data: np.ndarray, indices: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    m = len(indices)
    sample_bytes = int(np.prod(data.shape[1:]))
    out = np.empty((m,) + data.shape[1:], dtype=np.uint8)
    lib.gather_batch_u8(
        _ptr(data, ctypes.c_uint8),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        m, sample_bytes, _ptr(out, ctypes.c_uint8),
    )
    return out
