"""ctypes bindings for the native host-side data path (native/hostloader.cpp).

Fused gather+normalize, in-place normalization, the exponential cloud
transform, and NaN scrubbing run multithreaded in C++ (OpenMP) — the
host-loop roles the reference fills with numba @njit kernels and DataLoader
worker processes (rnn/utils.py:1798-1865, SURVEY.md §2.6). Falls back to
numpy transparently when the shared library is absent; builds it on demand
if a toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libhostloader.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO):
        build = os.path.join(_NATIVE_DIR, "build.sh")
        if os.path.exists(build):
            try:
                subprocess.run(["sh", build], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                _LIB = False
                return _LIB
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _LIB = False
        return _LIB
    i64 = ctypes.c_int64
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int64)
    lib.gather_normalize_f32.argtypes = [fp, ip, fp, fp, fp, i64, i64]
    lib.gather_f32.argtypes = [fp, ip, fp, i64, i64]
    lib.normalize_f32.argtypes = [fp, fp, fp, i64, i64]
    lib.cloud_exp_transform_f32.argtypes = [fp, fp, i64, i64, i64, i64]
    lib.scrub_nonfinite_f32.argtypes = [fp, i64]
    lib.omp_thread_count.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return bool(_load())


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def gather_normalize(src: np.ndarray, idx: np.ndarray, mean: np.ndarray,
                     div: np.ndarray) -> np.ndarray:
    """dst[i] = (src[idx[i]] - mean) / div over flattened trailing dims."""
    src = np.ascontiguousarray(src, np.float32)
    row = int(np.prod(src.shape[1:]))
    idx = np.ascontiguousarray(idx, np.int64)
    mean = np.ascontiguousarray(np.broadcast_to(mean, src.shape[1:]).ravel(),
                                np.float32)
    div = np.ascontiguousarray(np.broadcast_to(div, src.shape[1:]).ravel(),
                               np.float32)
    lib = _load()
    if not lib:
        return ((src[idx].reshape(len(idx), row) - mean) / div).reshape(
            (len(idx),) + src.shape[1:])
    dst = np.empty((len(idx),) + src.shape[1:], np.float32)
    lib.gather_normalize_f32(_fptr(src), _iptr(idx), _fptr(mean),
                             _fptr(div), _fptr(dst), len(idx), row)
    return dst


def gather(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    lib = _load()
    if not lib:
        return src[idx].copy()
    row = int(np.prod(src.shape[1:]))
    dst = np.empty((len(idx),) + src.shape[1:], np.float32)
    lib.gather_f32(_fptr(src), _iptr(idx), _fptr(dst), len(idx), row)
    return dst


def normalize_inplace(x: np.ndarray, mean: np.ndarray, div: np.ndarray):
    assert x.dtype == np.float32 and x.flags["C_CONTIGUOUS"]
    row = int(np.prod(x.shape[1:]))
    mean = np.ascontiguousarray(np.broadcast_to(mean, x.shape[1:]).ravel(),
                                np.float32)
    div = np.ascontiguousarray(np.broadcast_to(div, x.shape[1:]).ravel(),
                               np.float32)
    lib = _load()
    if not lib:
        x.reshape(len(x), row)[:] = (x.reshape(len(x), row) - mean) / div
        return x
    lib.normalize_f32(_fptr(x), _fptr(mean), _fptr(div), len(x), row)
    return x


def cloud_exp_inplace(x: np.ndarray, lbd: np.ndarray, channel: int):
    """x[..., channel] = 1 - exp(-x[..., channel]*lbd) on [n, nlev, nch]."""
    assert x.ndim == 3 and x.dtype == np.float32 and x.flags["C_CONTIGUOUS"]
    lbd = np.ascontiguousarray(lbd, np.float32)
    lib = _load()
    if not lib:
        x[:, :, channel] = 1.0 - np.exp(-x[:, :, channel] * lbd)
        return x
    n, nlev, nch = x.shape
    lib.cloud_exp_transform_f32(_fptr(x), _fptr(lbd), n, nlev, nch, channel)
    return x


def scrub_nonfinite(x: np.ndarray):
    assert x.dtype == np.float32 and x.flags["C_CONTIGUOUS"]
    lib = _load()
    if not lib:
        x[~np.isfinite(x)] = 0.0
        return x
    lib.scrub_nonfinite_f32(_fptr(x), x.size)
    return x


def thread_count() -> int:
    lib = _load()
    return lib.omp_thread_count() if lib else 1
