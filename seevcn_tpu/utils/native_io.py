"""ctypes bindings for the native IO library (native/seevcn_io.cpp).

Builds the shared library on first use (make -C native); every entry point
has a numpy fallback so the package works without a toolchain. The
prefetcher overlaps file IO with device compute — the role the reference
fills with DataLoader worker processes + SharedArray caches.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libseevcn_io.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib = False
        return _lib
    lib.seevcn_read_bin.restype = ctypes.c_int64
    lib.seevcn_read_bin.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                    ctypes.c_int64, ctypes.c_int64]
    lib.seevcn_read_pcd.restype = ctypes.c_int64
    lib.seevcn_read_pcd.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                    ctypes.c_int64]
    lib.seevcn_prefetcher_create.restype = ctypes.c_void_p
    lib.seevcn_prefetcher_create.argtypes = [ctypes.c_int]
    lib.seevcn_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    lib.seevcn_prefetcher_submit.restype = ctypes.c_uint64
    lib.seevcn_prefetcher_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
    lib.seevcn_prefetcher_wait.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    _lib = lib
    return _lib


def native_available() -> bool:
    return bool(_load())


def read_bin(path: str, max_rows: int = 200000, row_floats: int = 4) -> np.ndarray:
    lib = _load()
    if not lib:
        pts = np.fromfile(path, dtype=np.float32).reshape(-1, row_floats)
        return pts[:max_rows]
    buf = np.empty((max_rows, row_floats), np.float32)
    n = lib.seevcn_read_bin(path.encode(), buf.ctypes.data, max_rows, row_floats)
    if n < 0:
        raise FileNotFoundError(path)
    return buf[:n]


def read_pcd(path: str, max_rows: int = 200000) -> np.ndarray:
    lib = _load()
    if not lib:
        from ..geom.pcd_io import read_pcd as np_read

        return np_read(path)[:max_rows]
    buf = np.empty((max_rows, 3), np.float32)
    n = lib.seevcn_read_pcd(path.encode(), buf.ctypes.data, max_rows)
    if n == -2:  # ascii or non-xyz layout: fall back
        from ..geom.pcd_io import read_pcd as np_read

        return np_read(path)[:max_rows]
    if n < 0:
        raise FileNotFoundError(path)
    return buf[:n]


class Prefetcher:
    """Threaded file prefetcher into caller-owned fixed-shape buffers.

    Usage:
        pf = Prefetcher(n_threads=4)
        batch = pf.load([(path, 'bin'), ...], max_rows=150000)
    """

    def __init__(self, n_threads: int = 4):
        self._lib = _load()
        self._handle = self._lib.seevcn_prefetcher_create(n_threads) \
            if self._lib else None

    def load(self, entries, max_rows: int = 150000):
        """entries: list of (path, kind) with kind in {'bin', 'pcd'}.
        Returns (buffers (N, max_rows, rf), counts (N,))."""
        n = len(entries)
        rf = 4 if entries and entries[0][1] == "bin" else 3
        bufs = np.zeros((n, max_rows, rf), np.float32)
        counts = np.zeros((n,), np.int64)
        if not self._lib:
            for i, (p, kind) in enumerate(entries):
                pts = read_bin(p, max_rows, rf) if kind == "bin" else \
                    read_pcd(p, max_rows)
                counts[i] = len(pts)
                bufs[i, :len(pts), :pts.shape[1]] = pts
            return bufs, counts
        last = 0
        for i, (p, kind) in enumerate(entries):
            row_floats = 4 if kind == "bin" else 3
            last = self._lib.seevcn_prefetcher_submit(
                self._handle, p.encode(), bufs[i].ctypes.data, max_rows,
                row_floats, counts[i:i + 1].ctypes.data)
        self._lib.seevcn_prefetcher_wait(self._handle, last)
        return bufs, counts

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.seevcn_prefetcher_destroy(self._handle)
