"""ctypes bindings for the native (C++) host search runtime.

Builds `ddo_host.cpp` with g++ on first use (cached as a .so beside the
source).  Exposes `NativeSearch` — the combined state-deduplicated
best-first fringe + per-depth threshold cache, mirroring the interfaces
of ddo_tpu.search.{fringe,cache} with batch entry points so the Python
driver crosses the FFI once per superstep.  Falls back gracefully: if no
compiler is available, `load()` returns None and the solver uses the
pure-Python structures.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ddo_host.cpp")
_SO = os.path.join(_HERE, "ddo_host.so")
_lock = threading.Lock()
_lib = None
_build_failed = False

I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def load():
    """Returns the loaded library, building it if needed; None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.ddo_new.restype = ctypes.c_void_p
        lib.ddo_new.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.ddo_free.argtypes = [ctypes.c_void_p]
        lib.fringe_push_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, I32P, I32P, I32P, I32P, I64P, I32P, U8P,
        ]
        lib.fringe_pop_batch.restype = ctypes.c_int
        lib.fringe_pop_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int32, I32P, I32P, I32P, I32P,
            I32P, U8P, ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.fringe_len.restype = ctypes.c_int
        lib.fringe_len.argtypes = [ctypes.c_void_p]
        lib.fringe_clear.argtypes = [ctypes.c_void_p]
        lib.cache_update_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, I32P, I32P, I32P, U8P,
        ]
        lib.cache_must_explore_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, I32P, I32P, I32P, U8P,
        ]
        lib.cache_clear_layer.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.cache_clear.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeSearch:
    """Combined fringe + cache backed by the C++ runtime."""

    def __init__(self, n_vars: int, key_cols: int):
        self.lib = load()
        if self.lib is None:
            raise RuntimeError("native runtime unavailable (no g++?)")
        self.n = n_vars
        self.K = key_cols
        self.h = self.lib.ddo_new(n_vars, key_cols)

    def __del__(self):
        if getattr(self, "h", None) and self.lib is not None:
            self.lib.ddo_free(self.h)
            self.h = None

    # ---------------------------------------------------------- fringe
    def push_batch(self, keys, depths, values, ubs, scores, path_vals, path_set):
        count = len(depths)
        if count == 0:
            return
        self.lib.fringe_push_batch(
            self.h, count,
            np.ascontiguousarray(keys, np.int32),
            np.ascontiguousarray(depths, np.int32),
            np.ascontiguousarray(values, np.int32),
            np.ascontiguousarray(ubs, np.int32),
            np.ascontiguousarray(scores, np.int64),
            np.ascontiguousarray(path_vals, np.int32),
            np.ascontiguousarray(path_set, np.uint8),
        )

    def pop_batch(self, max_count: int, best_lb: int):
        K, n = self.K, self.n
        keys = np.empty((max_count, K), np.int32)
        depths = np.empty(max_count, np.int32)
        values = np.empty(max_count, np.int32)
        ubs = np.empty(max_count, np.int32)
        pvals = np.empty((max_count, n), np.int32)
        pset = np.empty((max_count, n), np.uint8)
        popped = ctypes.c_longlong(0)
        cnt = self.lib.fringe_pop_batch(
            self.h, max_count, best_lb, keys, depths, values, ubs, pvals, pset,
            ctypes.byref(popped),
        )
        return (
            keys[:cnt], depths[:cnt], values[:cnt], ubs[:cnt],
            pvals[:cnt], pset[:cnt].astype(bool), int(popped.value),
        )

    def __len__(self):
        return self.lib.fringe_len(self.h)

    def clear(self):
        self.lib.fringe_clear(self.h)

    # ----------------------------------------------------------- cache
    def cache_update_batch(self, depths, keys, values, explored):
        count = len(depths)
        if count == 0:
            return
        self.lib.cache_update_batch(
            self.h, count,
            np.ascontiguousarray(depths, np.int32),
            np.ascontiguousarray(keys, np.int32),
            np.ascontiguousarray(values, np.int32),
            np.ascontiguousarray(explored, np.uint8),
        )

    def cache_must_explore_batch(self, depths, keys, values):
        count = len(depths)
        out = np.empty(count, np.uint8)
        if count:
            self.lib.cache_must_explore_batch(
                self.h, count,
                np.ascontiguousarray(depths, np.int32),
                np.ascontiguousarray(keys, np.int32),
                np.ascontiguousarray(values, np.int32),
                out,
            )
        return out.astype(bool)

    def cache_clear_layer(self, depth: int):
        self.lib.cache_clear_layer(self.h, depth)

    def cache_clear(self):
        self.lib.cache_clear(self.h)
