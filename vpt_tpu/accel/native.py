"""Native (C++) acceleration-structure builder, loaded via ctypes.

Compiles vpt_tpu/accel/cpp/bvh_builder.cpp on first use (g++ -O3 -shared)
and caches the .so next to the source.  Falls back silently to the NumPy
builder when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_SRC = os.path.join(_CPP_DIR, "bvh_builder.cpp")
_LIB = os.path.join(_CPP_DIR, "libvpt_bvh.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
                 _SRC, "-o", _LIB],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB)
        lib.vpt_build_bvh.restype = ctypes.c_int
        lib.vpt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # v0
            ctypes.POINTER(ctypes.c_float),  # v1
            ctypes.POINTER(ctypes.c_float),  # v2
            ctypes.c_int,  # n_tris
            ctypes.c_int,  # leaf_size
            ctypes.POINTER(ctypes.c_float),  # aabb_min
            ctypes.POINTER(ctypes.c_float),  # aabb_max
            ctypes.POINTER(ctypes.c_int32),  # first
            ctypes.POINTER(ctypes.c_int32),  # count
            ctypes.POINTER(ctypes.c_int32),  # skip
            ctypes.POINTER(ctypes.c_int32),  # order
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_bvh_native(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, leaf_size: int):
    """Returns (aabb_min, aabb_max, first, count, skip, order) or None."""
    lib = _load()
    if lib is None:
        return None
    n = v0.shape[0]
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    cap = 2 * n
    aabb_min = np.empty((cap, 3), np.float32)
    aabb_max = np.empty((cap, 3), np.float32)
    first = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    skip = np.empty(cap, np.int32)
    order = np.empty(n, np.int32)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    f = ctypes.c_float
    i = ctypes.c_int32
    n_nodes = lib.vpt_build_bvh(
        p(v0, f), p(v1, f), p(v2, f), n, leaf_size,
        p(aabb_min, f), p(aabb_max, f), p(first, i), p(count, i), p(skip, i), p(order, i),
    )
    if n_nodes <= 0:
        return None
    return (
        aabb_min[:n_nodes].copy(), aabb_max[:n_nodes].copy(),
        first[:n_nodes].copy(), count[:n_nodes].copy(), skip[:n_nodes].copy(), order,
    )
