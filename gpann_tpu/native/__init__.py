"""Native (C++) host components, bound via ctypes.

Role parity: the reference's runtime around the compute kernels is C++
(parlaylib scheduling, KaMinPar partitioning host logic). Here the TPU owns
the compute; these C++ ops cover the irregular host-side graph work where
NumPy/Python loops are orders of magnitude too slow on the single-core build
host. Every native op has a NumPy fallback (``available() == False`` path)
so the framework runs without a toolchain.

Build: lazy ``make`` on first import (``gpann_tpu/native/Makefile``), cached
as ``libgpann_native.so`` next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libgpann_native.so")
_SRC = os.path.join(_HERE, "src", "graph_ops.cc")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("GPANN_TPU_NO_NATIVE"):
        return None
    src_mtime = os.path.getmtime(_SRC)
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < src_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    lib.heavy_edge_matching.restype = ctypes.c_int64
    lib.heavy_edge_matching.argtypes = [
        ctypes.c_int64, i64p, i32p, f32p, f32p, ctypes.c_float,
        ctypes.c_uint64, i64p,
    ]
    lib.bfs_grow_partition.restype = ctypes.c_int32
    lib.bfs_grow_partition.argtypes = [
        ctypes.c_int64, i64p, i32p, f32p, ctypes.c_int32, ctypes.c_double,
        ctypes.c_uint64, i32p,
    ]
    lib.force_balance.restype = ctypes.c_int32
    lib.force_balance.argtypes = [
        ctypes.c_int64, i64p, i32p, f32p, f32p, ctypes.c_int32,
        ctypes.c_double, i32p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def heavy_edge_matching(indptr, indices, weights, node_w, max_node_w, seed):
    """partner[i] = matched partner or i. Native or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(indptr) - 1
    partner = np.empty(n, np.int64)
    lib.heavy_edge_matching(
        n,
        np.ascontiguousarray(indptr, np.int64),
        np.ascontiguousarray(indices, np.int32),
        np.ascontiguousarray(weights, np.float32),
        np.ascontiguousarray(node_w, np.float32),
        float(max_node_w), int(seed) & (2**64 - 1), partner,
    )
    return partner


def bfs_grow_partition(indptr, indices, node_w, k, cap, seed):
    lib = _load()
    if lib is None:
        return None
    n = len(indptr) - 1
    part = np.full(n, -1, np.int32)
    lib.bfs_grow_partition(
        n,
        np.ascontiguousarray(indptr, np.int64),
        np.ascontiguousarray(indices, np.int32),
        np.ascontiguousarray(node_w, np.float32),
        int(k), float(cap), int(seed) & (2**64 - 1), part,
    )
    return part


def force_balance(indptr, indices, weights, node_w, k, cap, part):
    lib = _load()
    if lib is None:
        return None
    part = np.ascontiguousarray(part, np.int32).copy()
    lib.force_balance(
        len(indptr) - 1,
        np.ascontiguousarray(indptr, np.int64),
        np.ascontiguousarray(indices, np.int32),
        np.ascontiguousarray(weights, np.float32),
        np.ascontiguousarray(node_w, np.float32),
        int(k), float(cap), part,
    )
    return part
