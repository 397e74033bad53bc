"""Native (C++) host runtime components, loaded via ctypes.

The reference implements its builder/runtime in native code; this package
holds the TPU framework's native host-side counterparts (SURVEY.md §2.2):
currently the OpenMP binned-SAH BVH8 builder (bvh_builder.cpp). The library
is compiled on demand with g++ and cached next to the sources.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libbvh.so")
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_lock = threading.Lock()
_lib = None


def _compile():
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library():
    """Load (compiling if needed) the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _compile()
            lib = ctypes.CDLL(_SO)
            lib.set_build_threads.restype = None
            lib.set_build_threads.argtypes = [ctypes.c_int]
            lib.build_bvh8.restype = ctypes.c_int
            lib.build_bvh8.argtypes = [
                ctypes.c_int,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ctypes.c_int,
                ctypes.c_int,
            ]
            _lib = lib
        except Exception:  # pragma: no cover - toolchain missing
            _lib = None
        return _lib


def native_available() -> bool:
    return load_library() is not None


def build_bvh8_native(lo, up, leaf_size=8, threads=0):
    """Build a BVH8 with the native builder.

    Args:
      lo, up: (n, 3) float32 primitive bounds (numpy, host).
    Returns:
      (node_lower, node_upper, node_child, prim_order, n_nodes) numpy arrays —
      same layout as accel/bvh.py BVH (leaf ref = -(start<<4|count)-1).
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native builder unavailable (g++ failed)")
    lib.set_build_threads(int(threads))
    lo = np.ascontiguousarray(lo, np.float32)
    up = np.ascontiguousarray(up, np.float32)
    n = lo.shape[0]
    max_nodes = max(2, n)  # BVH8 nodes <= ceil(n / 2) in practice; n is safe
    node_lower = np.zeros((max_nodes, 8, 3), np.float32)
    node_upper = np.zeros((max_nodes, 8, 3), np.float32)
    node_child = np.zeros((max_nodes, 8), np.int32)
    prim_order = np.zeros(n, np.int32)
    count = lib.build_bvh8(n, lo, up, node_lower.reshape(-1),
                           node_upper.reshape(-1), node_child.reshape(-1),
                           prim_order, max_nodes, leaf_size)
    if count < 0:
        raise RuntimeError("native BVH build overflowed node budget")
    return (node_lower[:count], node_upper[:count], node_child[:count],
            prim_order, count)
