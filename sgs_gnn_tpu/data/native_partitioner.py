"""ctypes bindings for the native C++ graph partitioner
(native/partitioner.cpp) — the framework's METIS replacement.

Builds the shared library with g++ on first use and caches it next to the
source; falls back are handled by the caller (data/partition.py routes to
the scipy RCM partitioner if this import or the build fails).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "partitioner.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "libpartitioner.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.abspath(_SRC)
    lib_path = os.path.abspath(_LIB)
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             src, "-o", lib_path],
            check=True, capture_output=True)
    lib = ctypes.CDLL(lib_path)
    lib.greedy_partition.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    lib.greedy_partition.restype = None
    lib.greedy_partition_ex.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int32)]
    lib.greedy_partition_ex.restype = None
    lib.count_cut_edges.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
    lib.count_cut_edges.restype = ctypes.c_int64
    _lib = lib
    return lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def greedy_partition(edge_index: np.ndarray, num_nodes: int,
                     num_parts: int, deg_slack: float = 1.10,
                     node_slack: float = 1.35) -> np.ndarray:
    """Multilevel partition + refinement; returns int32[N] part ids.

    deg_slack/node_slack are the hard-cap multipliers over perfect balance
    (native/partitioner.cpp greedy_partition_ex): looser degree caps keep
    communities whole (higher intra-edge fraction) at the cost of
    edge-count skew, which the driver's padded shape classes absorb.
    Sweep on the Reddit-scale workload (117 parts, 82%-local graph):
    1.05 -> intra 0.638; 1.10 -> 0.665 (best); 1.20 -> 0.647; 1.35 ->
    0.594 — so 1.10 is the default."""
    lib = _load()
    s = np.ascontiguousarray(edge_index[0], np.int32)
    r = np.ascontiguousarray(edge_index[1], np.int32)
    out = np.empty(num_nodes, np.int32)
    lib.greedy_partition_ex(_ptr(s), _ptr(r), np.int64(s.shape[0]),
                            np.int32(num_nodes), np.int32(num_parts),
                            float(deg_slack), float(node_slack), _ptr(out))
    return out


def cut_edges(edge_index: np.ndarray, part: np.ndarray) -> int:
    lib = _load()
    s = np.ascontiguousarray(edge_index[0], np.int32)
    r = np.ascontiguousarray(edge_index[1], np.int32)
    p = np.ascontiguousarray(part, np.int32)
    return int(lib.count_cut_edges(_ptr(s), _ptr(r), np.int64(s.shape[0]),
                                   _ptr(p)))
