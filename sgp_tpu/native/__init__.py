"""ctypes bindings for the native host-side graph kernels.

Builds ``libgraphcore.so`` from ``graphcore.cpp`` on first use (g++,
cached next to the source) and exposes numpy-friendly wrappers. If no
compiler is available the module degrades gracefully
(``AVAILABLE = False``) and callers fall back to the numpy/scipy paths —
behavior is identical either way (tested).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graphcore.cpp")
_LIB = os.path.join(_DIR, "libgraphcore.so")

AVAILABLE = False
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, AVAILABLE
    if _lib is not None:
        return
    if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        if not _build():
            return
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    lib.coalesce_edges.restype = ctypes.c_int64
    lib.coalesce_edges.argtypes = [i32p, i32p, f32p, ctypes.c_int64,
                                   ctypes.c_int64, i32p, i32p, f32p]
    lib.build_csr.restype = None
    lib.build_csr.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.khop_bfs.restype = ctypes.c_int64
    lib.khop_bfs.argtypes = [i64p, i32p, ctypes.c_int64, i32p,
                             ctypes.c_int64, ctypes.c_int64, u8p]
    lib.csr_spmm.restype = None
    lib.csr_spmm.argtypes = [i64p, i32p, f32p, f32p, ctypes.c_int64,
                             ctypes.c_int64, f32p]
    lib.sample_edges_uniform.restype = None
    lib.sample_edges_uniform.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                         ctypes.c_uint64, i64p]
    _lib = lib
    AVAILABLE = True


_load()


def coalesce_edges(src, dst, weight, num_nodes: int):
    """Sorted-by-(dst,src), duplicate-summed edges. Native or None."""
    if not AVAILABLE:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    w = np.ascontiguousarray(weight, np.float32)
    e = len(src)
    out_s = np.empty(e, np.int32)
    out_d = np.empty(e, np.int32)
    out_w = np.empty(e, np.float32)
    m = _lib.coalesce_edges(src, dst, w, e, num_nodes, out_s, out_d,
                            out_w)
    return out_s[:m].copy(), out_d[:m].copy(), out_w[:m].copy()


def khop_mask(src, dst, num_nodes: int, roots, k: int):
    """Boolean membership mask of the k-hop in-neighborhood of roots."""
    if not AVAILABLE:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    order = np.argsort(dst, kind="stable")
    src_s, dst_s = src[order], dst[order]
    indptr = np.zeros(num_nodes + 1, np.int64)
    _lib.build_csr(dst_s, len(dst_s), num_nodes, indptr)
    mask = np.zeros(num_nodes, np.uint8)
    roots = np.ascontiguousarray(roots, np.int32)
    _lib.khop_bfs(indptr, src_s, num_nodes, roots, len(roots), k, mask)
    return mask.astype(bool)


def csr_spmm(indptr, indices, data, x):
    """Host CSR SpMM (oracle / preprocessing)."""
    if not AVAILABLE:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float32)
    x = np.ascontiguousarray(x, np.float32)
    n, f = len(indptr) - 1, x.shape[1]
    out = np.empty((n, f), np.float32)
    _lib.csr_spmm(indptr, indices, data, x, n, f, out)
    return out


def sample_edges_uniform(num_edges: int, max_edges: int, seed: int):
    if not AVAILABLE:
        return None
    out = np.empty(min(max_edges, num_edges), np.int64)
    _lib.sample_edges_uniform(num_edges, len(out), seed, out)
    return out
