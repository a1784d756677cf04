"""Native (C++) host-side kernels, loaded via ctypes.

The shared library is compiled on demand with g++ the first time it is
needed and cached next to the source.  Every native entry point has a
pure NumPy/scipy fallback in the Python layer, so the package works
without a toolchain; the native path exists because the mesh build's
adjacency union is ~100x cheaper in C++ than as scipy sparse matmuls
(see native/graphbuild.cpp).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np
import scipy.sparse as sp

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graphbuild.cpp")
_LIB = os.path.join(_DIR, "libgraphbuild.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB)
            lib.node_adjacency.restype = ctypes.c_int64
            lib.node_adjacency.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ]
            lib.node_adjacency_fill32.restype = ctypes.c_int64
            lib.node_adjacency_fill32.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def node_adjacency_native_flat(e2n_flat, e2n_off, nbr_flat, nbr_off,
                               nnods: int, star: int) -> Optional[sp.csr_matrix]:
    """C++ node adjacency from flat (CSR-style) element lists; None when
    the toolchain is unavailable (callers fall back to scipy).  The count
    pass caches its per-signature-group rows C++-side, so the fill pass
    is a straight copy."""
    lib = _load()
    if lib is None:
        return None

    nel = len(e2n_off) - 1
    e2n_flat = np.ascontiguousarray(e2n_flat, dtype=np.int64)
    e2n_off = np.ascontiguousarray(e2n_off, dtype=np.int64)
    nbr_off = np.ascontiguousarray(nbr_off, dtype=np.int64)
    nbr_flat = (np.ascontiguousarray(nbr_flat, dtype=np.int64)
                if nbr_off[-1] else np.zeros(1, dtype=np.int64))

    indptr = np.zeros(nnods + 1, dtype=np.int64)
    nnz = lib.node_adjacency(
        _p(e2n_flat), _p(e2n_off), _p(nbr_flat), _p(nbr_off),
        nel, nnods, star, _p(indptr), None,
    )
    indices = np.empty(nnz, dtype=np.int32)
    lib.node_adjacency_fill32(
        _p(e2n_flat), _p(e2n_off), _p(nbr_flat), _p(nbr_off),
        nel, nnods, star, _p(indptr),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return sp.csr_matrix(
        (np.ones(nnz, dtype=bool), indices, indptr.astype(np.int32)),
        shape=(nnods, nnods),
    )


def node_adjacency_native(e2n, neighbours, nnods: int, star: int) -> Optional[sp.csr_matrix]:
    """Ragged-list wrapper around node_adjacency_native_flat."""
    nel = len(e2n)
    e2n_off = np.zeros(nel + 1, dtype=np.int64)
    np.cumsum([len(x) for x in e2n], out=e2n_off[1:])
    e2n_flat = (np.concatenate(e2n) if nel else np.empty(0, np.int64))
    nbr_off = np.zeros(nel + 1, dtype=np.int64)
    np.cumsum([len(x) for x in neighbours], out=nbr_off[1:])
    nbr_flat = (np.concatenate(neighbours) if nbr_off[-1]
                else np.empty(0, np.int64))
    return node_adjacency_native_flat(e2n_flat, e2n_off, nbr_flat, nbr_off,
                                      nnods, star)
