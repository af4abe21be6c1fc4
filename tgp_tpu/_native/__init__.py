"""ctypes loader for the native C++ host kernels (with build-on-demand).

Mirrors the reference's native-dependency layer (torch_cluster /
torch_scatter C++ kernels) for the host-side combinatorial work.  Falls
back silently to the NumPy implementations when the toolchain is missing —
callers use ``try: native... except: numpy...`` (see
tgp_tpu/precoarsen/graclus.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libtgp_native.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() or (
        _LIB_PATH.stat().st_mtime < (_DIR / "native.cpp").stat().st_mtime
    ):
        subprocess.run(["make", "-s"], cwd=_DIR, check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.graclus_matching.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i64p, i64p, f64p, ctypes.c_uint64,
        i64p]
    lib.maximal_matching_ranked.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p, u8p]
    lib.propagate_assignments.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i64p, i64p, ctypes.c_int64,
        ctypes.c_int64, i64p]
    _lib = lib
    return lib


def native_graclus_matching(edge_index, num_nodes, edge_weight=None,
                            seed: int = 0) -> np.ndarray:
    lib = _load()
    ei = np.ascontiguousarray(np.asarray(edge_index), np.int64)
    e = ei.shape[1]
    w = np.ascontiguousarray(
        np.ones(e) if edge_weight is None else np.asarray(edge_weight),
        np.float64)
    out = np.empty(num_nodes, np.int64)
    lib.graclus_matching(num_nodes, e, np.ascontiguousarray(ei[0]),
                         np.ascontiguousarray(ei[1]), w, seed, out)
    return out


def native_maximal_matching(edge_index, num_nodes, rank) -> np.ndarray:
    lib = _load()
    ei = np.ascontiguousarray(np.asarray(edge_index), np.int64)
    e = ei.shape[1]
    rank = np.ascontiguousarray(np.asarray(rank), np.int64)
    out = np.zeros(e, np.uint8)
    lib.maximal_matching_ranked(num_nodes, e, np.ascontiguousarray(ei[0]),
                                np.ascontiguousarray(ei[1]), rank, out)
    return out.astype(bool)


def native_propagate_assignments(edge_index, assignments, max_iter: int,
                                 num_clusters: int) -> np.ndarray:
    lib = _load()
    ei = np.ascontiguousarray(np.asarray(edge_index), np.int64)
    a = np.ascontiguousarray(np.asarray(assignments), np.int64).copy()
    lib.propagate_assignments(a.shape[0], ei.shape[1],
                              np.ascontiguousarray(ei[0]),
                              np.ascontiguousarray(ei[1]), max_iter,
                              num_clusters, a)
    return a


def native_sep_merge(edge_index, num_nodes, edge_weight=None):
    """SEP greedy structural-entropy merge phase in C++.  Returns
    ``(parent [n_total], vol [n_total], cut [n_total], n_total)`` where
    leaves are 0..n-1 and internal nodes are appended; ``parent == -1``
    marks current roots."""
    lib = _load()
    import ctypes as ct

    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.sep_merge_tree.argtypes = [
        ct.c_int64, ct.c_int64, i64p, i64p, f64p, i64p, f64p, f64p,
        ct.POINTER(ct.c_int64)]
    ei = np.ascontiguousarray(np.asarray(edge_index), np.int64)
    e = ei.shape[1]
    w = np.ascontiguousarray(
        np.ones(e) if edge_weight is None else np.asarray(edge_weight),
        np.float64)
    cap = max(2 * num_nodes, 1)
    parent = np.full(cap, -1, np.int64)
    vol = np.zeros(cap, np.float64)
    cut = np.zeros(cap, np.float64)
    n_total = ct.c_int64(0)
    lib.sep_merge_tree(num_nodes, e, np.ascontiguousarray(ei[0]),
                       np.ascontiguousarray(ei[1]), w, parent, vol, cut,
                       ct.byref(n_total))
    nt = n_total.value
    return parent[:nt], vol[:nt], cut[:nt], nt
