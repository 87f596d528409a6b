"""ctypes bindings for the native host-side graph builder.

Auto-builds ``libgraph_builder.so`` with g++ on first use (one-time, a
second or two) and falls back to the pure-numpy implementations when no
compiler is available. The native path matters at ogbn scale: counting-sort
CSR construction in C++ is ~20x faster than ``np.lexsort``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "available",
    "build_csr_arrays",
    "build_blocked_arrays",
    "reorder_locality",
]

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libgraph_builder.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src_path = os.path.join(_DIR, "graph_builder.cpp")
    stale = not os.path.exists(_LIB_PATH) or (
        os.path.exists(src_path)
        and os.path.getmtime(src_path) > os.path.getmtime(_LIB_PATH)
    )
    if stale:
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s", "-B"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.build_csr.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
        i32p, i32p, i32p, i32p,
    ]
    lib.build_csr.restype = ctypes.c_int
    lib.blocked_sizes.argtypes = [
        i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i64p, i64p,
    ]
    lib.blocked_sizes.restype = ctypes.c_int64
    lib.build_blocked.argtypes = [
        i32p, i32p, i32p, i32p, ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, i64p, ctypes.c_int64,
        i32p, i32p, i32p, i32p,
    ]
    lib.build_blocked.restype = ctypes.c_int
    if hasattr(lib, "reorder_locality"):  # older cached .so may predate it
        lib.reorder_locality.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int32, i32p,
        ]
        lib.reorder_locality.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def build_csr_arrays(
    src: np.ndarray, dst: np.ndarray, num_nodes: int, capacity: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """(indptr, rows, cols, eids) via the native builder, or None."""
    lib = _load()
    if lib is None:
        return None
    e = len(src)
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    indptr = np.empty(num_nodes + 1, np.int32)
    rows = np.empty(capacity, np.int32)
    cols = np.empty(capacity, np.int32)
    eids = np.empty(capacity, np.int32)
    rc = lib.build_csr(src, dst, e, num_nodes, capacity, indptr, rows, cols, eids)
    if rc != 0:
        return None
    return indptr, rows, cols, eids


def build_blocked_arrays(
    indptr: np.ndarray,
    rows: np.ndarray,
    cols: np.ndarray,
    eids: np.ndarray,
    num_nodes: int,
    capacity: int,
    row_block: int,
    edge_chunk: int,
):
    """(offsets, counts, bdst, bcols, bperm, beids) or None."""
    lib = _load()
    if lib is None:
        return None
    n_pad = max(
        ((num_nodes + row_block - 1) // row_block) * row_block, row_block
    )
    nb = n_pad // row_block
    offsets = np.empty(nb, np.int64)
    counts = np.empty(nb, np.int64)
    indptr = np.ascontiguousarray(indptr, np.int32)
    total = lib.blocked_sizes(indptr, num_nodes, row_block, edge_chunk, offsets, counts)
    bdst = np.empty(total, np.int32)
    bcols = np.empty(total, np.int32)
    bperm = np.empty(total, np.int32)
    beids = np.empty(total, np.int32)
    rc = lib.build_blocked(
        indptr,
        np.ascontiguousarray(rows, np.int32),
        np.ascontiguousarray(cols, np.int32),
        np.ascontiguousarray(eids, np.int32),
        num_nodes,
        capacity,
        row_block,
        edge_chunk,
        offsets,
        total,
        bdst,
        bcols,
        bperm,
        beids,
    )
    if rc != 0:
        return None
    return offsets, counts, bdst, bcols, bperm, beids


def reorder_locality(
    src: np.ndarray, dst: np.ndarray, num_nodes: int
) -> Optional[np.ndarray]:
    """Greedy max-connectivity locality order via the native builder, or
    None. Returns ``order`` with ``order[k]`` = old node id at position k.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "reorder_locality"):
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    order = np.empty(num_nodes, np.int32)
    rc = lib.reorder_locality(src, dst, len(src), num_nodes, order)
    if rc != 0:
        return None
    return order
