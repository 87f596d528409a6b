"""Gather-locality node relabeling (host-side layout pass).

The TPU SpMM's dominant cost at large N is the per-edge random row fetch
``h[cols]``: once the node feature table outgrows the DRAM page-hit window
(~627 MB at ogbn-products scale) every read is a page miss and measured
throughput drops 5.6x (docs/PERF.md "ogbn-products scale"). The structure
of real graphs is the remedy: community-clustered graphs touch only a
small set of distinct rows per CSR region, *if* node ids are assigned so
that communities are contiguous. This pass relabels nodes by synchronous
**label propagation** (adopt the most frequent neighbor label, ties to the
smaller label, ≤8 rounds) followed by a stable sort by (label, id).

Algorithm selection was measured (scale-0.01 synthetic products, SBM with
ground-truth communities): BFS/Cuthill-McKee recovers <10% of the possible
working-set shrink (on small-diameter graphs BFS level 2+ spans every
community), greedy max-connectivity traversal ~15% (hubs pollute the
priority queue across communities); label propagation converges to the
ground-truth communities in ~3 rounds and lands within 1% of the
true-community-order working set.

This is the TPU-first counterpart of the reference's degree-sorted
``node_ids`` (``stgraph/graph/static/csr.cu:143-154``) — its goal there is
GPU warp load balance; here the goal is HBM page locality, which degree
sorting does not provide (it scatters each neighborhood across the table).

Host-side only: the order is computed once per graph (native C++ when
available, vectorized numpy fallback with identical semantics) and applied
by relabeling the edge list and permuting node data before CSR
construction — kernels see an ordinary CSR and need no changes.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = [
    "locality_order",
    "inverse_permutation",
    "relabel_edges",
    "gather_working_set",
]

_LP_ROUNDS = 8


def inverse_permutation(order: np.ndarray) -> np.ndarray:
    """new_id such that ``new_id[order[k]] == k``."""
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order), dtype=order.dtype)
    return inv


def locality_order(src, dst, num_nodes: int) -> np.ndarray:
    """Locality order: ``order[k]`` = old node id at new position k.

    Label-propagation community detection + stable sort by (label, id);
    each community lands in one contiguous id range.
    """
    src = np.asarray(src, np.int32).reshape(-1)
    dst = np.asarray(dst, np.int32).reshape(-1)
    from stgraph_tpu import native

    order = native.reorder_locality(src, dst, int(num_nodes))
    if order is not None:
        return order
    return _lp_order_numpy(src, dst, int(num_nodes))


def relabel_edges(
    src: np.ndarray, dst: np.ndarray, order: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Map an edge list into the new id space defined by ``order``."""
    new_id = inverse_permutation(np.asarray(order))
    return new_id[np.asarray(src)], new_id[np.asarray(dst)]


def _lp_order_numpy(
    src: np.ndarray, dst: np.ndarray, n: int, rounds: int = _LP_ROUNDS
) -> np.ndarray:
    """Vectorized label propagation fallback (no compiler available).

    Same semantics as the native path: synchronous rounds, most frequent
    neighbor label, ties to the smaller label, isolated nodes keep their
    own; final order = stable sort by (label, id).
    """
    if n == 0:
        return np.empty(0, np.int32)
    valid = (src >= 0) & (src < n) & (dst >= 0) & (dst < n)
    u = np.concatenate([src[valid], dst[valid]]).astype(np.int64)
    v = np.concatenate([dst[valid], src[valid]]).astype(np.int64)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(rounds):
        keys = u * (n + 1) + labels[v]
        uk, cnt = np.unique(keys, return_counts=True)
        u_of = uk // (n + 1)
        l_of = uk % (n + 1)
        # Per node: max count, ties -> min label. Sorting ascending by
        # (node, count, -label) leaves the winner last in each node group.
        idx = np.lexsort((-l_of, cnt, u_of))
        u_s, l_s = u_of[idx], l_of[idx]
        last = np.r_[u_s[1:] != u_s[:-1], True]
        new_labels = labels.copy()
        new_labels[u_s[last]] = l_s[last]
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
    return np.argsort(labels, kind="stable").astype(np.int32)


def gather_working_set(
    dst: np.ndarray,
    src: np.ndarray,
    num_nodes: int,
    region_edges: int = 1 << 20,
    row_bytes: int = 512,
) -> float:
    """Mean distinct-source working set (bytes) per CSR region.

    Diagnostic for the gather's DRAM page-hit behaviour: edges are taken in
    (dst, src) CSR order, split into regions of ``region_edges``, and each
    region's cost is its number of distinct source rows times ``row_bytes``.
    Lower = better locality (the region's gathers fit a smaller footprint).
    """
    dst = np.asarray(dst)
    src = np.asarray(src)
    order = np.lexsort((src, dst))
    s = src[order]
    sizes = []
    for lo in range(0, len(s), region_edges):
        seg = s[lo : lo + region_edges]
        sizes.append(len(np.unique(seg)) * row_bytes)
    return float(np.mean(sizes)) if sizes else 0.0
