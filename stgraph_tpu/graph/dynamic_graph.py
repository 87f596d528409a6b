"""Dynamic (discrete-time) graphs: per-timestamp topology with delta updates.

Re-design of the reference ``stgraph/graph/dynamic/dynamic_graph.py``:

- The reference converts per-timestamp edge lists into ``{add, delete}``
  deltas (``_preprocess_graph_structure``, ``dynamic_graph.py:56-79``) and
  *mutates* a device-resident structure forward during the forward pass and
  backward during backprop (``get_graph``/``get_backward_graph``,
  ``:90-128``), with the executor re-binding raw CSR pointers each step.
- On TPU, mutation is replaced by *functional snapshots with one static
  shape*: every timestamp's CSR is padded to a common capacity, so a single
  compiled kernel serves all timestamps, and ``jax.lax.scan`` can carry the
  snapshot stack through the time loop. Backward "time travel" is free —
  JAX's autodiff replays the scan in reverse, which is exactly what the
  reference's state-stack + delta-rewind machinery implements by hand
  (``executor.py:369-426``).

Subclasses:
  * ``NaiveGraph`` — prebuilds all snapshot CSRs host-side (the analogue of
    ``dynamic/naive/naive_graph.py``: one CSR per timestamp).
  * ``DeltaGraph`` — keeps a single device-resident sorted edge store and
    applies add/delete deltas *on device* with sort/scan primitives: the
    TPU-native answer to PCSR/GPMA's O(updates) in-place structure change
    (``dynamic/pcsr/pcsr.cu``, ``dynamic/gpma/gpma.cu``).
"""

from __future__ import annotations

import time
from abc import abstractmethod
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from stgraph_tpu.graph.stgraph_base import STGraphBase

__all__ = ["DynamicGraph", "preprocess_deltas"]


def preprocess_deltas(
    edge_lists: Sequence[Sequence[Tuple[int, int]]],
    edge_weight_lists: Optional[Sequence[Sequence[float]]] = None,
) -> List[Dict[str, np.ndarray]]:
    """Convert per-timestamp edge lists to per-timestamp add/delete deltas.

    Mirrors the reference's ``_preprocess_graph_structure``
    (``dynamic_graph.py:56-79``): ``delta[t]['add']`` holds edges present at
    ``t`` but not ``t-1``; ``delta[t]['delete']`` the reverse. ``delta[0]``
    adds the whole initial edge set.

    With ``edge_weight_lists``, an edge whose weight *changes* between
    timestamps appears in both lists (delete of the old, add of the new) —
    the functional equivalent of the reference relabelling per-timestamp
    edge data (``pcsr.cu:748``). ``delta[t]['add_w']`` carries the added
    edges' weights.

    Implementation detail: edges are packed into int64 keys ``dst<<32 | src``
    (the same packing GPMA stores device-side, ``gpma.cu:58-108``) so each
    step's diff is two sorted-array set differences in C, not Python sets.
    """
    weighted = edge_weight_lists is not None
    deltas: List[Dict[str, np.ndarray]] = []
    prev = np.empty(0, dtype=np.int64)
    prev_w = np.empty(0, dtype=np.float32)
    for t, edges in enumerate(edge_lists):
        e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
        raw_keys = (e[:, 1] << 32) | e[:, 0]  # (dst, src) packing
        keys, first = np.unique(raw_keys, return_index=True)
        if weighted:
            w = np.asarray(edge_weight_lists[t], np.float32).reshape(-1)[first]
        if not weighted:
            add = np.setdiff1d(keys, prev, assume_unique=True)
            delete = np.setdiff1d(prev, keys, assume_unique=True)
            deltas.append({"add": _unpack(add), "delete": _unpack(delete)})
        else:
            # keys/prev sorted unique: align with searchsorted, flag weight
            # changes on the intersection as delete+add pairs.
            idx = np.searchsorted(prev, keys)
            idxc = np.minimum(idx, max(len(prev) - 1, 0))
            in_prev = (len(prev) > 0) & (idx < len(prev))
            in_prev = in_prev & (prev[idxc] == keys) if len(prev) else np.zeros(len(keys), bool)
            changed = in_prev & (prev_w[idxc] != w) if len(prev) else np.zeros(len(keys), bool)
            add_mask = ~in_prev | changed
            jdx = np.searchsorted(keys, prev)
            jdxc = np.minimum(jdx, max(len(keys) - 1, 0))
            in_cur = (len(keys) > 0) & (jdx < len(keys))
            in_cur = in_cur & (keys[jdxc] == prev) if len(keys) else np.zeros(len(prev), bool)
            changed2 = in_cur & (w[jdxc] != prev_w) if len(keys) else np.zeros(len(prev), bool)
            del_mask = ~in_cur | changed2
            deltas.append(
                {
                    "add": _unpack(keys[add_mask]),
                    "add_w": w[add_mask],
                    "delete": _unpack(prev[del_mask]),
                }
            )
            prev_w = w
        prev = keys
    return deltas


def _unpack(keys: np.ndarray) -> np.ndarray:
    """int64 (dst<<32|src) keys → (k, 2) int32 (src, dst) rows."""
    out = np.empty((len(keys), 2), dtype=np.int32)
    out[:, 0] = keys & 0xFFFFFFFF
    out[:, 1] = keys >> 32
    return out


class DynamicGraph(STGraphBase):
    """Base class for discrete-time dynamic graphs.

    Keeps the reference's public accessors (``get_graph(t)``,
    ``get_backward_graph(t)`` and the update-time counters,
    ``dynamic_graph.py:50-52,90-128``) but both return immutable ``CSR``
    pytrees rather than mutating shared device state.
    """

    def __init__(
        self,
        edge_lists: Sequence[Sequence[Tuple[int, int]]],
        edge_weight_lists: Optional[Sequence[Sequence[float]]] = None,
    ) -> None:
        super().__init__()
        self._edge_lists = [np.asarray(e, dtype=np.int64).reshape(-1, 2) for e in edge_lists]
        self._num_timestamps = len(self._edge_lists)
        nodes = 0
        for e in self._edge_lists:
            if len(e):
                nodes = max(nodes, int(e.max()) + 1)
        self._num_nodes = nodes
        self._deltas = preprocess_deltas(edge_lists, edge_weight_lists)
        self.max_num_edges = max((len(e) for e in self._edge_lists), default=0)
        # Perf counters, matching the reference's
        # get_fwd_graph_time/get_bwd_graph_time/move_to_gpu_time surface.
        self._update_time = 0.0
        self._move_to_device_time = 0.0

    # -- reference API surface -------------------------------------------
    @property
    def num_timestamps(self) -> int:
        return self._num_timestamps

    def get_num_nodes(self) -> int:
        return self._num_nodes

    def get_num_edges(self) -> int:
        return self.max_num_edges

    def get_fwd_graph_time(self) -> float:
        return self._update_time

    def get_bwd_graph_time(self) -> float:
        # Functional snapshots: backward needs no structure rebuild.
        return 0.0

    def get_move_to_gpu_time(self) -> float:  # name kept for parity
        return self._move_to_device_time

    @abstractmethod
    def get_graph(self, timestamp: int):
        """Forward CSR snapshot at ``timestamp``."""

    @abstractmethod
    def get_backward_graph(self, timestamp: int):
        """Transpose CSR snapshot at ``timestamp``."""
