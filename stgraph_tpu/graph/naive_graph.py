"""Naive dynamic graph: one prebuilt CSR snapshot per timestamp.

Analogue of the reference ``stgraph/graph/dynamic/naive/naive_graph.py``
(full fwd+bwd CSR per timestamp, ``naive_graph.py:55-67``) — except all
snapshots share one padded capacity so they stack into a single ``CSR``
pytree with a leading time axis, ready for ``jax.lax.scan`` over timesteps.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stgraph_tpu.graph.csr import CSR, build_csr, round_up
from stgraph_tpu.graph.dynamic_graph import DynamicGraph

__all__ = ["NaiveGraph"]


class NaiveGraph(DynamicGraph):
    """Prebuilds every snapshot's forward and transpose CSR host-side."""

    def __init__(
        self,
        edge_lists: Sequence[Sequence[Tuple[int, int]]],
        edge_weight_lists: Optional[Sequence[Sequence[float]]] = None,
        pad_multiple: int = 8,
    ) -> None:
        super().__init__(edge_lists)
        capacity = round_up(max(self.max_num_edges, 1), pad_multiple)
        self._capacity = capacity
        self._fwd: List[CSR] = []
        self._bwd: List[CSR] = []
        self._weights: Optional[List[np.ndarray]] = (
            [] if edge_weight_lists is not None else None
        )
        for t, edges in enumerate(self._edge_lists):
            csr = build_csr(
                edges[:, 0], edges[:, 1], self._num_nodes, capacity=capacity
            )
            self._fwd.append(csr)
            self._bwd.append(csr.transpose())
            if self._weights is not None:
                w = np.asarray(edge_weight_lists[t], dtype=np.float32).reshape(-1)
                wp = np.zeros(capacity, dtype=np.float32)
                # USER edge order (the dataset's per-timestamp alignment),
                # zero-padded: consumers permute into CSR order via eids
                # (``ops.message.edge_data_to_csr_order`` — the nn layers'
                # e_feats contract), and padding slots are masked out by the
                # aggregation's edge mask.
                wp[: len(w)] = w
                self._weights.append(wp.reshape(-1, 1))

    # -- per-timestamp access (reference API) -----------------------------
    def get_graph(self, timestamp: int) -> CSR:
        return self._fwd[timestamp]

    def get_backward_graph(self, timestamp: int) -> CSR:
        return self._bwd[timestamp]

    def get_edge_weights(self, timestamp: int) -> Optional[np.ndarray]:
        """(capacity, 1) edge weights at ``timestamp``, in USER edge order
        (permute with ``edge_data_to_csr_order`` for direct kernel use)."""
        if self._weights is None:
            return None
        return self._weights[timestamp]

    def graph_type(self) -> str:
        return "csr"

    # -- TPU-native access: stacked snapshots for lax.scan ----------------
    def stacked(self) -> CSR:
        """All snapshots as one ``CSR`` pytree with a leading (T,) axis.

        Feed this as the ``xs`` of a ``jax.lax.scan`` over timesteps: the
        scan body receives one snapshot per step, so a TGNN's whole-sequence
        forward+backward is a single XLA computation (replacing the
        reference's per-timestep pointer rebinding, ``executor.py:236-259``).
        """
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *self._fwd)

    def stacked_weights(self) -> Optional[jnp.ndarray]:
        if self._weights is None:
            return None
        return jnp.stack([jnp.asarray(w) for w in self._weights])
