"""Static graph: a fixed-topology graph backed by padded CSR device arrays.

API-parity port of the reference ``stgraph/graph/static/static_graph.py``
(constructor ``StaticGraph(edge_list, edge_weights, num_nodes)``, accessors
``get_num_nodes/get_num_edges/get_ndata/set_ndata/in_degrees/out_degrees``),
re-designed for TPU: instead of exposing eight raw device pointers
(``stgraph/graph/stgraph_base.py:51-59``) the graph exposes two ``CSR``
pytrees (forward = dst-major in-neighbors, backward = its transpose) that
flow directly into jitted functions.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from stgraph_tpu.graph.csr import CSR, build_csr
from stgraph_tpu.graph.stgraph_base import STGraphBase


class StaticGraph(STGraphBase):
    """Fixed-topology graph with node/edge data dictionaries.

    Example::

        graph = StaticGraph(edge_list=cora.get_edges(),
                            edge_weights=[1.0] * cora.gdata["num_edges"],
                            num_nodes=cora.gdata["num_nodes"])
        graph.set_ndata("norm", norm)        # (N, 1) array
    """

    def __init__(
        self,
        edge_list: Sequence,
        edge_weights: Optional[Sequence] = None,
        num_nodes: Optional[int] = None,
        pad_multiple: int = 8,
    ) -> None:
        super().__init__()
        edges = np.asarray(list(edge_list), dtype=np.int64).reshape(-1, 2)
        if num_nodes is None:
            num_nodes = int(edges.max()) + 1 if len(edges) else 0
        self._num_nodes = int(num_nodes)
        self._num_edges = edges.shape[0]

        src, dst = edges[:, 0], edges[:, 1]
        # Forward CSR aggregates over in-neighbors: row = dst, col = src
        # (reference reverses the edge list for the fwd CSR,
        # static_graph.py:51-57).
        self._forward_graph = build_csr(
            src, dst, self._num_nodes, pad_multiple=pad_multiple
        )
        # Backward CSR (row = src, col = dst) is built host-side rather than
        # via CSR.transpose(): device argsorts are eager dispatches, which
        # are pathologically slow over a remote-TPU tunnel. Both builds
        # label eids by user edge order, so edge data is shared.
        self._backward_graph = build_csr(
            dst, src, self._num_nodes, capacity=self._forward_graph.capacity
        )

        if edge_weights is not None:
            w = np.asarray(edge_weights, dtype=np.float32).reshape(-1)
            if w.shape[0] != self._num_edges:
                raise ValueError("edge_weights length must equal num_edges")
            self.set_edata("edge_weight", w.reshape(-1, 1))

    # -- reference API surface -------------------------------------------
    @property
    def fwd_csr(self) -> CSR:
        return self._forward_graph

    @property
    def bwd_csr(self) -> CSR:
        return self._backward_graph

    # -- Pallas kernel layouts (lazy, host-built once per graph) -----------
    @property
    def blocked_fwd(self):
        if getattr(self, "_blocked_fwd", None) is None:
            import jax

            from stgraph_tpu.graph.blocked import build_blocked

            # Eager even when first touched inside a jit trace (the layout is
            # concrete host data; without this, tracers leak into the cache).
            with jax.ensure_compile_time_eval():
                self._blocked_fwd = build_blocked(self._forward_graph)
        return self._blocked_fwd

    @property
    def blocked_bwd(self):
        if getattr(self, "_blocked_bwd", None) is None:
            import jax

            from stgraph_tpu.graph.blocked import build_blocked

            with jax.ensure_compile_time_eval():
                self._blocked_bwd = build_blocked(self._backward_graph)
        return self._blocked_bwd

    def get_num_nodes(self) -> int:
        return self._num_nodes

    def get_num_edges(self) -> int:
        return self._num_edges

    def graph_type(self) -> str:
        return "csr"

    def in_degrees(self) -> np.ndarray:
        # Host-side diff of indptr (no device dispatch).
        return np.diff(np.asarray(self._forward_graph.indptr)).astype(np.int32)

    def out_degrees(self) -> np.ndarray:
        return np.diff(np.asarray(self._backward_graph.indptr)).astype(np.int32)

    def weighted_in_degrees(self) -> np.ndarray:
        """Sum of in-edge weights per node (reference ``csr.cu:48-50``)."""
        w = self.get_edata("edge_weight")
        if w is None:
            return self.in_degrees()
        csr = self._forward_graph
        w_sorted = np.asarray(w).reshape(-1)[np.asarray(csr.eids)[: self._num_edges]]
        seg = np.zeros(self._num_nodes, dtype=np.float64)
        np.add.at(seg, np.asarray(csr.rows)[: self._num_edges], w_sorted)
        return seg
