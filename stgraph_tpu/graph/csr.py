"""CSR graph storage as statically-shaped JAX device arrays.

TPU-first re-design of the reference's CSR layer (reference
``stgraph/graph/static/csr.cu``: host-built row_offset / column_indices /
eids / node_ids vectors copied to device, exposed as raw pointers). On TPU
there are no raw pointers: the CSR is a pytree of ``jnp`` int32 arrays with
**static shapes** so every kernel compiled against a given capacity is reused
across graphs/snapshots. Padding edges carry the sentinel row/col id
``num_nodes`` so they are (a) maskable with a single compare and (b) dropped
by out-of-range scatter semantics in segment reductions.

Design differences vs the reference, on purpose:

- The reference degree-sorts ``node_ids`` for GPU load balancing
  (``csr.cu:143-154``). On TPU, load balancing is done by *edge-blocking*:
  kernels walk fixed-size edge chunks, not rows, so degree skew does not
  imbalance the grid. We keep degree arrays for GCN normalization instead.
- The reference builds forward (dst-major) and backward (src-major) CSRs as
  separate C++ objects (``static_graph.py:51-78``). Here ``CSR.transpose()``
  derives one from the other with the *same* ``eids`` labelling so edge data
  needs no re-permutation between forward and backward passes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "CSR",
    "build_csr",
    "pad_edges",
    "round_up",
]


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m``."""
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class CSR:
    """A padded CSR adjacency in row-major edge order.

    For the *forward* (message-passing) graph, ``rows`` are destination node
    ids and ``cols`` are source node ids — matching the reference convention
    where the forward CSR stores in-neighbors per destination
    (``stgraph/graph/static/static_graph.py:51-57``).

    Attributes:
      indptr:  (num_nodes + 1,) int32 — row offsets into the edge arrays.
      rows:    (capacity,) int32 — row id per edge; ``num_nodes`` on padding.
      cols:    (capacity,) int32 — col id per edge; ``num_nodes`` on padding.
      eids:    (capacity,) int32 — original edge id per edge (indexes edge
               data); ``capacity`` (out of range) on padding. Plays the role
               of the reference's eids array (``csr.cu:68-157``).
      num_nodes: static int.
      num_edges: number of real (non-padding) edges. May be a traced scalar
               for dynamic graphs whose edge count changes per snapshot.
    """

    indptr: jnp.ndarray
    rows: jnp.ndarray
    cols: jnp.ndarray
    eids: jnp.ndarray
    num_nodes: int = field(metadata={"static": True})
    num_edges: jnp.ndarray | int

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        children = (self.indptr, self.rows, self.cols, self.eids, self.num_edges)
        aux = (self.num_nodes,)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        indptr, rows, cols, eids, num_edges = children
        (num_nodes,) = aux
        return cls(
            indptr=indptr,
            rows=rows,
            cols=cols,
            eids=eids,
            num_nodes=num_nodes,
            num_edges=num_edges,
        )

    # -- host mirror ------------------------------------------------------
    def host_arrays(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(indptr, rows, cols, eids) as numpy, for host-side layout passes.

        ``build_csr`` attaches the originals (``_host``); without them this
        pulls from device — one transfer each, which over a remote-TPU
        tunnel is slow enough to matter, hence the cache.
        """
        cached = getattr(self, "_host", None)
        if cached is not None:
            return cached
        if isinstance(self.indptr, jax.core.Tracer):
            raise TypeError("host_arrays() requires a concrete (non-traced) CSR")
        host = (
            np.asarray(self.indptr),
            np.asarray(self.rows),
            np.asarray(self.cols),
            np.asarray(self.eids),
        )
        object.__setattr__(self, "_host", host)
        return host

    # -- basic properties ------------------------------------------------
    @property
    def capacity(self) -> int:
        """Static padded edge capacity."""
        return self.rows.shape[0]

    @property
    def edge_mask(self) -> jnp.ndarray:
        """(capacity,) bool — True on real edges, False on padding."""
        return self.rows < self.num_nodes

    def degrees(self) -> jnp.ndarray:
        """(num_nodes,) int32 — per-row edge counts (in-degrees for the
        forward graph; cf. reference ``csr.cu:48-50``)."""
        return self.indptr[1:] - self.indptr[:-1]

    def col_degrees(self) -> jnp.ndarray:
        """(num_nodes,) int32 — per-col edge counts (out-degrees for the
        forward graph)."""
        ones = jnp.where(self.edge_mask, 1, 0)
        return jax.ops.segment_sum(ones, self.cols, num_segments=self.num_nodes)

    # -- derived structures ----------------------------------------------
    def transpose(self) -> "CSR":
        """Return the transposed CSR (rows<->cols), keeping ``eids``.

        This is the backward graph: gradients aggregate over out-edges of
        each source node (reference builds it as a separate src-sorted CSR,
        ``static_graph.py:59-60,75-78``). Works under ``jit``: a stable sort
        by (col, row) with padding pushed to the end.
        """
        n = self.num_nodes
        if not isinstance(self.rows, jax.core.Tracer):
            cached = getattr(self, "_transpose_cache", None)
            if cached is not None:
                return cached
            # Concrete CSR: transpose host-side (numpy) — no device argsort
            # dispatches, and the result carries its own host mirror.
            _, rows, cols, eids = self.host_arrays()
            order = np.lexsort((rows, cols))
            t_rows, t_cols, t_eids = cols[order], rows[order], eids[order]
            counts = np.bincount(t_rows[t_rows < n], minlength=n)
            indptr = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(counts, out=indptr[1:])
            out = _make_csr_with_host(
                indptr, t_rows, t_cols, t_eids, n, self.num_edges
            )
            object.__setattr__(self, "_transpose_cache", out)
            return out
        # Sort by (col, row) without forming a wide composite key (which
        # would overflow int32 for n > ~46k): two stable argsorts — first by
        # row, then by col. Padding already carries col == n, so it sorts
        # last without special-casing.
        order1 = jnp.argsort(self.rows, stable=True)
        order = order1[jnp.argsort(self.cols[order1], stable=True)]
        new_rows = self.cols[order]
        new_cols = self.rows[order]
        new_eids = self.eids[order]
        counts = jax.ops.segment_sum(
            jnp.where(self.edge_mask, 1, 0), self.cols, num_segments=n
        )
        indptr = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
        )
        return CSR(
            indptr=indptr,
            rows=new_rows,
            cols=new_cols,
            eids=new_eids,
            num_nodes=n,
            num_edges=self.num_edges,
        )


def pad_edges(
    src: np.ndarray, dst: np.ndarray, num_nodes: int, capacity: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad (src, dst) edge arrays to ``capacity`` with sentinel ids."""
    e = len(src)
    if capacity < e:
        raise ValueError(f"capacity {capacity} < num_edges {e}")
    psrc = np.full(capacity, num_nodes, dtype=np.int32)
    pdst = np.full(capacity, num_nodes, dtype=np.int32)
    peid = np.full(capacity, capacity, dtype=np.int32)
    psrc[:e] = src
    pdst[:e] = dst
    peid[:e] = np.arange(e, dtype=np.int32)
    return psrc, pdst, peid


def build_csr(
    src,
    dst,
    num_nodes: int,
    capacity: Optional[int] = None,
    pad_multiple: int = 8,
) -> CSR:
    """Build a row-major (row=dst) CSR from an edge list, on host.

    Edges are sorted by (dst, src) — the reference's forward ordering
    (``static_graph.py:65-67``) — and ``eids`` label edges by that sorted
    position so edge data supplied in user order is permuted once at graph
    construction, never per step.

    Args:
      src, dst: 1-D int arrays of endpoint ids (user edge order).
      num_nodes: number of nodes.
      capacity: padded edge capacity (default: len(src) rounded up to
        ``pad_multiple``).
    """
    src = np.asarray(src, dtype=np.int32).reshape(-1)
    dst = np.asarray(dst, dtype=np.int32).reshape(-1)
    if src.shape != dst.shape:
        raise ValueError("src and dst must have the same length")
    e = len(src)
    if capacity is None:
        capacity = round_up(max(e, 1), pad_multiple)

    # Native counting-sort builder when available (stgraph_tpu/native):
    # ~20x faster than np.lexsort at ogbn scale.
    from stgraph_tpu import native

    built = native.build_csr_arrays(src, dst, int(num_nodes), int(capacity))
    if built is not None:
        indptr, rows, cols, eids = built
        return _make_csr_with_host(indptr, rows, cols, eids, int(num_nodes), e)

    # Stable sort by (dst, src); eid = original user position.
    order = np.lexsort((src, dst))
    s_src = src[order]
    s_dst = dst[order]
    s_eid = np.arange(e, dtype=np.int32)[order]

    rows = np.full(capacity, num_nodes, dtype=np.int32)
    cols = np.full(capacity, num_nodes, dtype=np.int32)
    eids = np.full(capacity, capacity, dtype=np.int32)
    rows[:e] = s_dst
    cols[:e] = s_src
    eids[:e] = s_eid

    counts = np.bincount(s_dst, minlength=num_nodes).astype(np.int64)
    indptr = np.zeros(num_nodes + 1, dtype=np.int32)
    np.cumsum(counts, out=indptr[1:])

    return _make_csr_with_host(indptr, rows, cols, eids, int(num_nodes), e)


def _make_csr_with_host(indptr, rows, cols, eids, num_nodes: int, num_edges: int) -> CSR:
    """CSR whose leaves are HOST numpy arrays.

    Deliberate: graph structure is a compile-time constant of jitted
    programs. Numpy leaves embed directly into the lowered module and XLA
    uploads them host->device once per executable; device-array leaves
    would be pulled device->host at every lowering ("_value" in jax's MLIR
    constant handler) — a transfer that costs seconds-to-minutes over
    remote-TPU tunnels (docs/PERF.md). Host layout passes read the same
    arrays for free."""
    host = (
        np.ascontiguousarray(indptr),
        np.ascontiguousarray(rows),
        np.ascontiguousarray(cols),
        np.ascontiguousarray(eids),
    )
    csr = CSR(
        indptr=host[0],
        rows=host[1],
        cols=host[2],
        eids=host[3],
        num_nodes=num_nodes,
        num_edges=num_edges,
    )
    object.__setattr__(csr, "_host", host)
    return csr
