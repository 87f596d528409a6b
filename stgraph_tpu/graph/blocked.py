"""BlockedCSR: chunk-aligned CSR layout for the Pallas SpMM kernels.

Mosaic requires DMA slice offsets to respect tiling alignment, and the
efficient DMA unit is a few hundred bytes — so the kernel wants every row
block's edge range to start on an ``EDGE_CHUNK`` boundary. This host-side
layout pass pads each 128-row block's edge list up to a multiple of the
chunk size with sentinel edges (which the selection-matrix kernel ignores
for free) and records the permutation back to CSR edge order so runtime
per-edge data (attention coefficients, edge weights) can be carried along.

This plays the role of the reference's host-side CSR construction in C++
(``stgraph/graph/static/csr.cu``): the one-time, per-graph data layout work
that makes the device kernels simple and fast. The degree-sorted node_ids
of the reference (``csr.cu:143-154``) are unnecessary — block imbalance
costs only proportional chunk iterations, not warp divergence.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from stgraph_tpu.graph.csr import CSR

__all__ = ["BlockedCSR", "build_blocked", "EDGE_CHUNK", "ROW_BLOCK"]

ROW_BLOCK = 128  # destination rows per block; matches MXU tile
EDGE_CHUNK = 1024  # edges per aligned chunk; Mosaic tiles 1-D arrays at 1024


class BlockedCSR(NamedTuple):
    """Chunk-aligned edge layout. All arrays are device-resident.

    Attributes:
      offsets: (NB,) int32 — blocked-array offset of each row block's edges;
        always a multiple of EDGE_CHUNK.
      counts:  (NB,) int32 — padded edge count per block (multiple of
        EDGE_CHUNK; includes sentinel padding).
      dst:     (CB,) int32 — destination ids; ``num_nodes`` on padding.
      cols:    (CB,) int32 — source ids; ``num_nodes`` on padding.
      perm:    (CB,) int32 — blocked position → CSR edge position
        (``csr.capacity`` on padding, used with a clamped gather).
      eids:    (CB,) int32 — blocked position → *user* edge id (the CSR's
        eids pulled through ``perm``); lets forward- and transpose-blocked
        layouts exchange per-edge values.
      num_nodes / num_rows_padded / csr_capacity: static ints.
    """

    offsets: jnp.ndarray
    counts: jnp.ndarray
    dst: jnp.ndarray
    cols: jnp.ndarray
    perm: jnp.ndarray
    eids: jnp.ndarray
    num_nodes: int
    num_rows_padded: int
    csr_capacity: int

    @property
    def num_blocks(self) -> int:
        return self.num_rows_padded // ROW_BLOCK

    @property
    def capacity(self) -> int:
        return self.dst.shape[0]


def build_blocked(csr: CSR, edge_chunk: int = EDGE_CHUNK) -> BlockedCSR:
    """Host-side layout pass (requires a concrete, non-traced CSR)."""
    n = csr.num_nodes
    indptr, rows, cols, csr_eids = csr.host_arrays()
    e = int(csr.num_edges)
    cap = csr.capacity

    from stgraph_tpu import native

    built = native.build_blocked_arrays(
        indptr, rows, cols, csr_eids, n, cap, ROW_BLOCK, edge_chunk
    )
    if built is not None:
        offsets, counts, bdst, bcols, bperm, beids = built
        n_pad = max(((n + ROW_BLOCK - 1) // ROW_BLOCK) * ROW_BLOCK, ROW_BLOCK)
        return BlockedCSR(
            offsets=offsets.astype(np.int32),
            counts=counts.astype(np.int32),
            dst=bdst,
            cols=bcols,
            perm=bperm,
            eids=beids,
            num_nodes=n,
            num_rows_padded=n_pad,
            csr_capacity=cap,
        )

    n_pad = max(((n + ROW_BLOCK - 1) // ROW_BLOCK) * ROW_BLOCK, ROW_BLOCK)
    nb = n_pad // ROW_BLOCK

    starts = np.zeros(nb, dtype=np.int64)
    raw_counts = np.zeros(nb, dtype=np.int64)
    for b in range(nb):
        lo = min(b * ROW_BLOCK, n)
        hi = min((b + 1) * ROW_BLOCK, n)
        starts[b] = indptr[lo]
        raw_counts[b] = indptr[hi] - indptr[lo]

    pad_counts = np.maximum(
        ((raw_counts + edge_chunk - 1) // edge_chunk) * edge_chunk, 0
    )
    offsets = np.zeros(nb, dtype=np.int64)
    np.cumsum(pad_counts[:-1], out=offsets[1:])
    total = int(offsets[-1] + pad_counts[-1]) if nb else 0
    total = max(total, edge_chunk)

    eids = csr_eids
    bdst = np.full(total, n, dtype=np.int32)
    bcols = np.full(total, n, dtype=np.int32)
    bperm = np.full(total, cap, dtype=np.int32)
    beids = np.full(total, cap, dtype=np.int32)
    for b in range(nb):
        c = int(raw_counts[b])
        if c == 0:
            continue
        s, o = int(starts[b]), int(offsets[b])
        bdst[o : o + c] = rows[s : s + c]
        bcols[o : o + c] = cols[s : s + c]
        bperm[o : o + c] = np.arange(s, s + c, dtype=np.int32)
        beids[o : o + c] = eids[s : s + c]

    # Host numpy leaves on purpose — see csr._make_csr_with_host.
    return BlockedCSR(
        offsets=offsets.astype(np.int32),
        counts=pad_counts.astype(np.int32),
        dst=bdst,
        cols=bcols,
        perm=bperm,
        eids=beids,
        num_nodes=n,
        num_rows_padded=n_pad,
        csr_capacity=cap,
    )
