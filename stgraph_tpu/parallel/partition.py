"""Edge partitioning for multi-chip execution.

Net-new relative to the reference, which is single-GPU only (SURVEY §2.6:
no distribution layer exists). Strategy per BASELINE.json's north star:
**edge-partition by destination-node range** with boundary-feature halo
exchange:

  * shard ``p`` owns destination rows ``[p·Ns, (p+1)·Ns)`` and *all* edges
    pointing into them — so each shard's aggregation is a completely local
    segment reduction once source features are present (and GAT's segment
    softmax is local too: every destination's full in-neighborhood lives on
    one shard);
  * source features live sharded by the same row ranges; a shard's edges
    whose sources fall outside its range need a **halo**. The halo is
    exchanged as P-1 ``ppermute`` ring steps, one per shard displacement
    ``d``: step d ships, for every shard q, the rows that shard (q+d)%P
    needs from it, padded to the **per-displacement** max K_d — so total
    exchange volume is Σ_d K_d rows instead of the previous single
    all_to_all's (P-1)·K_max (on skewed graphs one hot pair no longer
    inflates every pair's padding);
  * every local edge's source is remapped into the concatenated
    ``[own rows | halo buffer]`` index space at partition time, so the
    device-side kernel is an ordinary SpMM over a slightly wider "node"
    space;
  * per-shard **global edge ids** (``*_gids``) map each local edge slot
    back to the user's edge order, so per-edge data (weights, attention
    logits) can be routed into shard-local CSR order at runtime.

All of this is host-side layout work (numpy), one-time per graph — the
same philosophy as the reference's C++ CSR builder (``csr.cu``).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stgraph_tpu.graph.csr import CSR

__all__ = ["DistGraph", "partition_edges"]


class DistGraph(NamedTuple):
    """Edge-partitioned graph, stacked over shards on the leading axis.

    Attributes:
      local_csr: CSR pytree whose arrays have leading dim P. Rows are
        shard-local destinations in [0, Ns); cols index the concatenated
        [local rows (Ns) | halo buffer (halo_total)] space; ``num_nodes``
        is Ns (so sentinel/edge-mask logic keeps working per shard).
      interior_csr / frontier_csr: the same edges split by source locality —
        interior edges read only local rows (cols in [0, Ns)), frontier
        edges read only the halo buffer (cols re-based into
        [0, halo_total)). The split is what lets the interior aggregation
        overlap the halo exchange (no data dependency on the collective).
      interior_blocked / frontier_blocked: per-shard Pallas blocked layouts
        (dicts of (P, ...) stacked host arrays, padded to a common edge
        capacity), so each shard's aggregation can run the MXU
        selection-matmul kernel instead of an XLA scatter; the static shape
        metadata lives in ``blocked_rows_padded`` (rows per shard after
        128-row padding).
      send_idx_by_d: tuple of P-1 (P, K_d) int32 arrays — ring step d ships
        ``send_idx_by_d[d-1][q]``: q-local rows that shard (q+d)%P needs
        (0-padded; receivers never read padding).
      halo_offsets: (P,) int32 — halo-buffer offset of ring step d's
        received rows (offset 0 unused; entry d = Σ_{d'<d} K_{d'}).
      local_gids / interior_gids / frontier_gids: (P, cap) int32 — global
        USER edge id per local edge slot (sentinel = num_global_edges on
        padding), for routing per-edge data into shard order at runtime.
      num_nodes: global node count (unpadded).
      nodes_per_shard: Ns (padded so P·Ns ≥ num_nodes).
      halo_total: Σ_d K_d (halo buffer rows per shard).
      num_shards: P.
    """

    local_csr: CSR
    interior_csr: CSR
    frontier_csr: CSR
    send_idx_by_d: Tuple[np.ndarray, ...]
    halo_offsets: np.ndarray
    local_gids: np.ndarray
    interior_gids: np.ndarray
    frontier_gids: np.ndarray
    interior_blocked: Optional[Dict[str, np.ndarray]]
    frontier_blocked: Optional[Dict[str, np.ndarray]]
    blocked_rows_padded: int
    interior_rowmask: Optional[Dict[str, np.ndarray]]
    frontier_rowmask: Optional[Dict[str, np.ndarray]]
    local_rowmask: Optional[Dict[str, np.ndarray]]
    local_cap_pad: int
    rowmask_rows_padded: int
    interior_cap_pad: int
    frontier_cap_pad: int
    interior_pos: Optional[np.ndarray]  # (P, cap_int) local slot of each
    frontier_pos: Optional[np.ndarray]  # interior/frontier edge (pad=cap)
    num_nodes: int
    num_global_edges: int
    nodes_per_shard: int
    halo_total: int
    num_shards: int

    @property
    def padded_nodes(self) -> int:
        return self.nodes_per_shard * self.num_shards

    @property
    def comm_rows_per_shard(self) -> int:
        """Halo rows each shard sends per step (= receives): Σ_d K_d."""
        return self.halo_total


def partition_edges(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    num_shards: int,
    pad_multiple: int = 8,
) -> DistGraph:
    """Host-side partitioner: global edge list → DistGraph."""
    src = np.asarray(src, dtype=np.int64).reshape(-1)
    dst = np.asarray(dst, dtype=np.int64).reshape(-1)
    n_edges = len(src)
    p = num_shards
    ns = -(-num_nodes // p)  # ceil
    owner = src // ns  # owner shard of each edge's source

    # Per-shard edge sets (dst ownership) and halo needs.
    shard_edges: List[np.ndarray] = []
    need: List[List[np.ndarray]] = []  # need[pp][q] = global src ids needed
    for pp in range(p):
        mask = (dst // ns) == pp
        shard_edges.append(np.flatnonzero(mask))
        needs_q = []
        for q in range(p):
            if q == pp:
                needs_q.append(np.empty(0, np.int64))
                continue
            sel = mask & (owner == q)
            needs_q.append(np.unique(src[sel]))
        need.append(needs_q)

    # Per-displacement halo sizes: ring step d ships q -> (q+d)%P.
    def _rup(x):
        return max(((x + pad_multiple - 1) // pad_multiple) * pad_multiple,
                   pad_multiple)

    k_by_d = []
    for d in range(1, p):
        k_by_d.append(
            _rup(max((len(need[(q + d) % p][q]) for q in range(p)), default=0))
        )
    # halo_offsets[d] = sum of k_by_d[:d-1] for d >= 1.
    off = 0
    halo_offsets = np.zeros(p, np.int32)
    for d in range(1, p):
        halo_offsets[d] = off
        off += k_by_d[d - 1]
    halo_total = max(off, pad_multiple)

    # send_idx_by_d[d-1][q] = q-local rows that (q+d)%P needs from q.
    send_idx_by_d = []
    for d in range(1, p):
        k_d = k_by_d[d - 1]
        s = np.zeros((p, k_d), np.int32)
        for q in range(p):
            ids = need[(q + d) % p][q]
            s[q, : len(ids)] = ids - q * ns
        send_idx_by_d.append(s)

    # Remap each shard's edge sources into [local | halo] space and build
    # uniformly-padded local CSRs, plus the interior/frontier split that
    # enables compute/communication overlap.
    max_e = max((len(e) for e in shard_edges), default=0)
    cap = max(((max_e + 511) // 512) * 512, 512)
    csrs: List[CSR] = []
    gids_l: List[np.ndarray] = []
    int_csrs: List[CSR] = []
    fro_csrs: List[CSR] = []
    max_int = max_fro = 0
    split: List[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []
    for pp in range(p):
        idx = shard_edges[pp]
        l_dst = dst[idx] - pp * ns
        g_src = src[idx]
        l_src = np.empty_like(g_src)
        local = (g_src // ns) == pp
        l_src[local] = g_src[local] - pp * ns
        # halo position: ns + halo_offsets[d] + rank within need[pp][q],
        # where d = (pp - q) mod P is the ring displacement.
        for q in range(p):
            if q == pp:
                continue
            sel = (~local) & ((g_src // ns) == q)
            if not sel.any():
                continue
            d = (pp - q) % p
            pos = np.searchsorted(need[pp][q], g_src[sel])
            l_src[sel] = ns + halo_offsets[d] + pos
        c, g = _build_local_csr(l_src, l_dst, ns, cap, gids=idx, n_edges=n_edges)
        csrs.append(c)
        gids_l.append(g)
        split.append((l_src, l_dst, local, idx))
        max_int = max(max_int, int(local.sum()))
        max_fro = max(max_fro, int((~local).sum()))

    cap_int = max(((max_int + 511) // 512) * 512, 512)
    cap_fro = max(((max_fro + 511) // 512) * 512, 512)
    gids_i: List[np.ndarray] = []
    gids_f: List[np.ndarray] = []
    for l_src, l_dst, local, idx in split:
        c, g = _build_local_csr(
            l_src[local], l_dst[local], ns, cap_int,
            gids=idx[local], n_edges=n_edges,
        )
        int_csrs.append(c)
        gids_i.append(g)
        # Frontier cols re-based into the (halo_total,) halo buffer space.
        c, g = _build_local_csr(
            l_src[~local] - ns, l_dst[~local], ns, cap_fro,
            gids=idx[~local], n_edges=n_edges,
        )
        fro_csrs.append(c)
        gids_f.append(g)

    def _stack(cs):
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *cs)

    int_blk, rows_padded = _stack_blocked(int_csrs)
    fro_blk, _ = _stack_blocked(fro_csrs)
    int_rm, rm_rows, cap_pad_i = _stack_rowmask(int_csrs)
    fro_rm, _, cap_pad_f = _stack_rowmask(fro_csrs)
    loc_rm, _, cap_pad_l = _stack_rowmask(csrs)
    # Slot maps local->interior/frontier order, for routing per-edge data
    # (weights) without a second user-order gather at runtime.
    gl = np.stack(gids_l)
    inv = np.full((p, n_edges + 1), cap, np.int32)
    for pp in range(p):
        valid = gl[pp] < n_edges
        inv[pp, gl[pp][valid]] = np.flatnonzero(valid).astype(np.int32)
    def _pos(gids_s):
        out = np.empty_like(gids_s)
        for pp in range(p):
            out[pp] = inv[pp, np.minimum(gids_s[pp], n_edges)]
        return out
    int_pos = _pos(np.stack(gids_i))
    fro_pos = _pos(np.stack(gids_f))
    return DistGraph(
        local_csr=_stack(csrs),
        interior_csr=_stack(int_csrs),
        frontier_csr=_stack(fro_csrs),
        send_idx_by_d=tuple(send_idx_by_d),
        halo_offsets=halo_offsets,
        local_gids=np.stack(gids_l),
        interior_gids=np.stack(gids_i),
        frontier_gids=np.stack(gids_f),
        interior_blocked=int_blk,
        frontier_blocked=fro_blk,
        blocked_rows_padded=rows_padded,
        interior_rowmask=int_rm,
        frontier_rowmask=fro_rm,
        local_rowmask=loc_rm,
        local_cap_pad=cap_pad_l,
        rowmask_rows_padded=rm_rows,
        interior_cap_pad=cap_pad_i,
        frontier_cap_pad=cap_pad_f,
        interior_pos=int_pos,
        frontier_pos=fro_pos,
        num_nodes=num_nodes,
        num_global_edges=n_edges,
        nodes_per_shard=ns,
        halo_total=halo_total,
        num_shards=p,
    )


def _stack_blocked(csrs: List[CSR]):
    """Per-shard blocked layouts stacked to a common edge capacity.

    Padding slots carry the row sentinel (>= ns), so the kernel drops them
    like any other sentinel edge; padded chunks simply never run because
    ``counts`` stays at the real per-block values.
    """
    from stgraph_tpu.graph.blocked import build_blocked

    bs = [build_blocked(c) for c in csrs]
    cb = max(b.capacity for b in bs)
    ns = csrs[0].num_nodes

    def pad_edge(a, fill):
        out = np.full((cb,), fill, dtype=a.dtype)
        out[: len(a)] = np.asarray(a)
        return out

    blk = {
        "offsets": np.stack([np.asarray(b.offsets) for b in bs]),
        "counts": np.stack([np.asarray(b.counts) for b in bs]),
        "dst": np.stack([pad_edge(b.dst, ns) for b in bs]),
        "cols": np.stack([pad_edge(b.cols, 0) for b in bs]),
    }
    return blk, bs[0].num_rows_padded


def _stack_rowmask(csrs: List[CSR]):
    """Per-shard position-masked (rowmask) layouts, stacked.

    The rowmask kernel needs only four small arrays per shard (chunk
    starts, chunk counts, per-row chunk-local ranges); all shards share
    ``num_rows_padded`` (same ns) and are padded to a common EDGE_CHUNK-
    aligned capacity so ``spmm_rowmask_traced`` sees uniform shapes
    inside ``shard_map``. Sliced cols/gathered arrays are padded by the
    consumer to ``cap_pad``.
    """
    from stgraph_tpu.graph.blocked import EDGE_CHUNK, ROW_BLOCK
    from stgraph_tpu.ops.segment_pallas import row_block_meta

    metas = [row_block_meta(c) for c in csrs]
    cap_pad = max(m.cap_pad for m in metas)
    rm = {
        "astart": np.stack([m.astart for m in metas]),
        "nchunks": np.stack([m.nchunks for m in metas]),
        "bs": np.stack(
            [m.bs.reshape(m.num_blocks, ROW_BLOCK, 1) for m in metas]
        ),
        "be": np.stack(
            [m.be.reshape(m.num_blocks, ROW_BLOCK, 1) for m in metas]
        ),
    }
    return rm, metas[0].num_rows_padded, cap_pad


def _build_local_csr(
    l_src: np.ndarray,
    l_dst: np.ndarray,
    ns: int,
    cap: int,
    gids: Optional[np.ndarray] = None,
    n_edges: int = 0,
) -> Tuple[CSR, Optional[np.ndarray]]:
    """Local CSR: rows ∈ [0, ns), cols in the widened [local|halo] space.
    Sentinel for padding rows is ``ns`` (matching ``CSR`` conventions).
    Returns ``(csr, global_ids)`` with global_ids[slot] = the user edge id
    at each local slot (sentinel ``n_edges`` on padding)."""
    e = len(l_src)
    order = np.lexsort((l_src, l_dst))
    rows = np.full(cap, ns, np.int32)
    cols = np.full(cap, 0, np.int32)  # padded cols point at row 0: harmless,
    # the row sentinel already drops these edges at the segment reduction.
    eids = np.full(cap, cap, np.int32)
    rows[:e] = l_dst[order]
    cols[:e] = l_src[order]
    eids[:e] = np.arange(e, dtype=np.int32)[order]
    g_out = None
    if gids is not None:
        g_out = np.full(cap, n_edges, np.int32)
        g_out[:e] = np.asarray(gids, np.int64)[order].astype(np.int32)
    counts = np.bincount(l_dst, minlength=ns)
    indptr = np.zeros(ns + 1, np.int32)
    np.cumsum(counts, out=indptr[1:])
    # Host numpy leaves: DistGraph arrays embed as constants of jitted
    # steps (see graph.csr._make_csr_with_host).
    csr = CSR(
        indptr=indptr,
        rows=rows,
        cols=cols,
        eids=eids,
        num_nodes=ns,
        num_edges=e,
    )
    return csr, g_out
