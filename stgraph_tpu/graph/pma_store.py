"""PMA-style chunked edge store: O(delta) in-place updates with slack.

The merge-based ``apply_delta`` (``graph/delta_graph.py``) touches the full
capacity every timestep — correct, but linear in cap even for a 100-edge
delta. This module is the actual Packed-Memory-Array insight of the
reference's PCSR (``dynamic/pcsr/pcsr.cu``: slack kept IN PLACE, tombstone
without global compaction, amortized redistribution) and GPMA
(``dynamic/gpma/gpma.cu``: density-balanced segments), expressed with
static shapes and functional updates:

  * capacity is split into C chunks of S slots; each chunk holds a sorted
    run with sentinel padding at its tail, and chunks are globally ordered
    (every key in chunk i < every key in chunk i+1). Sentinels BETWEEN
    chunks are the slack;
  * ``apply_delta_pma`` routes the (sorted) delta batch to its chunks via
    a binary search over the C chunk-minimum keys, then merges ONLY the
    affected chunks — a vmapped chunk-local version of the same
    merge/cancel/compact algorithm. Per-step cost is O(A·S + d·log) with
    A <= min(d, C) affected chunks: **independent of capacity**;
  * when a chunk overflows (or a chunk attracts more deltas than its
    workspace), one ``lax.cond`` branch runs a global redistribute — the
    PMA rebalance, amortized exactly like PCSR's ``redistribute``
    (``pcsr.cu:491``): compact everything alive, spread it evenly at ~50%
    density. Both branches have static shapes; only one executes.

Consumers tolerate interspersed sentinels: ``flatten()`` exposes (C·S,)
rows/cols/weights whose padding rows carry ``num_nodes``, exactly the
masked-edge contract of ``ops.segment`` and the jnp SpMM path — so the
store drops into the same in-scan replay the flat EdgeStore uses. (The
positional rowmask kernels require gap-free CSR order; materialize via
``to_edge_store`` for those.)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PMAStore", "pma_init", "apply_delta_pma", "pma_from_edges"]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class PMAStore:
    """Chunked sorted edge store. Keys are (row, col); sentinel row == n.

    ``num_nodes`` is pytree AUX DATA (static): it sizes kernel shapes, so
    it must stay a Python int through ``lax.scan`` carries (same design as
    ``graph.csr.CSR``).
    """

    rows: jnp.ndarray  # (C, S) int32, per-chunk sorted, tail sentinels
    cols: jnp.ndarray  # (C, S) int32
    counts: jnp.ndarray  # (C,) int32 live entries per chunk
    num_edges: jnp.ndarray  # () int32
    num_nodes: int = field(metadata={"static": True})
    weights: Optional[jnp.ndarray] = None  # (C, S) f32 or None

    def tree_flatten(self):
        children = (
            self.rows, self.cols, self.counts, self.num_edges, self.weights
        )
        return children, (self.num_nodes,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        rows, cols, counts, num_edges, weights = children
        return cls(
            rows=rows,
            cols=cols,
            counts=counts,
            num_edges=num_edges,
            num_nodes=aux[0],
            weights=weights,
        )

    @property
    def capacity(self) -> int:
        return self.rows.shape[0] * self.rows.shape[1]

    def flatten(self):
        """(C·S,) rows/cols[/weights] with interspersed sentinel padding."""
        w = None if self.weights is None else self.weights.reshape(-1)
        return self.rows.reshape(-1), self.cols.reshape(-1), w


def pma_init(
    num_nodes: int, num_chunks: int, chunk_size: int, weighted: bool = False
) -> PMAStore:
    n = num_nodes
    shape = (num_chunks, chunk_size)
    return PMAStore(
        rows=jnp.full(shape, n, jnp.int32),
        cols=jnp.full(shape, n, jnp.int32),
        counts=jnp.zeros((num_chunks,), jnp.int32),
        num_edges=jnp.int32(0),
        num_nodes=n,
        weights=jnp.zeros(shape, jnp.float32) if weighted else None,
    )


def _key_le(ar, ac, br, bc):
    return (ar < br) | ((ar == br) & (ac <= bc))


def _searchsorted_chunk(ar, ac, qr, qc):
    """Right-bisect (qr, qc) into the sorted (ar, ac) 1-D chunk."""
    length = ar.shape[0]
    steps = int(length).bit_length() + 1
    lo = jnp.zeros(qr.shape, jnp.int32)
    hi = jnp.full(qr.shape, length, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        active = lo < hi
        mid = (lo + hi) // 2
        midc = jnp.minimum(mid, length - 1)
        le = _key_le(ar[midc], ac[midc], qr, qc)
        lo = jnp.where(active & le, mid + 1, lo)
        hi = jnp.where(active & ~le, mid, hi)
        return lo, hi

    lo, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def _lexsort_rck(rows, cols, kind):
    o = jnp.argsort(kind, stable=True)
    o = o[jnp.argsort(cols[o], stable=True)]
    return o[jnp.argsort(rows[o], stable=True)]


def _merge_chunk(
    crows, ccols, cw, drows, dcols, dkind, dw, dmask, n, weighted
):
    """Merge one (S,) sorted chunk with its (Dc,) masked sorted deltas.

    Same algorithm as the flat ``apply_delta`` at chunk scale: bisect
    merge positions, cancel (store-entry, tombstone) pairs, compact.
    Returns (rows, cols, w, count, overflow) with shapes (S,)/() — the
    chunk keeps its slot count; ``overflow`` flags a live count > S.
    """
    s_len = crows.shape[0]
    dc = drows.shape[0]
    big = jnp.int32(n)
    # Masked-out delta slots become sentinels (sort high, cancel nothing).
    drows = jnp.where(dmask, drows, big)
    dcols = jnp.where(dmask, dcols, big)

    p = _searchsorted_chunk(crows, ccols, drows, dcols)
    q = p + jnp.arange(dc, dtype=jnp.int32)
    L = s_len + dc
    ind = jnp.zeros((L + 1,), jnp.int32).at[jnp.minimum(q + 1, L)].add(1)
    t = jnp.cumsum(ind)[:L]
    tc = jnp.minimum(t, dc - 1)
    i = jnp.arange(L, dtype=jnp.int32)
    is_delta = q[tc] == i
    sidx = jnp.minimum(jnp.maximum(i - t, 0), s_len - 1)
    m_rows = jnp.where(is_delta, drows[tc], crows[sidx])
    m_cols = jnp.where(is_delta, dcols[tc], ccols[sidx])
    if weighted:
        m_w = jnp.where(is_delta, dw[tc], cw[sidx])

    real_tomb = dmask & (dkind == 0) & (drows < n)
    tomb_pos = jnp.where(real_tomb, q, L)
    prev_pos = jnp.maximum(tomb_pos - 1, 0)
    partner_ok = real_tomb & (
        (m_rows[prev_pos] == drows) & (m_cols[prev_pos] == dcols)
    )
    cancel_pos = jnp.where(partner_ok, prev_pos, L)
    dpos = jnp.sort(jnp.concatenate([tomb_pos, cancel_pos]))
    adj = dpos - jnp.arange(2 * dc, dtype=jnp.int32)
    ind2 = (
        jnp.zeros((s_len + 1,), jnp.int32)
        .at[jnp.clip(adj, 0, s_len)]
        .add(jnp.where(dpos < L, 1, 0))
    )
    shift = jnp.cumsum(ind2)[:s_len]
    sel = jnp.minimum(jnp.arange(s_len, dtype=jnp.int32) + shift, L - 1)
    rows = m_rows[sel]
    cols = m_cols[sel]
    pad = rows >= n
    rows = jnp.where(pad, n, rows)
    cols = jnp.where(pad, n, cols)
    count = jnp.sum((rows < n).astype(jnp.int32))
    # A live entry compacted past slot S-1 would be lost: the merged list's
    # live length is (previous live) + adds - cancelled; overflow when the
    # (S)th output would still have been live.
    live_total = (
        jnp.sum((crows < n).astype(jnp.int32))
        + jnp.sum((dmask & (dkind == 1) & (drows < n)).astype(jnp.int32))
        - jnp.sum(jnp.where(cancel_pos < L, 1, 0))
        - jnp.sum(jnp.where(tomb_pos < L, 1, 0))
    )
    overflow = live_total > s_len
    w_out = jnp.where(pad, 0.0, m_w[sel]) if weighted else None
    return rows, cols, w_out, count, overflow


def _redistribute(rows_f, cols_f, w_f, n, C, S, weighted):
    """Compact every live entry of the flat (C·S,) arrays (they are
    globally sorted once sentinels are dropped) and spread them evenly at
    ~50% chunk density — the PMA rebalance (``pcsr.cu:491``)."""
    cap = rows_f.shape[0]
    alive = rows_f < n
    rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
    total = jnp.sum(alive.astype(jnp.int32))
    # Target fill per chunk: ceil(total / C), at least 1, at most S.
    fill = jnp.clip((total + C - 1) // jnp.int32(C), 1, S)
    tgt_chunk = rank // fill
    tgt_slot = rank - tgt_chunk * fill
    dst = tgt_chunk * S + tgt_slot
    dst = jnp.where(alive, dst, cap)  # OOB -> dropped by scatter
    out_r = jnp.full((cap + 1,), n, jnp.int32).at[dst].set(rows_f, mode="drop")
    out_c = jnp.full((cap + 1,), n, jnp.int32).at[dst].set(cols_f, mode="drop")
    rows2 = out_r[:cap].reshape(C, S)
    cols2 = out_c[:cap].reshape(C, S)
    counts = jnp.sum((rows2 < n).astype(jnp.int32), axis=1)
    w2 = None
    if weighted:
        out_w = (
            jnp.zeros((cap + 1,), jnp.float32).at[dst].set(w_f, mode="drop")
        )
        w2 = out_w[:cap].reshape(C, S)
    return rows2, cols2, w2, counts, total


def apply_delta_pma(
    store: PMAStore,
    add_rows: jnp.ndarray,
    add_cols: jnp.ndarray,
    del_rows: jnp.ndarray,
    del_cols: jnp.ndarray,
    add_weights: Optional[jnp.ndarray] = None,
) -> PMAStore:
    """Batch add/delete with chunk-local merges; O(min(d, C)·S) fast path.

    Contract matches ``delta_graph.apply_delta`` (and the reference's
    ``edge_update_t``, ``gpma.cu:1064``): deletions name existing edges;
    an addition is new or paired with a same-key deletion (weight update).
    Jittable; call inside ``lax.scan`` for in-step structure mutation.
    """
    n = store.num_nodes
    C, S = store.rows.shape
    weighted = store.weights is not None
    dd, da = del_rows.shape[0], add_rows.shape[0]
    d = dd + da

    drows = jnp.concatenate([del_rows, add_rows]).astype(jnp.int32)
    dcols = jnp.concatenate([del_cols, add_cols]).astype(jnp.int32)
    dkind = jnp.concatenate(
        [jnp.zeros((dd,), jnp.int32), jnp.ones((da,), jnp.int32)]
    )
    o = _lexsort_rck(drows, dcols, dkind)
    drows, dcols, dkind = drows[o], dcols[o], dkind[o]
    if weighted:
        aw = (
            jnp.ones((da,), jnp.float32)
            if add_weights is None
            else add_weights.reshape(-1).astype(jnp.float32)
        )
        dw = jnp.concatenate([jnp.zeros((dd,), jnp.float32), aw])[o]
    else:
        dw = jnp.zeros((d,), jnp.float32)
    real = drows < n

    # Route each delta to its chunk: the last chunk whose minimum key is
    # <= the delta key (clamped to 0). An EMPTY chunk (possible after
    # deletions) must not break the routing array's sortedness, so it
    # inherits the next nonempty chunk's minimum (suffix-min): a key below
    # that range then routes to the previous nonempty chunk, and a key at
    # or above it prefers the later, nonempty chunk (right-bisect picks
    # the last of an equal run). Chunk ids are nondecreasing because
    # deltas are sorted and the minima are the global order's cut points.
    lo_r0 = jnp.where(store.counts > 0, store.rows[:, 0], jnp.int32(n))
    lo_c0 = jnp.where(store.counts > 0, store.cols[:, 0], jnp.int32(n))

    def _sufmin(carry, rc):
        r, c = rc
        cr, cc = carry
        take = _key_le(r, c, cr, cc)
        nr = jnp.where(take, r, cr)
        nc = jnp.where(take, c, cc)
        return (nr, nc), (nr, nc)

    _, (lo_r, lo_c) = jax.lax.scan(
        _sufmin,
        (jnp.int32(n), jnp.int32(n)),
        (lo_r0, lo_c0),
        reverse=True,
    )
    pos = _searchsorted_chunk(lo_r, lo_c, drows, dcols)
    cid = jnp.clip(pos - 1, 0, C - 1)
    cid = jnp.where(real, cid, jnp.int32(C))  # padding routes nowhere

    # Affected chunk slots: first occurrences of each cid, compacted to a
    # static A = min(d, C) workspace.
    A = int(min(d, C))
    first = jnp.concatenate(
        [jnp.array([True]), cid[1:] != cid[:-1]]
    ) & real
    a_rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_aff = jnp.sum(first.astype(jnp.int32))
    slot_cid = (
        jnp.full((A,), C, jnp.int32)
        .at[jnp.where(first, jnp.minimum(a_rank, A - 1), A)]
        .set(cid, mode="drop")
    )
    starts = (
        jnp.zeros((A,), jnp.int32)
        .at[jnp.where(first, jnp.minimum(a_rank, A - 1), A)]
        .set(jnp.arange(d, dtype=jnp.int32), mode="drop")
    )
    ends = jnp.concatenate([starts[1:], jnp.array([0], jnp.int32)])
    aff_idx = jnp.arange(A, dtype=jnp.int32)
    ends = jnp.where(aff_idx + 1 < n_aff, ends, jnp.int32(d))
    ends = jnp.where(aff_idx < n_aff, ends, starts)  # empty slots

    # Per-chunk delta workspace: Dc slots; a hotter chunk trips the
    # rebuild branch (checked below).
    Dc = int(min(d, S))
    per = ends - starts
    too_hot = jnp.any(per > Dc)

    def gather_deltas(st):
        sl = jax.lax.dynamic_slice(
            jnp.pad(drows, (0, Dc)), (st,), (Dc,)
        )
        sc = jax.lax.dynamic_slice(jnp.pad(dcols, (0, Dc)), (st,), (Dc,))
        sk = jax.lax.dynamic_slice(jnp.pad(dkind, (0, Dc)), (st,), (Dc,))
        sw = jax.lax.dynamic_slice(jnp.pad(dw, (0, Dc)), (st,), (Dc,))
        return sl, sc, sk, sw

    def merge_one(slot_id, st, en):
        cidc = jnp.minimum(slot_id, C - 1)
        sl, sc, sk, sw = gather_deltas(st)
        dmask = jnp.arange(Dc, dtype=jnp.int32) < (en - st)
        cw = store.weights[cidc] if weighted else jnp.zeros((S,), jnp.float32)
        return _merge_chunk(
            store.rows[cidc], store.cols[cidc], cw,
            sl, sc, sk, sw, dmask, n, weighted,
        )

    m_rows, m_cols, m_w, m_counts, m_over = jax.vmap(merge_one)(
        slot_cid, starts, ends
    )
    active = slot_cid < C
    overflow = jnp.any(m_over & active) | too_hot

    def fast(_):
        tgt = jnp.where(active, slot_cid, jnp.int32(C))
        rows2 = store.rows.at[tgt].set(m_rows, mode="drop")
        cols2 = store.cols.at[tgt].set(m_cols, mode="drop")
        counts2 = store.counts.at[tgt].set(m_counts, mode="drop")
        w2 = (
            store.weights.at[tgt].set(m_w, mode="drop") if weighted else None
        )
        total = jnp.sum(counts2)
        return rows2, cols2, w2, counts2, total

    def rebuild(_):
        # Global path: flatten (globally sorted minus sentinels), apply the
        # flat merge, respread evenly. O(cap) — the amortized PMA
        # rebalance.
        from stgraph_tpu.graph.delta_graph import EdgeStore, apply_delta

        rows_f, cols_f, w_f = store.flatten()
        if w_f is None:
            w_f = jnp.zeros_like(rows_f, jnp.float32)
        # Compact to a sorted flat store first (apply_delta's bisect needs
        # tail-padded sorted arrays, not interspersed sentinels).
        r2, c2, w2c, _, total0 = _redistribute(
            rows_f, cols_f, w_f, n, 1, C * S, True
        )
        flat = EdgeStore(
            rows=r2.reshape(-1),
            cols=c2.reshape(-1),
            num_edges=total0,
            num_nodes=n,
            weights=w2c.reshape(-1) if weighted else None,
        )
        out = apply_delta(
            store=flat,
            add_rows=add_rows,
            add_cols=add_cols,
            del_rows=del_rows,
            del_cols=del_cols,
            add_weights=add_weights,
        )
        ow = out.weights if weighted else jnp.zeros_like(out.rows, jnp.float32)
        rows2, cols2, w2, counts2, total = _redistribute(
            out.rows, out.cols, ow, n, C, S, weighted
        )
        return rows2, cols2, w2, counts2, total

    if weighted:
        rows2, cols2, w2, counts2, total = jax.lax.cond(
            overflow, rebuild, fast, None
        )
    else:
        # Avoid a None leaf through cond: run without weights.
        def fast_nw(_):
            r, c, _, cnt, tot = fast(None)
            return r, c, cnt, tot

        def rebuild_nw(_):
            r, c, _, cnt, tot = rebuild(None)
            return r, c, cnt, tot

        rows2, cols2, counts2, total = jax.lax.cond(
            overflow, rebuild_nw, fast_nw, None
        )
        w2 = None
    return PMAStore(
        rows=rows2,
        cols=cols2,
        counts=counts2,
        num_edges=total,
        num_nodes=n,
        weights=w2,
    )


def pma_from_edges(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    num_chunks: int,
    chunk_size: int,
    weights: Optional[np.ndarray] = None,
) -> PMAStore:
    """Host-build a PMAStore at ~50% density from an edge list."""
    n = num_nodes
    C, S = num_chunks, chunk_size
    rows = np.asarray(dst, np.int64)
    cols = np.asarray(src, np.int64)
    order = np.argsort(rows << 32 | cols, kind="stable")
    rows, cols = rows[order].astype(np.int32), cols[order].astype(np.int32)
    w = None if weights is None else np.asarray(weights, np.float32)[order]
    e = len(rows)
    if e > C * S:
        raise ValueError("capacity too small")
    fill = min(max((e + C - 1) // C, 1), S)
    out_r = np.full((C, S), n, np.int32)
    out_c = np.full((C, S), n, np.int32)
    out_w = np.zeros((C, S), np.float32) if w is not None else None
    idx = np.arange(e)
    ch, sl = idx // fill, idx % fill
    out_r[ch, sl] = rows
    out_c[ch, sl] = cols
    if out_w is not None:
        out_w[ch, sl] = w
    counts = np.bincount(ch, minlength=C).astype(np.int32)
    return PMAStore(
        rows=jnp.asarray(out_r),
        cols=jnp.asarray(out_c),
        counts=jnp.asarray(counts),
        num_edges=jnp.int32(e),
        num_nodes=n,
        weights=None if out_w is None else jnp.asarray(out_w),
    )
