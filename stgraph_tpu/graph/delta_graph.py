"""DeltaGraph: device-resident dynamic edge store with batch add/delete.

The TPU-native answer to the reference's PCSR (``dynamic/pcsr/pcsr.cu``:
packed-memory array with binary-search insert + density-bound redistribute)
and GPMA (``dynamic/gpma/gpma.cu``: device-resident sorted 64-bit key array
with per-level batch rebalancing). Those structures exist to apply a batch
of edge insertions/deletions in O(updates) without a full CSR rebuild and
without leaving the device.

On TPU the same capability is expressed functionally with XLA-friendly
primitives — no pointer chasing, no data-dependent shapes:

  * the edge store is (rows, cols, weights) arrays of static capacity, kept
    sorted by (row, col), padding at the end (sentinel row == n);
  * ``apply_delta(state, ...)`` **merges** the sorted store with the sorted
    delta batch — a small sort over the delta only, then binary-search merge
    positions, a shifted-compare cancellation of edge/tombstone pairs, and a
    rank-select compaction. Everything is gathers + cumsum: no
    capacity-wide sort and no scatter, so per-timestep cost is
    O(cap + delta·log cap) data movement instead of O(cap·log² cap) sorting
    networks — the PCSR/GPMA O(updates) property, idiomatically;
  * per-edge **weights ride the store**: the reference relabels eids each
    timestamp so per-snapshot edge data stays addressable
    (``pcsr.cu:748`` / ``gpma.cu:1121-1163`` ``label_edges``); here the
    store IS sorted (dst, src) order — identical to CSR edge order — so a
    snapshot's CSR-order weights are simply ``store.weights``. A weight
    change on a persisting edge is expressed as delete+add of the same key
    in one batch (the merge keeps per-key order store → tombstone → add, so
    the re-add survives with the new weight);
  * ``indptr`` is rebuilt with a segment-count + cumsum — the same
    count-sort the reference uses to transpose (``gpma.cu:1165-1231``).

Everything is jittable, so per-timestamp updates fuse into the training
step. Like GPMA's ``init_graph_updates`` (``gpma.cu:984``), all timestamps'
deltas are staged on device up front, padded to the largest delta.
"""

from __future__ import annotations


from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stgraph_tpu.graph.csr import CSR, round_up
from stgraph_tpu.graph.dynamic_graph import DynamicGraph

__all__ = ["DeltaGraph", "EdgeStore", "apply_delta", "edge_store_to_csr"]


class EdgeStore(NamedTuple):
    """Sorted, padded device edge store. ``rows[i] == num_nodes`` marks padding.

    ``weights`` is optional (None for unweighted graphs); when present it is
    a (capacity,) f32 array aligned with rows/cols — i.e. already in CSR
    edge order (the store is sorted by (row, col)).
    """

    rows: jnp.ndarray  # (capacity,) int32, sorted by (row, col)
    cols: jnp.ndarray  # (capacity,) int32
    num_edges: jnp.ndarray  # () int32
    num_nodes: int  # static
    weights: Optional[jnp.ndarray] = None  # (capacity,) f32 or None


def _searchsorted_rc(
    ar: jnp.ndarray,
    ac: jnp.ndarray,
    qr: jnp.ndarray,
    qc: jnp.ndarray,
) -> jnp.ndarray:
    """Right-bisect positions of (qr, qc) keys in the (ar, ac)-sorted store.

    Compound lexicographic keys can't be packed into int32 (n > 46k
    overflows) and int64 needs x64 mode, so this is a hand-rolled vectorized
    binary search: ``ceil(log2(len))`` passes of gathers.
    """
    length = ar.shape[0]
    steps = max(int(length).bit_length(), 1)
    lo = jnp.zeros(qr.shape, jnp.int32)
    hi = jnp.full(qr.shape, length, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        active = lo < hi
        mid = (lo + hi) // 2
        midc = jnp.minimum(mid, length - 1)
        mr = ar[midc]
        mc = ac[midc]
        le = (mr < qr) | ((mr == qr) & (mc <= qc))  # store key <= query
        lo = jnp.where(active & le, mid + 1, lo)
        hi = jnp.where(active & ~le, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps + 1, body, (lo, hi))
    return lo


def _lexsort_rck(rows, cols, kind):
    """Stable argsort by (row, col, kind) — three small stable passes."""
    o = jnp.argsort(kind, stable=True)
    o = o[jnp.argsort(cols[o], stable=True)]
    return o[jnp.argsort(rows[o], stable=True)]


def apply_delta(
    store: EdgeStore,
    add_rows: jnp.ndarray,
    add_cols: jnp.ndarray,
    del_rows: jnp.ndarray,
    del_cols: jnp.ndarray,
    add_weights: Optional[jnp.ndarray] = None,
) -> EdgeStore:
    """Apply a batch of edge additions and deletions on device.

    ``add_*``/``del_*`` are padded with sentinel ``num_nodes``; their real
    lengths are implied by the sentinels. Deletions must name existing
    edges; additions must be new **or** paired with a same-key deletion in
    the same batch (a weight update) — same contract as the reference's
    ``edge_update_t`` (``gpma.cu:1064``).

    Cost: one sort over the delta batch (small), binary-search merge
    positions, and two rank-select passes over capacity — **no
    capacity-wide sort** (the previous implementation's three full argsorts
    made every timestep O(cap·log² cap) on TPU's bitonic networks).

    Deliberately not ``@jax.jit``-decorated: jit would turn the static
    ``num_nodes`` into a traced output, breaking CSR materialization
    downstream. Call it inside your own jitted step (e.g. a ``lax.scan``
    body — see ``benchmarking/dynamic-temporal-tgcn --type delta-scan``).
    """
    n = store.num_nodes
    cap = store.rows.shape[0]
    dd = del_rows.shape[0]
    da = add_rows.shape[0]
    d = dd + da
    weighted = store.weights is not None

    # Delta batch, deletions first (kind 0) so a same-key (store, del, add)
    # triple keeps that relative order after the stable sort: the tombstone
    # cancels the store entry and the re-add survives (weight updates).
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

    # Merge positions: store entries precede equal-key delta entries
    # (right-bisect), so q = p + j is the output slot of delta entry j and
    # is strictly increasing.
    p = _searchsorted_rc(store.rows, store.cols, drows, dcols)
    q = p + jnp.arange(d, dtype=jnp.int32)

    # Rank computations run as SMALL scatter + cumsum, never as binary
    # search over the capacity: a 21-pass vectorized bisect over a 2M-slot
    # array is ~4x SLOWER on TPU than even full bitonic re-sorts (random
    # 4B gathers per pass); a 2M cumsum is a cheap sequential sweep.
    L = cap + d
    i = jnp.arange(L, dtype=jnp.int32)
    # t[i] = |{q < i}| — delta entries placed before slot i.
    ind = jnp.zeros((L + 1,), jnp.int32).at[jnp.minimum(q + 1, L)].add(1)
    t = jnp.cumsum(ind)[:L]
    tc = jnp.minimum(t, d - 1)
    is_delta = q[tc] == i  # gather from the SMALL (d,) table
    sidx = jnp.minimum(jnp.maximum(i - t, 0), cap - 1)
    m_rows = jnp.where(is_delta, drows[tc], store.rows[sidx])
    m_cols = jnp.where(is_delta, dcols[tc], store.cols[sidx])
    if weighted:
        m_w = jnp.where(is_delta, dw[tc], store.weights[sidx])

    # Dead slots come from the DELTA side only (small arrays): every real
    # tombstone at merged position q_j, plus its cancelled partner at
    # q_j - 1 (the store entry it deletes — store sorts before the delta
    # for equal keys). Sentinel-keyed padding sorts to the tail and is not
    # "scattered dead". Contract (same as the reference's edge_update_t):
    # deletions name existing edges, at most one add and one delete per
    # key per batch.
    real_tomb = (dkind == 0) & (drows < n)
    tomb_pos = jnp.where(real_tomb, q, L)
    prev_pos = jnp.maximum(tomb_pos - 1, 0)
    partner_ok = real_tomb & (
        (m_rows[prev_pos] == drows) & (m_cols[prev_pos] == dcols)
    )
    cancel_pos = jnp.where(partner_ok, prev_pos, L)
    dpos = jnp.sort(jnp.concatenate([tomb_pos, cancel_pos]))  # (2d,) small

    # Compaction shift: final slot j takes merged[j + |{k: dpos_k - k <= j}|]
    # (each scattered dead slot before the read point pulls everything one
    # left). adj is nondecreasing because dpos is strictly increasing over
    # its real prefix.
    adj = dpos - jnp.arange(2 * d, dtype=jnp.int32)
    ind2 = (
        jnp.zeros((cap + 1,), jnp.int32)
        .at[jnp.clip(adj, 0, cap)]
        .add(jnp.where(dpos < L, 1, 0))
    )
    shift = jnp.cumsum(ind2)[:cap]
    sel = jnp.minimum(jnp.arange(cap, dtype=jnp.int32) + shift, L - 1)
    rows = m_rows[sel]
    cols = m_cols[sel]
    pad = rows >= n
    rows = jnp.where(pad, n, rows)
    cols = jnp.where(pad, n, cols)
    total = jnp.sum((rows < n).astype(jnp.int32))
    if weighted:
        w = jnp.where(pad, 0.0, m_w[sel])
    return EdgeStore(
        rows=rows,
        cols=cols,
        num_edges=total,
        num_nodes=n,
        weights=w if weighted else None,
    )


def _apply_delta_np(
    store: EdgeStore,
    add_rows: np.ndarray,
    add_cols: np.ndarray,
    del_rows: np.ndarray,
    del_cols: np.ndarray,
    add_weights: Optional[np.ndarray] = None,
) -> EdgeStore:
    """Numpy mirror of ``apply_delta`` (same semantics, host execution).

    Uses one stable int64-key argsort (host numpy has int64; the device path
    avoids it because jnp defaults to 32-bit mode).
    """
    n = store.num_nodes
    weighted = store.weights is not None
    rows = np.concatenate([np.asarray(store.rows), del_rows, add_rows])
    cols = np.concatenate([np.asarray(store.cols), del_cols, add_cols])
    tomb = np.concatenate(
        [
            np.zeros(len(store.rows), bool),
            np.ones(len(del_rows), bool),
            np.zeros(len(add_rows), bool),
        ]
    )
    if weighted:
        aw = (
            np.ones(len(add_rows), np.float32)
            if add_weights is None
            else np.asarray(add_weights, np.float32).reshape(-1)
        )
        w = np.concatenate(
            [np.asarray(store.weights), np.zeros(len(del_rows), np.float32), aw]
        )
    keys = rows.astype(np.int64) << 32 | cols.astype(np.int64)
    order = np.argsort(keys, kind="stable")  # store, del, add per key
    rows, cols, tomb = rows[order], cols[order], tomb[order]
    if weighted:
        w = w[order]
    nxt_tomb = np.concatenate([tomb[1:], [False]])
    same_key = np.concatenate(
        [(rows[1:] == rows[:-1]) & (cols[1:] == cols[:-1]), [False]]
    )
    dead = tomb | (nxt_tomb & same_key & ~tomb)
    alive = ~dead & (rows < n)
    capacity = len(store.rows)
    a_rows = rows[alive]
    a_cols = cols[alive]
    out_rows = np.full(capacity, n, np.int32)
    out_cols = np.full(capacity, n, np.int32)
    e = min(len(a_rows), capacity)
    out_rows[:e] = a_rows[:e]
    out_cols[:e] = a_cols[:e]
    out_w = None
    if weighted:
        out_w = np.zeros(capacity, np.float32)
        out_w[:e] = w[alive][:e]
    return EdgeStore(
        rows=out_rows,
        cols=out_cols,
        num_edges=np.int32(e),
        num_nodes=n,
        weights=out_w,
    )


def edge_store_to_csr(store: EdgeStore) -> CSR:
    """Materialize a CSR view: rebuild indptr and relabel eids 0..E-1.

    The relabelling matches the reference's ``label_edges``
    (``gpma.cu:1121-1163``): edge ids are positional in sorted order, so
    per-snapshot edge data is indexed by sorted position — and because the
    store is (row, col)-sorted, ``store.weights`` IS the CSR-order weight
    array for the snapshot.
    """
    # num_nodes rides through jitted apply_delta as an array leaf; CSR
    # requires it static. Materialization happens eagerly, so concretize.
    n = int(store.num_nodes)
    capacity = store.rows.shape[0]
    if not isinstance(store.rows, jax.core.Tracer) and isinstance(
        store.rows, np.ndarray
    ):
        # Host store -> host CSR (embeds into jitted programs with no
        # device round-trips).
        rows = np.asarray(store.rows)
        valid = rows < n
        counts = np.bincount(rows[valid], minlength=n)
        indptr = np.zeros(n + 1, np.int32)
        np.cumsum(counts, out=indptr[1:])
        eids = np.where(
            valid, np.arange(capacity, dtype=np.int32), np.int32(capacity)
        )
        return CSR(
            indptr=indptr,
            rows=rows,
            cols=np.asarray(store.cols),
            eids=eids,
            num_nodes=n,
            num_edges=int(store.num_edges),
        )
    valid = store.rows < n
    counts = jax.ops.segment_sum(
        jnp.where(valid, 1, 0), store.rows, num_segments=n
    )
    indptr = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    eids = jnp.where(
        valid,
        jnp.arange(capacity, dtype=jnp.int32),
        jnp.int32(capacity),
    )
    return CSR(
        indptr=indptr,
        rows=store.rows,
        cols=store.cols,
        eids=eids,
        num_nodes=n,
        num_edges=store.num_edges,
    )


class DeltaGraph(DynamicGraph):
    """Dynamic graph driven by on-device delta replay.

    Host-side it stages all timestamps' add/delete lists (padded to the
    largest delta, mirroring GPMA's ``init_graph_updates``); device-side it
    replays them through ``apply_delta``. Snapshots are cached per timestamp
    on first access, like the reference PCSR wrapper's per-timestamp
    deepcopy cache (``pcsr_graph.py:77-96``) — but immutable, so forward and
    backward share them.

    ``edge_weight_lists`` (per-timestamp, aligned with ``edge_lists``)
    makes the store weighted: weight changes on persisting edges become
    delete+add pairs in the staged deltas, so every snapshot carries its
    own CSR-order weights — the capability the reference implements by
    relabelling eids per timestamp (``pcsr.cu:748``, ``gpma.cu:1121-1163``).
    """

    def __init__(
        self,
        edge_lists: Sequence[Sequence[Tuple[int, int]]],
        edge_weight_lists: Optional[Sequence[Sequence[float]]] = None,
        capacity: Optional[int] = None,
        pad_multiple: int = 8,
    ) -> None:
        super().__init__(edge_lists, edge_weight_lists)
        n = self._num_nodes
        weighted = edge_weight_lists is not None
        self._weighted = weighted
        if capacity is None:
            capacity = round_up(max(self.max_num_edges, 1), pad_multiple)
        self._capacity = capacity

        max_add = max((len(d["add"]) for d in self._deltas), default=0)
        max_del = max((len(d["delete"]) for d in self._deltas), default=0)
        max_add = round_up(max(max_add, 1), pad_multiple)
        max_del = round_up(max(max_del, 1), pad_multiple)

        def _pad(arr: np.ndarray, cap: int) -> np.ndarray:
            out = np.full((cap, 2), n, dtype=np.int32)
            out[: len(arr)] = arr
            return out

        self._staged_add = jnp.asarray(
            np.stack([_pad(d["add"], max_add) for d in self._deltas])
        )
        self._staged_del = jnp.asarray(
            np.stack([_pad(d["delete"], max_del) for d in self._deltas])
        )
        if weighted:
            aw = np.zeros((self._num_timestamps, max_add), np.float32)
            for t, dlt in enumerate(self._deltas):
                aw[t, : len(dlt["add_w"])] = dlt["add_w"]
            self._staged_add_w = jnp.asarray(aw)
        else:
            self._staged_add_w = None

        # Snapshot materialization runs the SAME delta-replay algorithm in
        # numpy on host: snapshot CSRs become closed-over constants of
        # jitted programs, and host leaves embed without the device->host
        # pull that device arrays would pay per lowering (docs/PERF.md).
        # The jittable device path (``apply_delta``) remains the API for
        # fusing structure updates into compiled steps.
        self._snapshots: List[EdgeStore] = []
        state = self.snapshot_store(-1)
        staged_add = np.asarray(self._staged_add)
        staged_del = np.asarray(self._staged_del)
        staged_add_w = (
            np.asarray(self._staged_add_w) if weighted else None
        )
        for t in range(self._num_timestamps):
            state = _apply_delta_np(
                state,
                staged_add[t, :, 1],  # row = dst
                staged_add[t, :, 0],  # col = src
                staged_del[t, :, 1],
                staged_del[t, :, 0],
                add_weights=None if not weighted else staged_add_w[t],
            )
            self._snapshots.append(state)
        self._csr_cache: Dict[int, CSR] = {}
        self._bwd_cache: Dict[int, CSR] = {}

    def graph_type(self) -> str:
        return "delta"

    def get_graph(self, timestamp: int) -> CSR:
        if timestamp not in self._csr_cache:
            # Snapshots are concrete; build the cached CSR eagerly even when
            # first accessed inside a jit trace (otherwise traced arrays
            # would leak into the cache and escape the trace).
            with jax.ensure_compile_time_eval():
                self._csr_cache[timestamp] = edge_store_to_csr(
                    self._snapshots[timestamp]
                )
        return self._csr_cache[timestamp]

    def get_backward_graph(self, timestamp: int) -> CSR:
        if timestamp not in self._bwd_cache:
            with jax.ensure_compile_time_eval():
                self._bwd_cache[timestamp] = self.get_graph(timestamp).transpose()
        return self._bwd_cache[timestamp]

    def get_edge_weights(self, timestamp: int) -> Optional[np.ndarray]:
        """Snapshot weights in CSR edge order (= store order), or None.

        The snapshot CSR's eids are positional (identity), so these weights
        satisfy BOTH the direct-kernel (CSR order) and the nn-layer e_feats
        (user order, permuted via eids) contracts.
        """
        if not self._weighted:
            return None
        return self._snapshots[timestamp].weights.reshape(-1, 1)

    def stacked(self) -> CSR:
        """All snapshots as one CSR pytree with a leading (T,) axis."""
        csrs = [self.get_graph(t) for t in range(self._num_timestamps)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *csrs)

    def stacked_weights(self) -> Optional[jnp.ndarray]:
        """(T, capacity, 1) CSR-order snapshot weights, or None."""
        if not self._weighted:
            return None
        return jnp.asarray(
            np.stack([s.weights.reshape(-1, 1) for s in self._snapshots])
        )

    def staged_deltas(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Device-staged deltas: ((T, A, 2) additions, (T, D, 2) deletions).

        Each row is (src, dst); padding rows carry the sentinel
        ``num_nodes``. Feed these to ``apply_delta`` inside a ``lax.scan``
        to mutate the structure *within* the compiled step — the GPMA
        ``edge_update_t`` capability (``gpma.cu:1064``) without leaving the
        XLA program.
        """
        return self._staged_add, self._staged_del

    def staged_add_weights(self) -> Optional[jnp.ndarray]:
        """(T, A) f32 weights of the staged additions, or None."""
        return self._staged_add_w

    def snapshot_store(self, timestamp: int) -> EdgeStore:
        """The (host numpy) edge store after replaying deltas 0..timestamp.

        ``timestamp = -1`` returns the empty initial store — the natural
        ``lax.scan`` carry seed for in-step delta replay.
        """
        if timestamp < 0:
            n = self._num_nodes
            return EdgeStore(
                rows=np.full((self._capacity,), n, np.int32),
                cols=np.full((self._capacity,), n, np.int32),
                num_edges=np.int32(0),
                num_nodes=n,
                weights=(
                    np.zeros((self._capacity,), np.float32)
                    if self._weighted
                    else None
                ),
            )
        return self._snapshots[timestamp]
