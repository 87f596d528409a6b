"""DeltaGraph: device-resident dynamic edge store with batch add/delete.

The TPU-native answer to the reference's PCSR (``dynamic/pcsr/pcsr.cu``:
packed-memory array with binary-search insert + density-bound redistribute)
and GPMA (``dynamic/gpma/gpma.cu``: device-resident sorted 64-bit key array
with per-level batch rebalancing). Those structures exist to apply a batch
of edge insertions/deletions in O(updates) without a full CSR rebuild and
without leaving the device.

On TPU the same capability is expressed functionally with XLA-friendly
primitives — no pointer chasing, no data-dependent shapes:

  * the edge store is a pair of int32 arrays (rows, cols) of static capacity,
    kept sorted by (row, col), padding at the end (sentinel row == n);
  * ``apply_delta(state, add, delete)`` concatenates staged additions and
    deletion *tombstones*, re-sorts (two stable argsorts — the int32-safe
    lexicographic sort), cancels edge/tombstone pairs with one shifted
    compare, and compacts padding to the tail with a final sort;
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
    """Sorted, padded device edge store. ``rows[i] == num_nodes`` marks padding."""

    rows: jnp.ndarray  # (capacity,) int32, sorted by (row, col)
    cols: jnp.ndarray  # (capacity,) int32
    num_edges: jnp.ndarray  # () int32
    num_nodes: int  # static


def _lexsort_rc(rows: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """Stable argsort by (row, col) using two passes (int32-overflow safe)."""
    o1 = jnp.argsort(cols, stable=True)
    return o1[jnp.argsort(rows[o1], stable=True)]


def apply_delta(
    store: EdgeStore,
    add_rows: jnp.ndarray,
    add_cols: jnp.ndarray,
    del_rows: jnp.ndarray,
    del_cols: jnp.ndarray,
) -> EdgeStore:
    """Apply a batch of edge additions and deletions on device.

    ``add_*``/``del_*`` are padded with sentinel ``num_nodes``; their real
    lengths are implied by the sentinels. Deletions must name existing
    edges; additions must be new (same contract as the reference's
    ``edge_update_t``, ``gpma.cu:1064``).

    Deliberately not ``@jax.jit``-decorated: jit would turn the static
    ``num_nodes`` into a traced output, breaking CSR materialization
    downstream. Call it inside your own jitted step (e.g. a ``lax.scan``
    body — see ``benchmarking/dynamic-temporal-tgcn --type delta-scan``).
    """
    n = store.num_nodes
    # Tag: 0 = existing/added edge, 1 = tombstone. After a stable sort by
    # (row, col) an edge and its tombstone land adjacent with the tombstone
    # second (tombstones are concatenated after real edges).
    rows = jnp.concatenate([store.rows, add_rows, del_rows])
    cols = jnp.concatenate([store.cols, add_cols, del_cols])
    tomb = jnp.concatenate(
        [
            jnp.zeros(store.rows.shape[0] + add_rows.shape[0], jnp.bool_),
            jnp.ones(del_rows.shape[0], jnp.bool_),
        ]
    )
    order = _lexsort_rc(rows, cols)
    rows, cols, tomb = rows[order], cols[order], tomb[order]

    # Cancel pairs: an edge is dead if the next slot is a tombstone with the
    # same key; the tombstone itself is always dead.
    nxt_tomb = jnp.concatenate([tomb[1:], jnp.zeros((1,), jnp.bool_)])
    same_key = jnp.concatenate(
        [(rows[1:] == rows[:-1]) & (cols[1:] == cols[:-1]), jnp.zeros((1,), jnp.bool_)]
    )
    dead = tomb | (nxt_tomb & same_key & ~tomb)
    rows = jnp.where(dead, n, rows)
    cols = jnp.where(dead, n, cols)

    # Compact: one more lexicographic sort pushes sentinels to the tail,
    # then truncate back to the store capacity.
    order = _lexsort_rc(rows, cols)
    rows, cols = rows[order], cols[order]
    capacity = store.rows.shape[0]
    rows, cols = rows[:capacity], cols[:capacity]

    num_edges = jnp.sum((rows < n).astype(jnp.int32))
    return EdgeStore(rows=rows, cols=cols, num_edges=num_edges, num_nodes=n)


def _apply_delta_np(
    store: EdgeStore,
    add_rows: np.ndarray,
    add_cols: np.ndarray,
    del_rows: np.ndarray,
    del_cols: np.ndarray,
) -> EdgeStore:
    """Numpy mirror of ``apply_delta`` (same semantics, host execution)."""
    n = store.num_nodes
    rows = np.concatenate([np.asarray(store.rows), add_rows, del_rows])
    cols = np.concatenate([np.asarray(store.cols), add_cols, del_cols])
    tomb = np.concatenate(
        [
            np.zeros(len(store.rows) + len(add_rows), bool),
            np.ones(len(del_rows), bool),
        ]
    )
    order = np.lexsort((tomb, cols, rows))  # stable; tombstones after edges
    rows, cols, tomb = rows[order], cols[order], tomb[order]
    nxt_tomb = np.concatenate([tomb[1:], [False]])
    same_key = np.concatenate(
        [(rows[1:] == rows[:-1]) & (cols[1:] == cols[:-1]), [False]]
    )
    dead = tomb | (nxt_tomb & same_key & ~tomb)
    rows = np.where(dead, n, rows).astype(np.int32)
    cols = np.where(dead, n, cols).astype(np.int32)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    capacity = len(store.rows)
    rows, cols = rows[:capacity], cols[:capacity]
    return EdgeStore(
        rows=rows,
        cols=cols,
        num_edges=np.int32(np.sum(rows < n)),
        num_nodes=n,
    )


def edge_store_to_csr(store: EdgeStore) -> CSR:
    """Materialize a CSR view: rebuild indptr and relabel eids 0..E-1.

    The relabelling matches the reference's ``label_edges``
    (``gpma.cu:1121-1163``): edge ids are positional in sorted order, so
    per-snapshot edge data is indexed by sorted position.
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
    """

    def __init__(
        self,
        edge_lists: Sequence[Sequence[Tuple[int, int]]],
        capacity: Optional[int] = None,
        pad_multiple: int = 8,
    ) -> None:
        super().__init__(edge_lists)
        n = self._num_nodes
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

        # Snapshot materialization runs the SAME delta-replay algorithm in
        # numpy on host: snapshot CSRs become closed-over constants of
        # jitted programs, and host leaves embed without the device->host
        # pull that device arrays would pay per lowering (docs/PERF.md).
        # The jittable device path (``apply_delta``) remains the API for
        # fusing structure updates into compiled steps.
        self._snapshots: List[EdgeStore] = []
        state = EdgeStore(
            rows=np.full((capacity,), n, np.int32),
            cols=np.full((capacity,), n, np.int32),
            num_edges=np.int32(0),
            num_nodes=n,
        )
        staged_add = np.asarray(self._staged_add)
        staged_del = np.asarray(self._staged_del)
        for t in range(self._num_timestamps):
            state = _apply_delta_np(
                state,
                staged_add[t, :, 1],  # row = dst
                staged_add[t, :, 0],  # col = src
                staged_del[t, :, 1],
                staged_del[t, :, 0],
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

    def stacked(self) -> CSR:
        """All snapshots as one CSR pytree with a leading (T,) axis."""
        csrs = [self.get_graph(t) for t in range(self._num_timestamps)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *csrs)

    def staged_deltas(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Device-staged deltas: ((T, A, 2) additions, (T, D, 2) deletions).

        Each row is (src, dst); padding rows carry the sentinel
        ``num_nodes``. Feed these to ``apply_delta`` inside a ``lax.scan``
        to mutate the structure *within* the compiled step — the GPMA
        ``edge_update_t`` capability (``gpma.cu:1064``) without leaving the
        XLA program.
        """
        return self._staged_add, self._staged_del

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
            )
        return self._snapshots[timestamp]
