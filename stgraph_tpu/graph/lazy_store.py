"""Lazy dynamic edge store: O(delta) updates via tombstones + signed logs.

The measured reality behind this module (docs/PERF.md round-5 dynamic
section): every capacity-wide pass costs ~10-30 ms at wiki-talk scale
(2M slots) no matter how clever the merge — the flat merge-based
``apply_delta`` costs ~153 ms/step and the chunked PMA path is WORSE for
uniform deltas (every chunk is touched). The reference's GPMA takes
batched updates at device speed by touching only affected leaves and
amortizing rebalancing (``gpma.cu:838-912``). This is the TPU-native
equivalent of that amortization, with static shapes:

  * the MAIN store stays sorted by (row, col) with sentinel padding —
    the layout the row-id Pallas kernels consume directly;
  * a DELETION of a main-resident edge is a tombstone: bisect the key
    (O(log cap) vectorized passes over d queries), scatter ``w = 0`` at
    the hit — the kernels read weights, so a zero-weight edge
    contributes nothing while the row-id monotonicity the kernel
    metadata needs is untouched. ``w > 0`` IS the main liveness record:
    no pending-delete log exists (an earlier design kept one for the
    compaction merge; the merge below never looks at it);
  * an ADDITION appends to a TAIL log (one ``dynamic_update_slice``);
    aggregation adds the log contributions with a small masked
    segment-sum (the logs are O(K·d), not O(cap));
  * a DELETION that misses the live main store names a tail-resident
    edge (the ``apply_delta`` contract: deletions name existing edges).
    Rather than searching the tail — the round-4 design bisected EVERY
    tail entry into the sorted delete batch, a measured 35.7 ms/step =
    52% of the whole update at the wiki-talk shape (O(tcap·log d), see
    ``benchmarking/micro/lazy_profile.py``) — the key goes onto an ANTI
    log with implicit weight ``-1``. Aggregation multiplies by signed
    log weights, so the anti entry cancels the tail entry exactly, in
    O(d) per step with NO tail-sized pass. (Anti entries require the
    cancelled weight to be known without a lookup, so this path is
    taken for unweighted stores; weighted stores keep the in-place
    tail-kill pass, whose cost only matters at log sizes no weighted
    workload here reaches.)
  * when a log nears capacity, ONE ``lax.cond`` branch compacts: main
    (dead keys sentineled) + tail + anti are lexsorted together, signed
    weights are segment-summed per equal-key run, and first-of-run
    survivors (net > 0) are rank-scattered to the front — one
    capacity-scale sort, measured FASTER than the gather-based
    sorted-merge alternative on TPU (see ``compact``'s docstring).

Per-step cost: one sorted lookup over d queries + two O(d) scatters +
two O(d) appends — no capacity- or log-wide traffic at all outside the
amortized compaction.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stgraph_tpu.graph.delta_graph import _searchsorted_rc

__all__ = [
    "LazyStore",
    "lazy_from_edges",
    "apply_delta_lazy",
    "compact",
]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class LazyStore:
    """Sorted main store + tail/anti logs. Sentinel row == num_nodes.

    ``w`` doubles as the liveness mask: live edges carry their weight
    (1.0 when the graph is unweighted), tombstoned and padding slots
    carry 0. Anti-log entries carry an implicit weight of -1 (the log
    stores only keys). ``num_edges`` counts live edges (main + logs).
    """

    rows: jnp.ndarray  # (cap,) int32 sorted (row, col), sentinel-padded
    cols: jnp.ndarray  # (cap,)
    w: jnp.ndarray  # (cap,) f32; 0 == dead
    tail_rows: jnp.ndarray  # (tcap,) int32, sentinel holes
    tail_cols: jnp.ndarray  # (tcap,)
    tail_w: jnp.ndarray  # (tcap,) f32
    tail_count: jnp.ndarray  # () int32 — slots used (incl. holes)
    anti_rows: jnp.ndarray  # (tcap,) int32 — implicit weight -1 keys
    anti_cols: jnp.ndarray  # (tcap,)
    anti_count: jnp.ndarray  # () int32
    num_edges: jnp.ndarray  # () int32 live edges
    num_nodes: int = field(metadata={"static": True})
    weighted: bool = field(metadata={"static": True})

    def tree_flatten(self):
        children = (
            self.rows, self.cols, self.w,
            self.tail_rows, self.tail_cols, self.tail_w, self.tail_count,
            self.anti_rows, self.anti_cols, self.anti_count,
            self.num_edges,
        )
        return children, (self.num_nodes, self.weighted)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, num_nodes=aux[0], weighted=aux[1])

    @property
    def capacity(self) -> int:
        return self.rows.shape[0]

    @property
    def tail_capacity(self) -> int:
        return self.tail_rows.shape[0]

    def anti_w(self) -> jnp.ndarray:
        """(tcap,) signed weights of the anti log (-1 per live key)."""
        return jnp.where(self.anti_rows < self.num_nodes, -1.0, 0.0)


def _empty_logs(t: int, n: int):
    return dict(
        tail_rows=jnp.full((t,), n, jnp.int32),
        tail_cols=jnp.full((t,), n, jnp.int32),
        tail_w=jnp.zeros((t,), jnp.float32),
        tail_count=jnp.int32(0),
        anti_rows=jnp.full((t,), n, jnp.int32),
        anti_cols=jnp.full((t,), n, jnp.int32),
        anti_count=jnp.int32(0),
    )


def lazy_from_edges(
    src,
    dst,
    num_nodes: int,
    capacity: int,
    tail_capacity: int,
    weights: Optional[np.ndarray] = None,
) -> LazyStore:
    """Host-build: rows = dst (aggregation key), sorted by (row, col)."""
    n = num_nodes
    rows = np.asarray(dst, np.int64)
    cols = np.asarray(src, np.int64)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    e = len(rows)
    if e > capacity:
        raise ValueError("capacity too small")
    r = np.full(capacity, n, np.int32)
    c = np.full(capacity, n, np.int32)
    w = np.zeros(capacity, np.float32)
    r[:e] = rows
    c[:e] = cols
    w[:e] = 1.0 if weights is None else np.asarray(weights, np.float32)[order]
    return LazyStore(
        rows=jnp.asarray(r),
        cols=jnp.asarray(c),
        w=jnp.asarray(w),
        **_empty_logs(tail_capacity, n),
        num_edges=jnp.int32(e),
        num_nodes=n,
        weighted=weights is not None,
    )


def _lexsort_rc(rows, cols):
    o = jnp.argsort(cols, stable=True)
    return o[jnp.argsort(rows[o], stable=True)]


def _sorted_lookup(s_rows, s_cols, q_rows, q_cols, n):
    """(found, index) of each query key in the SORTED haystack."""
    p = _searchsorted_rc(s_rows, s_cols, q_rows, q_cols)
    cand = jnp.maximum(p - 1, 0)
    eq = (
        (s_rows[cand] == q_rows)
        & (s_cols[cand] == q_cols)
        & (q_rows < n)
    )
    return eq, cand


def compact(store: LazyStore) -> LazyStore:
    """Merge the logs into the main store (the amortized O(cap) branch).

    ONE unified sort: concatenate main (dead slots — ``w == 0`` — get
    their key set to the sentinel), tail, and anti entries; lexsort by
    (row, col); segment-sum the signed weights over each equal-key run
    (a live main edge contributes its weight, a tail add +w, an anti
    delete -1 — an added-then-deleted edge nets to 0 and vanishes, a
    re-add of a tombstoned key nets to the new weight); rank-scatter
    first-of-run survivors (net > 0) to the front. The result is
    exactly sorted, duplicate-free, sentinel-padded, all weights live.

    Why brute-force sort and not a clever merge: a three-phase
    pre-combine + live-compact + disjoint-sorted-merge (binary search +
    cumsum rank-select) was built and measured at 605 ms at the
    wiki-talk shape — the 21-pass bisect over capacity (183 ms) and the
    6-gather merge assembly (375 ms) are gather-bound, and TPU random
    gathers lose to bitonic sort networks at this scale (the round-2
    finding, docs/PERF.md "Dynamic updates at wiki-talk scale"). The
    unified sort is also ~60 lines simpler.
    """
    n = store.num_nodes
    t = store.tail_capacity
    cap = store.capacity
    L = cap + 2 * t

    dead = store.w <= 0
    r_all = jnp.concatenate(
        [
            jnp.where(dead, n, store.rows),
            store.tail_rows,
            store.anti_rows,
        ]
    )
    c_all = jnp.concatenate(
        [
            jnp.where(dead, n, store.cols),
            store.tail_cols,
            store.anti_cols,
        ]
    )
    w_all = jnp.concatenate([store.w, store.tail_w, store.anti_w()])
    o = _lexsort_rc(r_all, c_all)
    r, c, w = r_all[o], c_all[o], w_all[o]
    first = jnp.concatenate(
        [
            jnp.ones((1,), jnp.bool_),
            (r[1:] != r[:-1]) | (c[1:] != c[:-1]),
        ]
    )
    rid = jnp.cumsum(first.astype(jnp.int32)) - 1
    net = jax.ops.segment_sum(w, rid, num_segments=L)[rid]
    keep = first & (r < n) & (net > 0)
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    # Scatter-to-rank keeps sorted order; out-of-bounds drops non-kept
    # entries (and, on a contract-violating overfull store, the excess).
    pos = jnp.where(keep, rank, L)
    rows = jnp.full((cap,), n, jnp.int32).at[pos].set(r, mode="drop")
    cols = jnp.full((cap,), n, jnp.int32).at[pos].set(c, mode="drop")
    wout = jnp.zeros((cap,), jnp.float32).at[pos].set(net, mode="drop")
    return LazyStore(
        rows=rows,
        cols=cols,
        w=wout,
        **_empty_logs(t, n),
        num_edges=jnp.minimum(jnp.sum(keep.astype(jnp.int32)), cap),
        num_nodes=n,
        weighted=store.weighted,
    )


def apply_delta_lazy(
    store: LazyStore,
    add_rows: jnp.ndarray,
    add_cols: jnp.ndarray,
    del_rows: jnp.ndarray,
    del_cols: jnp.ndarray,
    add_weights: Optional[jnp.ndarray] = None,
) -> LazyStore:
    """O(delta) update. Same contract as ``delta_graph.apply_delta``:
    sentinel-padded batches; deletions name existing edges; an addition
    is new or paired with a same-key deletion (weight update).

    ``add_weights`` must be strictly positive: ``w == 0`` is the
    tombstone/liveness convention (a zero-weight add is indistinguishable
    from a dead slot and is silently dropped from degree counts and
    ``num_edges``). Batch sizes must not exceed ``tail_capacity``
    (checked at trace time — shapes are static)."""
    n = store.num_nodes
    cap = store.capacity
    t = store.tail_capacity
    d_del = del_rows.shape[0]
    d_add = add_rows.shape[0]
    if d_del > t or d_add > t:
        raise ValueError(
            f"delta batch ({d_add} adds / {d_del} dels) exceeds "
            f"tail_capacity={t}; the logs cannot hold one batch"
        )
    # Amortized compaction FIRST, gated on this step's actual batch
    # sizes: if any log cannot absorb the incoming batch, merge the
    # logs into main now. Running the cond before any append makes the
    # overflow guard exact (appending first and checking a proxy could
    # silently truncate a first oversized batch — advisor round 4).
    need = (store.tail_count + d_add > t) | (store.anti_count + d_del > t)
    store = jax.lax.cond(need, compact, lambda s: s, store)
    del_rows = del_rows.astype(jnp.int32)
    del_cols = del_cols.astype(jnp.int32)
    add_rows = add_rows.astype(jnp.int32)
    add_cols = add_cols.astype(jnp.int32)
    aw = (
        jnp.where(add_rows < n, 1.0, 0.0)
        if add_weights is None
        else add_weights.reshape(-1).astype(jnp.float32)
    )

    # --- deletions --------------------------------------------------------
    if store.weighted:
        # Weighted stores: kill matching LIVE tail entries in place (an
        # anti entry would need the cancelled weight, which deletions
        # don't carry). Direction matters for cost: sorting the TAIL
        # every step is an O(tcap log tcap) device sort; instead sort
        # the (small) delete batch once and bisect every tail entry into
        # it — O(tcap·log d) per step, fine at weighted-workload scales.
        qo = _lexsort_rc(del_rows, del_cols)
        sq_r, sq_c = del_rows[qo], del_cols[qo]
        hit_sorted_q, t_cand = _sorted_lookup(
            sq_r, sq_c, store.tail_rows, store.tail_cols, n
        )
        kill_mask = hit_sorted_q  # per tail entry: a delete names it
        tail_rows = jnp.where(kill_mask, n, store.tail_rows)
        tail_cols = jnp.where(kill_mask, n, store.tail_cols)
        tail_w = jnp.where(kill_mask, 0.0, store.tail_w)
        # Which deletes were satisfied by a tail kill (per original slot).
        found_sorted = (
            jnp.zeros((d_del,), jnp.bool_)
            .at[jnp.where(kill_mask, t_cand, d_del)]
            .max(True, mode="drop")
        )
        t_found = jnp.zeros((d_del,), jnp.bool_).at[qo].set(found_sorted)
        m_found, m_cand = _sorted_lookup(
            store.rows, store.cols, del_rows, del_cols, n
        )
        main_del = m_found & ~t_found
        anti_rows, anti_cols = store.anti_rows, store.anti_cols
        anti_count = store.anti_count
    else:
        # Unweighted: deletes that miss the LIVE main store name a
        # tail-resident edge (the contract); push the key onto the anti
        # log (implicit weight -1) — aggregation's signed segment-sum
        # cancels the tail entry exactly. O(d) per step; the round-4
        # tail-kill pass this replaces was O(tcap·log d) and cost 52%
        # of the whole update step (lazy_profile.py, docs/PERF.md r5).
        tail_rows, tail_cols, tail_w = (
            store.tail_rows, store.tail_cols, store.tail_w
        )
        m_found, m_cand = _sorted_lookup(
            store.rows, store.cols, del_rows, del_cols, n
        )
        # Liveness check matters: a tombstoned-then-re-added key is
        # still PRESENT in main (w=0) but its live copy is in the tail —
        # that delete must go anti.
        main_del = m_found & (store.w[m_cand] > 0)
        anti_valid = (del_rows < n) & ~main_del
        anti_rows = jax.lax.dynamic_update_slice(
            jnp.concatenate(
                [store.anti_rows, jnp.full((d_del,), n, jnp.int32)]
            ),
            jnp.where(anti_valid, del_rows, n),
            (store.anti_count,),
        )[:t]
        anti_cols = jax.lax.dynamic_update_slice(
            jnp.concatenate(
                [store.anti_cols, jnp.full((d_del,), n, jnp.int32)]
            ),
            jnp.where(anti_valid, del_cols, n),
            (store.anti_count,),
        )[:t]
        anti_count = store.anti_count + d_del
        t_found = anti_valid  # each anti kills one live log edge

    # Remaining deletions tombstone MAIN (w = 0); ``w > 0`` is the only
    # liveness record the compaction reads — no pending-delete log.
    ts = jnp.where(main_del, m_cand, cap)
    w = store.w.at[ts].set(0.0, mode="drop")

    n_del_live = jnp.sum((t_found | main_del).astype(jnp.int32))
    mid = LazyStore(
        rows=store.rows, cols=store.cols, w=w,
        tail_rows=tail_rows, tail_cols=tail_cols, tail_w=tail_w,
        tail_count=store.tail_count,
        anti_rows=anti_rows, anti_cols=anti_cols, anti_count=anti_count,
        num_edges=store.num_edges - n_del_live,
        num_nodes=n, weighted=store.weighted,
    )

    # --- additions: append the batch to the tail -------------------------
    tail_rows = jax.lax.dynamic_update_slice(
        jnp.concatenate([mid.tail_rows, jnp.full((d_add,), n, jnp.int32)]),
        add_rows,
        (mid.tail_count,),
    )[:t]
    tail_cols = jax.lax.dynamic_update_slice(
        jnp.concatenate([mid.tail_cols, jnp.full((d_add,), n, jnp.int32)]),
        add_cols,
        (mid.tail_count,),
    )[:t]
    tail_w = jax.lax.dynamic_update_slice(
        jnp.concatenate([mid.tail_w, jnp.zeros((d_add,), jnp.float32)]),
        jnp.where(add_rows < n, aw, 0.0),
        (mid.tail_count,),
    )[:t]
    n_add_live = jnp.sum((add_rows < n).astype(jnp.int32))
    return LazyStore(
        rows=mid.rows, cols=mid.cols, w=mid.w,
        tail_rows=tail_rows, tail_cols=tail_cols, tail_w=tail_w,
        tail_count=mid.tail_count + d_add,
        anti_rows=mid.anti_rows, anti_cols=mid.anti_cols,
        anti_count=mid.anti_count,
        num_edges=mid.num_edges + n_add_live,
        num_nodes=n, weighted=mid.weighted,
    )
