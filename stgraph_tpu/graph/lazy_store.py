"""Lazy dynamic edge store: O(delta) updates via tombstones + tail log.

The measured reality behind this module (docs/PERF.md round-4 dynamic
section): every capacity-wide pass costs ~10-30 ms at wiki-talk scale
(2M slots) no matter how clever the merge — the flat merge-based
``apply_delta`` costs ~153 ms/step and the chunked PMA path is WORSE for
uniform deltas (every chunk is touched). The reference's GPMA takes
batched updates at device speed by touching only affected leaves and
amortizing rebalancing (``gpma.cu:838-912``). This is the TPU-native
equivalent of that amortization, with static shapes:

  * the MAIN store stays sorted by (row, col) with sentinel padding —
    the layout the row-id Pallas kernels consume directly;
  * a DELETION is a tombstone: bisect the key (O(log cap) vectorized
    passes over d queries), scatter ``w = 0`` at the hit — the kernels
    read weights, so a zero-weight edge contributes nothing while the
    row-id monotonicity the kernel metadata needs is untouched. The
    (row, col) key is pushed onto a pending-deletes log so the next
    compaction can drop the slot;
  * an ADDITION appends to a TAIL log (one ``dynamic_update_slice``);
    aggregation adds the tail's contribution with a small masked
    segment-sum (the tail is O(K·d), not O(cap));
  * deleting an edge that still lives in the tail kills the tail entry
    in place (sorted lookup over the tail) instead of logging a pending
    delete — so the pending log only ever names MAIN edges, which keeps
    the compaction a single ``apply_delta`` call;
  * when either log nears capacity, ONE ``lax.cond`` branch runs the
    existing merge-based ``apply_delta`` (main + tail as adds + pending
    as deletes) — the amortized O(cap) rebalance, paid every
    ~tail_capacity/d steps instead of every step.

Per-step cost: two sorted lookups over d queries + three O(d) scatters
+ two O(d) appends — no capacity-wide traffic at all outside the
amortized compaction.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stgraph_tpu.graph.delta_graph import (
    EdgeStore,
    _searchsorted_rc,
    apply_delta,
)

__all__ = [
    "LazyStore",
    "lazy_from_edges",
    "apply_delta_lazy",
    "compact",
]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class LazyStore:
    """Sorted main store + tail/pending logs. Sentinel row == num_nodes.

    ``w`` doubles as the liveness mask: live edges carry their weight
    (1.0 when the graph is unweighted), tombstoned and padding slots
    carry 0. ``num_edges`` counts live edges (main + tail).
    """

    rows: jnp.ndarray  # (cap,) int32 sorted (row, col), sentinel-padded
    cols: jnp.ndarray  # (cap,)
    w: jnp.ndarray  # (cap,) f32; 0 == dead
    tail_rows: jnp.ndarray  # (tcap,) int32, sentinel holes
    tail_cols: jnp.ndarray  # (tcap,)
    tail_w: jnp.ndarray  # (tcap,) f32
    tail_count: jnp.ndarray  # () int32 — slots used (incl. holes)
    pd_rows: jnp.ndarray  # (tcap,) pending deletes against MAIN
    pd_cols: jnp.ndarray
    pd_count: jnp.ndarray  # () int32
    num_edges: jnp.ndarray  # () int32 live edges
    num_nodes: int = field(metadata={"static": True})
    weighted: bool = field(metadata={"static": True})

    def tree_flatten(self):
        children = (
            self.rows, self.cols, self.w,
            self.tail_rows, self.tail_cols, self.tail_w, self.tail_count,
            self.pd_rows, self.pd_cols, self.pd_count, self.num_edges,
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
    t = tail_capacity
    return LazyStore(
        rows=jnp.asarray(r),
        cols=jnp.asarray(c),
        w=jnp.asarray(w),
        tail_rows=jnp.full((t,), n, jnp.int32),
        tail_cols=jnp.full((t,), n, jnp.int32),
        tail_w=jnp.zeros((t,), jnp.float32),
        tail_count=jnp.int32(0),
        pd_rows=jnp.full((t,), n, jnp.int32),
        pd_cols=jnp.full((t,), n, jnp.int32),
        pd_count=jnp.int32(0),
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
    """Merge tail + pending logs into the main store (one apply_delta)."""
    n = store.num_nodes
    t = store.tail_capacity
    flat = EdgeStore(
        rows=store.rows,
        cols=store.cols,
        num_edges=jnp.sum((store.w > 0).astype(jnp.int32)),
        num_nodes=n,
        weights=store.w,
    )
    # Tombstoned slots must not survive the merge by key identity: the
    # pending log names each one exactly once, so apply_delta's
    # delete-cancel pass drops them.
    out = apply_delta(
        flat,
        add_rows=store.tail_rows,
        add_cols=store.tail_cols,
        del_rows=store.pd_rows,
        del_cols=store.pd_cols,
        add_weights=store.tail_w,
    )
    return LazyStore(
        rows=out.rows,
        cols=out.cols,
        w=out.weights,
        tail_rows=jnp.full((t,), n, jnp.int32),
        tail_cols=jnp.full((t,), n, jnp.int32),
        tail_w=jnp.zeros((t,), jnp.float32),
        tail_count=jnp.int32(0),
        pd_rows=jnp.full((t,), n, jnp.int32),
        pd_cols=jnp.full((t,), n, jnp.int32),
        pd_count=jnp.int32(0),
        num_edges=out.num_edges,
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
    tail_kill: bool = True,
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
    # sizes: if either log cannot absorb the incoming batch, merge both
    # logs into main now. Running the cond before any append makes the
    # overflow guard exact (appending first and checking a proxy could
    # silently truncate a first oversized batch — advisor round 4).
    need = (store.tail_count + d_add > t) | (store.pd_count + d_del > t)
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
    # 1. kill matching LIVE tail entries in place. Direction matters for
    #    cost: sorting the TAIL every step is an O(tcap log tcap) device
    #    sort; instead sort the (small) delete batch once and bisect every
    #    tail entry into it — O(d log d) + log(d) vector passes over tcap.
    #    (``tail_kill=False`` is an ablation knob for lazy_profile.py: it
    #    skips this block, which is only correct when no delete ever names
    #    a tail-resident edge.)
    if tail_kill:
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
    else:
        tail_rows = store.tail_rows
        tail_cols = store.tail_cols
        tail_w = store.tail_w
        t_found = jnp.zeros((d_del,), jnp.bool_)

    # 2. remaining deletions tombstone MAIN (w = 0) and go on the pending
    #    log for the next compaction.
    m_found, m_cand = _sorted_lookup(
        store.rows, store.cols, del_rows, del_cols, n
    )
    main_del = m_found & ~t_found
    ts = jnp.where(main_del, m_cand, cap)
    w = store.w.at[ts].set(0.0, mode="drop")
    pd_add_rows = jnp.where(main_del, del_rows, n)
    pd_add_cols = jnp.where(main_del, del_cols, n)
    pd_rows = jax.lax.dynamic_update_slice(
        jnp.concatenate([store.pd_rows, jnp.full((d_del,), n, jnp.int32)]),
        pd_add_rows,
        (store.pd_count,),
    )[:t]
    pd_cols = jax.lax.dynamic_update_slice(
        jnp.concatenate([store.pd_cols, jnp.full((d_del,), n, jnp.int32)]),
        pd_add_cols,
        (store.pd_count,),
    )[:t]
    pd_count = store.pd_count + d_del

    n_del_live = jnp.sum((t_found | main_del).astype(jnp.int32))
    mid = LazyStore(
        rows=store.rows, cols=store.cols, w=w,
        tail_rows=tail_rows, tail_cols=tail_cols, tail_w=tail_w,
        tail_count=store.tail_count,
        pd_rows=pd_rows, pd_cols=pd_cols, pd_count=pd_count,
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
        pd_rows=mid.pd_rows, pd_cols=mid.pd_cols, pd_count=mid.pd_count,
        num_edges=mid.num_edges + n_add_live,
        num_nodes=n, weighted=mid.weighted,
    )
