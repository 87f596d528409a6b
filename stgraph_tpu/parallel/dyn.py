"""Distributed dynamic graphs: shard-local delta replay over a device mesh.

Net-new capability (the reference is single-GPU even for its dynamic
structures, SURVEY §2.6): destination-range edge partitioning — the same
ownership rule as ``partition.py`` — applied to an *evolving* graph:

  * every edge belongs to the shard owning its destination row, so a
    timestep's delta batch routes to shards by ``dst // nodes_per_shard``
    on the host, once, for all timesteps (``partition_dynamic``);
  * each shard carries its own flat ``EdgeStore`` (``graph/delta_graph``)
    and replays its delta slice inside ``shard_map`` — O(local delta) per
    shard per step, no cross-shard traffic for structure updates;
  * aggregation all-gathers the (row-sharded) feature table per step
    (``dist_dyn_spmm``). A *static* graph precomputes exact halo indices
    (``partition.py``); a mutating edge set would need per-step halo
    recomputation on device, so the dynamic path ships whole rows instead —
    the right trade at DTDG scales (England-COVID: 129 nodes; wiki-talk:
    the feature table is MBs while per-step halo discovery would serialize
    sorts into the scan).

On TPU the per-shard aggregation runs the row-id-masked Pallas kernel
(``segment_pallas.spmm_rowid_traced``) over each shard's live-sorted
store — the distributed composition of the single-chip dynamic kernels
(``ops.dyn_spmm``); shard-local row ids stay nondecreasing because every
shard owns a contiguous destination range, so the traced block metadata
builds per shard inside ``shard_map`` with no host involvement. Off-TPU
(CPU test meshes) the same functions run a masked-jnp path with identical
semantics; ``use_kernel=True, interpret=True`` exercises the kernel path
under the Pallas interpreter for CI.

Why this path keeps merge-based delta replay instead of the lazy
tombstone+tail-log store (``graph/lazy_store.py``), deliberately:

  * the distributed step is COMMUNICATION-bound, not update-bound: every
    timestep all-gathers the (N, F) feature table (dynamic edges have no
    precomputable halo), which at any scale where distribution pays
    dwarfs the per-shard structure update. The lazy store's O(delta)-vs-
    O(capacity) win targets exactly the term that is not on this path's
    critical path;
  * each shard's store holds ~capacity/P edges and replays a delta slice
    of at most the global batch — the merge cost the lazy store
    eliminates is divided by P here before it starts;
  * the lazy pair would grow the scan carry from 4 arrays to 11 per
    shard and put the amortized-compaction ``lax.cond`` inside
    ``shard_map``, where each shard's compaction fires at a different
    step — correct (no collectives inside the branch) but it forfeits
    SPMD uniformity for a term that is already off the critical path.

If a profile ever shows shard-local updates dominating (deltas growing
with P while features shrink), ``apply_delta_lazy`` is pure jnp and drops
into ``dist_dyn_apply_delta``'s body unchanged.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stgraph_tpu.graph.blocked import EDGE_CHUNK
from stgraph_tpu.graph.delta_graph import EdgeStore, apply_delta
from stgraph_tpu.ops.segment_pallas import _round_up, spmm_rowid_traced
from stgraph_tpu.parallel.mesh import manual_shard_map


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False

__all__ = [
    "DistDynGraph",
    "partition_dynamic",
    "shard_dyn_arrays",
    "dist_dyn_apply_delta",
    "dist_dyn_spmm",
    "dist_dyn_degree",
]


class DistDynGraph(NamedTuple):
    """Host-partitioned dynamic graph: per-shard stores + staged deltas.

    Arrays are stacked over shards on the leading axis (shard arrays with
    ``P('graph')``) or over (time, shard) for the staged deltas.

    Attributes:
      init_rows/init_cols: (P, cap) int32 — shard-local initial stores,
        rows are GLOBAL dst ids (each shard's live rows lie in its range),
        sentinel ``num_nodes`` padding; sorted by (row, col) per shard.
      init_w: (P, cap) f32 or None.
      init_ne: (P,) int32 live-edge counts.
      add_steps/del_steps: (T, P, A, 2) / (T, P, D, 2) int32 (src, dst)
        with sentinel-``num_nodes`` padding rows.
      add_w_steps: (T, P, A) f32 or None.
      num_nodes / nodes_per_shard / num_shards / capacity: static layout.
    """

    init_rows: np.ndarray
    init_cols: np.ndarray
    init_w: Optional[np.ndarray]
    init_ne: np.ndarray
    add_steps: np.ndarray
    del_steps: np.ndarray
    add_w_steps: Optional[np.ndarray]
    num_nodes: int
    nodes_per_shard: int
    num_shards: int
    capacity: int

    @property
    def padded_nodes(self) -> int:
        return self.nodes_per_shard * self.num_shards


def partition_dynamic(
    init_store: EdgeStore,
    staged_add: np.ndarray,  # (T, A, 2) global (src, dst), sentinel-padded
    staged_del: np.ndarray,  # (T, D, 2)
    staged_add_w: Optional[np.ndarray],  # (T, A) or None
    num_shards: int,
    capacity: Optional[int] = None,
) -> DistDynGraph:
    """Route the staged deltas and the initial store to dst-owner shards."""
    n = int(init_store.num_nodes)
    p = num_shards
    ns = -(-n // p)
    rows0 = np.asarray(init_store.rows)
    cols0 = np.asarray(init_store.cols)
    w0 = None if init_store.weights is None else np.asarray(init_store.weights)
    live = rows0 < n
    if capacity is None:
        # Worst-case per-shard growth: everything could land on one shard.
        capacity = max(
            ((int(live.sum()) + staged_add.shape[0] * staged_add.shape[1])
             + 511) // 512 * 512,
            512,
        )

    init_r = np.full((p, capacity), n, np.int32)
    init_c = np.full((p, capacity), n, np.int32)
    init_wp = None if w0 is None else np.zeros((p, capacity), np.float32)
    init_ne = np.zeros((p,), np.int32)
    for pp in range(p):
        sel = live & (rows0 // ns == pp)
        k = int(sel.sum())
        if k > capacity:
            raise ValueError("per-shard capacity too small for initial store")
        init_r[pp, :k] = rows0[sel]
        init_c[pp, :k] = cols0[sel]
        if init_wp is not None:
            init_wp[pp, :k] = w0[sel]
        init_ne[pp] = k

    def route(steps, w_steps=None):
        t, d, _ = steps.shape
        # Per-shard slot budget = global batch size (worst case one shard
        # absorbs the whole delta); rows stay (src, dst) with sentinel pad.
        out = np.full((t, p, d, 2), n, np.int32)
        out_w = None if w_steps is None else np.zeros((t, p, d), np.float32)
        for tt in range(t):
            dsts = steps[tt, :, 1]
            real = dsts < n
            owner = np.where(real, dsts // ns, p)
            for pp in range(p):
                sel = owner == pp
                k = int(sel.sum())
                out[tt, pp, :k] = steps[tt, sel]
                if out_w is not None:
                    out_w[tt, pp, :k] = w_steps[tt, sel]
        return out, out_w

    add_p, add_w_p = route(np.asarray(staged_add), staged_add_w)
    del_p, _ = route(np.asarray(staged_del))
    return DistDynGraph(
        init_rows=init_r,
        init_cols=init_c,
        init_w=init_wp,
        init_ne=init_ne,
        add_steps=add_p,
        del_steps=del_p,
        add_w_steps=add_w_p,
        num_nodes=n,
        nodes_per_shard=ns,
        num_shards=p,
        capacity=capacity,
    )


def shard_dyn_arrays(mesh: Mesh, ddg: DistDynGraph):
    """Device-place the carry arrays sharded over the 'graph' axis and the
    staged deltas sharded on their shard axis (scan xs)."""
    shard = NamedSharding(mesh, P("graph"))
    tshard = NamedSharding(mesh, P(None, "graph"))
    carry = (
        jax.device_put(jnp.asarray(ddg.init_rows), shard),
        jax.device_put(jnp.asarray(ddg.init_cols), shard),
        None
        if ddg.init_w is None
        else jax.device_put(jnp.asarray(ddg.init_w), shard),
        jax.device_put(jnp.asarray(ddg.init_ne), shard),
    )
    xs = (
        jax.device_put(jnp.asarray(ddg.add_steps), tshard),
        jax.device_put(jnp.asarray(ddg.del_steps), tshard),
        None
        if ddg.add_w_steps is None
        else jax.device_put(jnp.asarray(ddg.add_w_steps), tshard),
    )
    return carry, xs


def dist_dyn_apply_delta(
    mesh: Mesh,
    ddg: DistDynGraph,
    rows: jnp.ndarray,  # (P, cap)
    cols: jnp.ndarray,
    w: Optional[jnp.ndarray],
    ne: jnp.ndarray,  # (P,)
    add: jnp.ndarray,  # (P, A, 2)
    dele: jnp.ndarray,  # (P, D, 2)
    add_w: Optional[jnp.ndarray],  # (P, A)
):
    """Replay one timestep's routed delta on every shard, in parallel."""
    n = ddg.num_nodes
    weighted = w is not None
    has_add_w = add_w is not None

    def body(rows, cols, w_, ne_, add_, dele_, add_w_):
        store = EdgeStore(
            rows=rows[0],
            cols=cols[0],
            num_edges=ne_[0],
            num_nodes=n,
            weights=w_[0] if weighted else None,
        )
        out = apply_delta(
            store,
            add_[0, :, 1], add_[0, :, 0],  # row = dst
            dele_[0, :, 1], dele_[0, :, 0],
            add_weights=add_w_[0] if has_add_w else None,
        )
        ow = out.weights[None] if weighted else jnp.zeros((1, 1), jnp.float32)
        return out.rows[None], out.cols[None], ow, out.num_edges[None]

    spec_e = P("graph", None)
    in_specs = (
        spec_e, spec_e,
        spec_e if weighted else P(),
        P("graph"),
        P("graph", None, None), P("graph", None, None),
        P("graph", None) if add_w is not None else P(),
    )
    out_specs = (spec_e, spec_e, spec_e if weighted else P(), P("graph"))
    w_in = w if weighted else jnp.zeros((1, 1), jnp.float32)
    aw_in = add_w if add_w is not None else jnp.zeros((1, 1), jnp.float32)
    rows2, cols2, w2, ne2 = manual_shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        axes=("graph",),
        check_vma=False,  # apply_delta's fori_loop seeds unvarying consts
    )(rows, cols, w_in, ne, add, dele, aw_in)
    return rows2, cols2, (w2 if weighted else None), ne2


def _shard_agg(
    local_r, w_eff, gathered, ns: int, use_kernel: bool, interpret: bool
):
    """Differentiable per-shard aggregation (kernel or jnp backend).

    ``local_r`` is live-sorted with sentinel ``ns``; ``gathered`` holds
    features in store order. The VJP w.r.t. ``gathered`` is a pure gather
    of the output cotangent by ``local_r`` (no scatter); row ids and edge
    weights are graph data (zero cotangent), matching ``ops.dyn_spmm`` —
    and BOTH backends share this VJP, so TPU and CPU gradients agree.
    """
    f = gathered.shape[1]

    def impl(r, w_, g_):
        if use_kernel:
            out, _ = spmm_rowid_traced(
                r, w_, g_, ns, heads=1, interpret=interpret
            )
            return out[:ns, :f]
        gv = jnp.where((r < ns)[:, None], g_ * w_[:, None], 0.0)
        return jax.ops.segment_sum(
            gv, jnp.minimum(r, ns), num_segments=ns + 1
        )[:ns]

    @jax.custom_vjp
    def run(r, w_, g_):
        return impl(r, w_, g_)

    def run_fwd(r, w_, g_):
        return impl(r, w_, g_), (r, w_)

    def run_bwd(res, gout):
        r, w_ = res
        d = gout[jnp.minimum(r, ns - 1)] * w_[:, None]
        d = jnp.where((r < ns)[:, None], d, 0.0)
        return (
            np.zeros(r.shape, jax.dtypes.float0),
            jnp.zeros_like(w_),
            d.astype(gout.dtype),
        )

    run.defvjp(run_fwd, run_bwd)
    return run(local_r, w_eff, gathered)


def dist_dyn_spmm(
    mesh: Mesh,
    ddg: DistDynGraph,
    rows: jnp.ndarray,  # (P, cap) global dst ids
    cols: jnp.ndarray,  # (P, cap) global src ids
    w: Optional[jnp.ndarray],
    feats: jnp.ndarray,  # (P*ns, F) row-sharded
    use_kernel: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """``out[d] = sum w_e * feats[src_e]`` over the evolving shards.

    Source rows are fetched from an all-gathered feature table (dynamic
    edges have no precomputable halo); the segment reduction is shard-local
    because every destination's in-edges live on its owner shard. On TPU
    (or with ``use_kernel=True``) each shard reduces with the row-id
    Pallas kernel instead of an XLA scatter.
    """
    n = ddg.num_nodes
    ns = ddg.nodes_per_shard
    weighted = w is not None
    if use_kernel is None:
        use_kernel = _on_tpu() and ns < (1 << 24)
    cap = int(rows.shape[1])
    cap_pad = _round_up(cap, EDGE_CHUNK) + EDGE_CHUNK

    def body(rows, cols, w_, h_local):
        h_full = jax.lax.all_gather(
            h_local, "graph", axis=0, tiled=True
        )  # (P*ns, F)
        pp = jax.lax.axis_index("graph")
        r = rows[0]
        c = cols[0]
        gathered = h_full[jnp.minimum(c, n - 1)]
        local_r = jnp.where(r < n, r - pp * ns, ns).astype(jnp.int32)
        w_eff = w_[0] if weighted else jnp.ones((cap,), jnp.float32)
        if use_kernel:
            pad = cap_pad - cap
            local_r = jnp.concatenate(
                [local_r, jnp.full((pad,), ns, jnp.int32)]
            )
            w_eff = jnp.concatenate([w_eff, jnp.zeros((pad,), jnp.float32)])
            gathered = jnp.concatenate(
                [
                    gathered.astype(jnp.float32),
                    jnp.zeros((pad, gathered.shape[1]), jnp.float32),
                ]
            )
        out = _shard_agg(
            local_r, w_eff, gathered.astype(jnp.float32), ns,
            use_kernel, interpret,
        )
        return out.astype(h_local.dtype)

    spec_e = P("graph", None)
    out = manual_shard_map(
        body,
        mesh=mesh,
        in_specs=(
            spec_e, spec_e,
            spec_e if weighted else P(),
            P("graph", None),
        ),
        out_specs=P("graph", None),
        axes=("graph",),
        check_vma=not use_kernel,  # pallas_call outputs carry no vma
    )(rows, cols, w if weighted else jnp.zeros((1, 1), jnp.float32), feats)
    return out


def dist_dyn_degree(
    mesh: Mesh,
    ddg: DistDynGraph,
    rows: jnp.ndarray,
    use_kernel: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(P*ns, 1) live in-degree of the evolving graph (shard-local).

    On TPU each shard counts with the denominator-only row-id kernel
    (``ops.dyn_spmm.dyn_degree`` — streams just the weight/row-id plane);
    off-TPU a masked segment sum.
    """
    n = ddg.num_nodes
    ns = ddg.nodes_per_shard
    if use_kernel is None:
        use_kernel = _on_tpu() and ns < (1 << 24)

    def body(rows):
        r = rows[0]
        pp = jax.lax.axis_index("graph")
        local_r = jnp.where(r < n, r - pp * ns, ns).astype(jnp.int32)
        if use_kernel:
            from stgraph_tpu.ops.dyn_spmm import dyn_degree

            return dyn_degree(local_r, None, ns, interpret=interpret)[:, None]
        deg = jax.ops.segment_sum(
            jnp.where(r < n, 1.0, 0.0), local_r, num_segments=ns + 1
        )
        return deg[:ns, None]

    return manual_shard_map(
        body,
        mesh=mesh,
        in_specs=(P("graph", None),),
        out_specs=P("graph", None),
        axes=("graph",),
        check_vma=not use_kernel,  # pallas_call outputs carry no vma
    )(rows)
