"""Differentiable SpMM over TRACED dynamic edge stores (PMA / flat delta).

The dynamic-graph scan path mutates the edge store *inside* ``lax.scan``
(``graph/pma_store.py``), so the per-step structure is traced and the
host-metadata Pallas kernels (``spmm_rowmask``) cannot run. Until round 3
the scan path fell back to masked jnp segment ops — XLA scatters, ~10-20x
slower than the kernels at 2M edges. This module closes that gap:

  * forward aggregation runs the row-id-masked kernel
    (``segment_pallas.spmm_rowid_traced``) over the *destination-keyed*
    store;
  * the backward ``d node_feat`` runs the SAME kernel over a
    *source-keyed* twin store (``PMAGraphPair``) — the TPU equivalent of
    the reference rebuilding a reverse CSR per timestep for backprop
    (``stgraph/graph/dynamic/gpma/gpma.cu:1165-1231``,
    ``build_backward_csr``), except both directions are maintained
    incrementally at O(delta) cost;
  * per-node degrees (for GCN norms) come from a denominator-only kernel
    pass that streams just the (K_pad, E) weight/row-id plane — no
    feature traffic, no scatter.

Edge weights of dynamic stores are graph DATA, not parameters: the VJP
returns a zero cotangent for them (the reference never differentiates
w.r.t. PCSR/GPMA edge values either — they are structure).

Off-TPU the same functions run a masked-jnp path with identical semantics
(the allclose oracle for the kernel tests).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stgraph_tpu.graph.blocked import EDGE_CHUNK, ROW_BLOCK
from stgraph_tpu.graph.pma_store import PMAStore, apply_delta_pma
from stgraph_tpu.ops.segment_pallas import (
    _ALIGN,
    _round_up,
    spmm_rowid_traced,
    traced_block_meta,
)

__all__ = [
    "PMAGraphPair",
    "pma_pair_from_edges",
    "apply_delta_pair",
    "pma_spmm",
    "dyn_degree",
    "pma_norm",
    "LazyPair",
    "lazy_pair_from_edges",
    "apply_delta_lazy_pair",
    "lazy_spmm",
    "lazy_norm",
]


class PMAGraphPair(NamedTuple):
    """Dual PMA stores: ``fwd`` keyed by (dst, src) for aggregation, ``bwd``
    keyed by (src, dst) for the gradient's transpose aggregation. Both are
    updated with the same deltas (keys swapped), so they always describe
    the same graph — the functional counterpart of the reference keeping a
    forward and a backward CSR per dynamic graph
    (``stgraph/graph/dynamic/dynamic_graph.py:110-128``)."""

    fwd: PMAStore
    bwd: PMAStore

    @property
    def num_nodes(self) -> int:
        return self.fwd.num_nodes


def pma_pair_from_edges(
    src, dst, num_nodes: int, num_chunks: int, chunk_size: int, weights=None
) -> PMAGraphPair:
    """Host-build both stores from an edge list."""
    from stgraph_tpu.graph.pma_store import pma_from_edges

    if chunk_size % 128:
        raise ValueError("chunk_size must be a multiple of 128")
    fwd = pma_from_edges(
        src, dst, num_nodes, num_chunks, chunk_size, weights=weights
    )
    bwd = pma_from_edges(
        dst, src, num_nodes, num_chunks, chunk_size, weights=weights
    )
    return PMAGraphPair(fwd=fwd, bwd=bwd)


def apply_delta_pair(
    pair: PMAGraphPair,
    add_src,
    add_dst,
    del_src,
    del_dst,
    add_weights=None,
) -> PMAGraphPair:
    """Apply one timestep's delta to both stores (keys swapped). Jittable;
    2x the O(min(d, C)·S) chunk-local merge cost of a single store."""
    fwd = apply_delta_pma(
        pair.fwd, add_dst, add_src, del_dst, del_src,
        add_weights=add_weights,
    )
    bwd = apply_delta_pma(
        pair.bwd, add_src, add_dst, del_src, del_dst,
        add_weights=add_weights,
    )
    return PMAGraphPair(fwd=fwd, bwd=bwd)


def _pad_flat(x: jnp.ndarray, cap_pad: int, fill) -> jnp.ndarray:
    pad = cap_pad - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])


def _store_flat(store: PMAStore, cap_pad: int):
    rows, cols, w = store.flatten()
    n = store.num_nodes
    rows = _pad_flat(rows.astype(jnp.int32), cap_pad, n)
    cols = _pad_flat(cols.astype(jnp.int32), cap_pad, n)
    if w is not None:
        w = _pad_flat(w.astype(jnp.float32), cap_pad, 0.0)
    return rows, cols, w


def _flat_cap_pad(store: PMAStore) -> int:
    # One chunk of slack past capacity: traced_block_meta's aligned-down
    # starts may push the last chunk read past the live span.
    return _round_up(store.capacity, EDGE_CHUNK) + EDGE_CHUNK


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def _jnp_spmm(rows, cols, w, node_feat, n):
    """Masked-jnp oracle: same semantics as the kernel path."""
    gathered = node_feat[jnp.minimum(cols, n - 1)]
    if w is not None:
        wv = w.reshape(w.shape[0], *([1] * (gathered.ndim - 1)))
        gathered = gathered * wv
    mask = (rows < n).reshape((-1,) + (1,) * (gathered.ndim - 1))
    gathered = jnp.where(mask, gathered, 0.0)
    return jax.ops.segment_sum(
        gathered, jnp.minimum(rows, n), num_segments=n + 1
    )[:n]


def _kernel_spmm(rows, cols, w, node_feat, n, interpret):
    gathered = node_feat[jnp.minimum(cols, n - 1)]
    out, _ = spmm_rowid_traced(
        rows, w, gathered, n, heads=1, interpret=interpret
    )
    return out[:n, : node_feat.shape[1]]


def pma_spmm(
    pair: PMAGraphPair,
    node_feat: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """``out[d] = sum_{(s,d) live} w_e * node_feat[s]`` over the traced pair.

    Differentiable in ``node_feat`` (the backward pass runs the same kernel
    on the source-keyed store); edge weights are data (zero cotangent).
    """
    n = pair.num_nodes
    f_in = node_feat.shape[-1]
    cap_pad = _flat_cap_pad(pair.fwd)
    rows_f, cols_f, w_f = _store_flat(pair.fwd, cap_pad)
    rows_b, cols_b, w_b = _store_flat(pair.bwd, cap_pad)
    use_kernel = interpret or _on_tpu()
    if w_f is None:
        w_f = jnp.ones((cap_pad,), jnp.float32)
        w_b = jnp.ones((cap_pad,), jnp.float32)

    # All traced operands are custom_vjp ARGUMENTS (closing over tracers in
    # a custom_vjp leaks them); only static Python values are captured.
    impl = _kernel_spmm if use_kernel else (
        lambda r, c, w, x, n_, _i: _jnp_spmm(r, c, w, x, n_)
    )

    @jax.custom_vjp
    def run(rf, cf, wf, rb, cb, wb, feat):
        return impl(rf, cf, wf, feat, n, interpret)

    def run_fwd(rf, cf, wf, rb, cb, wb, feat):
        return impl(rf, cf, wf, feat, n, interpret), (rb, cb, wb, wf)

    def run_bwd(res, g):
        rb, cb, wb, wf = res
        dfeat = impl(rb, cb, wb, g, n, interpret)

        def int0(x):
            import numpy as _np

            return _np.zeros(x.shape, dtype=jax.dtypes.float0)

        return (
            int0(rb), int0(cb), jnp.zeros_like(wf),
            int0(rb), int0(cb), jnp.zeros_like(wb),
            dfeat.astype(g.dtype),
        )

    run.defvjp(run_fwd, run_bwd)
    out = run(
        rows_f, cols_f, w_f, rows_b, cols_b, w_b,
        node_feat.astype(jnp.float32),
    )
    return out[:, :f_in].astype(node_feat.dtype)


# ---------------------------------------------------------------------------
# Lazy store pair: the O(delta)-update dynamic graph (graph/lazy_store.py)
# with the same dual fwd/bwd structure and kernel aggregation as the PMA
# pair. Updates are tombstone+log (no capacity-wide passes per step);
# aggregation = row-id kernel over the sorted main store (zero-weight
# tombstones contribute nothing) + a small masked segment-sum over the
# tail log.
# ---------------------------------------------------------------------------


class LazyPair(NamedTuple):
    """Dual lazy stores: ``fwd`` keyed by (dst, src), ``bwd`` by
    (src, dst) — the backward pass aggregates on the twin."""

    fwd: "LazyStore"
    bwd: "LazyStore"

    @property
    def num_nodes(self) -> int:
        return self.fwd.num_nodes


def lazy_pair_from_edges(
    src, dst, num_nodes: int, capacity: int, tail_capacity: int,
    weights=None,
) -> LazyPair:
    from stgraph_tpu.graph.lazy_store import lazy_from_edges

    return LazyPair(
        fwd=lazy_from_edges(
            src, dst, num_nodes, capacity, tail_capacity, weights=weights
        ),
        bwd=lazy_from_edges(
            dst, src, num_nodes, capacity, tail_capacity, weights=weights
        ),
    )


def apply_delta_lazy_pair(
    pair: LazyPair, add_src, add_dst, del_src, del_dst, add_weights=None
) -> LazyPair:
    from stgraph_tpu.graph.lazy_store import apply_delta_lazy

    return LazyPair(
        fwd=apply_delta_lazy(
            pair.fwd, add_dst, add_src, del_dst, del_src,
            add_weights=add_weights,
        ),
        bwd=apply_delta_lazy(
            pair.bwd, add_src, add_dst, del_src, del_dst,
            add_weights=add_weights,
        ),
    )


def _lazy_one_side(store, node_feat, n, interpret):
    """Main-store kernel aggregation + tail segment-sum for one store."""
    cap_pad = _round_up(store.capacity, EDGE_CHUNK) + EDGE_CHUNK
    rows = _pad_flat(store.rows, cap_pad, n)
    cols = _pad_flat(store.cols, cap_pad, n)
    w = _pad_flat(store.w, cap_pad, 0.0)
    use_kernel = interpret or _on_tpu()
    if use_kernel:
        gathered = node_feat[jnp.minimum(cols, n - 1)]
        out, _ = spmm_rowid_traced(
            rows, w, gathered, n, heads=1, interpret=interpret
        )
        main = out[:n, : node_feat.shape[1]]
    else:
        main = _jnp_spmm(rows, cols, w, node_feat, n)
    # Tail + anti logs in ONE signed segment-sum: anti entries carry an
    # implicit -1, cancelling the tail entry they delete (lazy_store.py).
    t_rows = jnp.concatenate([store.tail_rows, store.anti_rows])
    t_cols = jnp.concatenate([store.tail_cols, store.anti_cols])
    t_w = jnp.concatenate([store.tail_w, store.anti_w()])
    t_gath = node_feat[jnp.minimum(t_cols, n - 1)]
    t_gath = t_gath * t_w[:, None]
    t_gath = jnp.where((t_rows < n)[:, None], t_gath, 0.0)
    tail = jax.ops.segment_sum(
        t_gath, jnp.minimum(t_rows, n), num_segments=n + 1
    )[:n]
    return main + tail


def lazy_spmm(
    pair: LazyPair, node_feat: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """``out[d] = sum_{(s,d) live} w_e * node_feat[s]`` over the lazy pair.

    Differentiable in ``node_feat`` (backward aggregates on the twin);
    edge weights are graph data (zero cotangent), matching ``pma_spmm``.
    """
    n = pair.num_nodes
    f_in = node_feat.shape[-1]

    @jax.custom_vjp
    def run(fwd_store, bwd_store, feat):
        return _lazy_one_side(fwd_store, feat, n, interpret)

    def run_fwd(fwd_store, bwd_store, feat):
        return run(fwd_store, bwd_store, feat), bwd_store

    def run_bwd(bwd_store, g):
        dfeat = _lazy_one_side(bwd_store, g, n, interpret)

        def zeros_like_store(s):
            return jax.tree_util.tree_map(
                lambda x: (
                    np.zeros(x.shape, jax.dtypes.float0)
                    if jnp.issubdtype(x.dtype, jnp.integer)
                    else jnp.zeros_like(x)
                ),
                s,
            )

        return (
            zeros_like_store(bwd_store),
            zeros_like_store(bwd_store),
            dfeat.astype(g.dtype),
        )

    run.defvjp(run_fwd, run_bwd)
    out = run(pair.fwd, pair.bwd, node_feat.astype(jnp.float32))
    return out[:, :f_in].astype(node_feat.dtype)


def lazy_norm(pair: LazyPair, interpret: bool = False) -> jnp.ndarray:
    """(N, 1) ``in_degree^{-1/2}`` over live edges, zero-degree -> 1."""
    n = pair.num_nodes
    st = pair.fwd
    cap_pad = _round_up(st.capacity, EDGE_CHUNK) + EDGE_CHUNK
    rows = _pad_flat(st.rows, cap_pad, n)
    w = _pad_flat(jnp.where(st.w > 0, 1.0, 0.0), cap_pad, 0.0)
    deg = dyn_degree(rows, w, n, interpret=interpret)
    # Signed log counting: live tail entries count +1 (unweighted
    # tail_w IS 1.0; weighted entries count 1 regardless of weight) and
    # anti entries -1, cancelling the tail edge they delete.
    t_cnt = (
        jnp.where(st.tail_w > 0, 1.0, 0.0) if st.weighted else st.tail_w
    )
    t_live = jnp.where(st.tail_rows < n, t_cnt, 0.0)
    deg = deg + jax.ops.segment_sum(
        t_live, jnp.minimum(st.tail_rows, n), num_segments=n + 1
    )[:n]
    deg = deg + jax.ops.segment_sum(
        st.anti_w(), jnp.minimum(st.anti_rows, n), num_segments=n + 1
    )[:n]
    norm = jnp.where(deg > 0, jnp.power(jnp.maximum(deg, 1.0), -0.5), 1.0)
    return norm[:, None]


# ---------------------------------------------------------------------------
# Denominator-only kernel: per-row weight sums (degrees) with no feature
# stream — used for per-step GCN norms.
# ---------------------------------------------------------------------------


def _rowid_denom_kernel(
    astart_ref,
    nchunks_ref,
    w_ref,  # (K_pad, CAP_pad): row 0 = weights, row 1 = row ids (f32)
    den_ref,  # (ROW_BLOCK, 128)
    w_scratch,  # (2, K_pad, EDGE_CHUNK)
    den_scratch,
    sem,
):
    rb = pl.program_id(0)
    a0 = astart_ref[rb]
    nck = nchunks_ref[rb]
    r0 = (rb * ROW_BLOCK).astype(jnp.float32)

    def dma(slot, i):
        off = pl.multiple_of(a0 + i * EDGE_CHUNK, _ALIGN)
        return pltpu.make_async_copy(
            w_ref.at[:, pl.ds(off, EDGE_CHUNK)],
            w_scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(nck > 0)
    def _():
        dma(0, 0).start()

    den_scratch[...] = jnp.zeros_like(den_scratch)
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (ROW_BLOCK, EDGE_CHUNK), 0
    ).astype(jnp.float32)

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nck)
        def _():
            dma(jax.lax.rem(i + 1, 2), i + 1).start()

        dma(slot, i).wait()
        rowid = w_scratch[slot, 1:2, :]  # (1, EDGE_CHUNK)
        m = ((rowid - r0) == row_iota).astype(jnp.float32)
        den_scratch[:, :8] += jax.lax.dot_general(
            m,
            w_scratch[slot],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return ()

    jax.lax.fori_loop(0, nck, body, (), unroll=False)
    den_ref[...] = den_scratch[...]


def dyn_degree(
    rows_flat: jnp.ndarray,
    w_flat: Optional[jnp.ndarray],
    num_nodes: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N,) per-row live count (``w_flat=None``) or weight sum.

    Streams only the narrow weight/row-id plane: ~64 MB at 2M edges vs the
    SpMM's ~1 GB feature plane. Scatter-free; traced inputs welcome.
    """
    n = int(num_nodes)
    cap = rows_flat.shape[0]
    cap_pad = _round_up(cap, EDGE_CHUNK) + EDGE_CHUNK
    rows = _pad_flat(rows_flat.astype(jnp.int32), cap_pad, n)
    if w_flat is None:
        w = jnp.where(rows < n, 1.0, 0.0)
    else:
        w = _pad_flat(w_flat.astype(jnp.float32), cap_pad, 0.0)
    if not (interpret or _on_tpu()):
        return jax.ops.segment_sum(
            jnp.where(rows < n, w, 0.0),
            jnp.minimum(rows, n),
            num_segments=n + 1,
        )[:n]
    astart, nchunks = traced_block_meta(rows, n)
    nb = astart.shape[0]
    k_pad = 8
    wt = jnp.concatenate(
        [
            w.reshape(cap_pad, 1),
            rows.astype(jnp.float32).reshape(cap_pad, 1),
            jnp.zeros((cap_pad, k_pad - 2), jnp.float32),
        ],
        axis=1,
    ).T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((ROW_BLOCK, 128), lambda rb, *_: (rb, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, k_pad, EDGE_CHUNK), jnp.float32),
            pltpu.VMEM((ROW_BLOCK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    den = pl.pallas_call(
        _rowid_denom_kernel,
        out_shape=jax.ShapeDtypeStruct((nb * ROW_BLOCK, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * cap_pad * ROW_BLOCK,
            bytes_accessed=cap_pad * 4 * k_pad + nb * ROW_BLOCK * 512,
            transcendentals=0,
        ),
    )(astart, nchunks, wt)
    return den[:n, 0]


def pma_norm(pair: PMAGraphPair, interpret: bool = False) -> jnp.ndarray:
    """(N, 1) ``in_degree^{-1/2}`` of the traced pair, zero-degree -> 1
    (same semantics as ``utils.norm.symmetric_norm``)."""
    cap_pad = _flat_cap_pad(pair.fwd)
    rows_f, _, _ = _store_flat(pair.fwd, cap_pad)
    deg = dyn_degree(rows_f, None, pair.num_nodes, interpret=interpret)
    norm = jnp.where(deg > 0, jnp.power(jnp.maximum(deg, 1.0), -0.5), 1.0)
    return norm[:, None]
