"""Blocked-CSR SpMM as a Pallas TPU kernel with a fused custom VJP.

The TPU-native replacement for the reference's generated fused CUDA
aggregation kernels (``code_gen/templates/fa/tpl_fa_csr.jinja``: one
thread-group per destination node walking its CSR row). A TPU has no
per-thread gather/scatter; instead this kernel recasts segment reduction as
dense matmul on the MXU:

  * destination rows are processed in blocks of 128 (``blocked.ROW_BLOCK``);
  * each row block's edges are pre-laid-out contiguously and chunk-aligned
    by the host-side ``BlockedCSR`` pass (``graph/blocked.py``), so every
    DMA offset is a multiple of ``EDGE_CHUNK`` — the alignment Mosaic
    requires — and sentinel padding needs no masking;
  * for each chunk the kernel builds a selection matrix
    ``M[r, e] = (dst[e] == r) * w[e]`` with a broadcasted-iota compare
    (VPU) and accumulates ``M @ gathered_feats`` on the MXU — edge weights
    ride along for free, and out-of-block / sentinel edges contribute zero;
  * edge chunks are double-buffered HBM→VMEM so DMA overlaps the matmuls;
  * the launch grid is (row blocks × feature tiles) — the analogue of the
    reference's FA launch config (``execution_unit.py:92-106``).

The backward pass is the same kernel on the transposed layout:
``dL/dh = SpMM(csr^T, dL/dout)`` weighted by the permuted edge weights, and
``dL/dw = SDDMM(h, dL/dout)`` (reference: backward units launched on the
bwd CSR pointers, ``execution_unit.py:241-269``).

The dense gather ``h[cols]`` is performed by XLA before the kernel; the
kernel fuses the weighting + segment reduction. (A fully-fused gather via
per-edge DMA loses to XLA's gather at practical degrees; revisit with
block-diagonal reordering if profiling disagrees.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stgraph_tpu.graph.blocked import BlockedCSR, EDGE_CHUNK, ROW_BLOCK, build_blocked
from stgraph_tpu.graph.csr import CSR
from stgraph_tpu.ops import message as _msg

__all__ = ["spmm", "segment_sum_blocked"]

LANES = 128  # feature lanes per tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Edge ids/weights are shipped as (rows, LANES) 2-D arrays so chunk slices
# respect sublane tiling: one EDGE_CHUNK = _CHUNK_ROWS rows of LANES lanes.
_CHUNK_ROWS = EDGE_CHUNK // LANES  # 8 — matches the f32/int32 sublane tile


def _seg_matmul_kernel(
    # scalar prefetch
    offsets_ref,  # (NB,) block edge offset (multiple of EDGE_CHUNK)
    counts_ref,  # (NB,) padded block edge count (multiple of EDGE_CHUNK)
    # inputs (HBM)
    dst_ref,  # (CB // LANES, LANES) int32 destination ids
    w_ref,  # (CB // LANES, LANES) f32 edge weights (ones when unweighted)
    feats_ref,  # (CB, F_pad) gathered source features
    # output (VMEM block)
    out_ref,  # (ROW_BLOCK, LANES)
    # scratch
    ids_scratch,  # (2 * _CHUNK_ROWS, LANES) int32
    w_scratch,  # (2 * _CHUNK_ROWS, LANES) f32
    feat_scratch,  # (2, EDGE_CHUNK, LANES) f32
    acc_scratch,  # (ROW_BLOCK, LANES) f32
    ids_sem,  # (2,) DMA semaphores
    w_sem,  # (2,)
    feat_sem,  # (2,)
):
    rb = pl.program_id(0)
    ft = pl.program_id(1)
    start = offsets_ref[rb]
    nchunks = counts_ref[rb] // EDGE_CHUNK

    row_base = rb * ROW_BLOCK
    row_iota = (
        jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, EDGE_CHUNK), 0) + row_base
    )

    def dma(slot, chunk_idx):
        off = pl.multiple_of(start + chunk_idx * EDGE_CHUNK, EDGE_CHUNK)
        row_off = pl.multiple_of(
            (start + chunk_idx * EDGE_CHUNK) // LANES, _CHUNK_ROWS
        )
        return (
            pltpu.make_async_copy(
                dst_ref.at[pl.ds(row_off, _CHUNK_ROWS), :],
                ids_scratch.at[pl.ds(slot * _CHUNK_ROWS, _CHUNK_ROWS), :],
                ids_sem.at[slot],
            ),
            pltpu.make_async_copy(
                w_ref.at[pl.ds(row_off, _CHUNK_ROWS), :],
                w_scratch.at[pl.ds(slot * _CHUNK_ROWS, _CHUNK_ROWS), :],
                w_sem.at[slot],
            ),
            pltpu.make_async_copy(
                feats_ref.at[pl.ds(off, EDGE_CHUNK), pl.ds(ft * LANES, LANES)],
                feat_scratch.at[slot],
                feat_sem.at[slot],
            ),
        )

    @pl.when(nchunks > 0)
    def _():
        for d in dma(0, 0):
            d.start()

    acc_scratch[...] = jnp.zeros_like(acc_scratch)

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < nchunks)
        def _():
            for d in dma(nxt, i + 1):
                d.start()

        for d in dma(slot, i):
            d.wait()

        ids = ids_scratch[pl.ds(slot * _CHUNK_ROWS, _CHUNK_ROWS), :].reshape(
            EDGE_CHUNK
        )
        w = w_scratch[pl.ds(slot * _CHUNK_ROWS, _CHUNK_ROWS), :].reshape(EDGE_CHUNK)
        # Selection matrix: rows of this block pick up their edges, weighted.
        # Sentinel/out-of-block ids match no row -> zero contribution.
        # Cast to the feats dtype (bf16 runs the MXU at double rate; the
        # accumulator stays f32 via preferred_element_type).
        m = jnp.where(ids[None, :] == row_iota, w[None, :], 0.0)
        acc_scratch[...] += jnp.dot(
            m.astype(feat_scratch.dtype),
            feat_scratch[slot],
            preferred_element_type=jnp.float32,
        )
        return ()

    jax.lax.fori_loop(0, nchunks, body, (), unroll=False)
    out_ref[...] = acc_scratch[...]


def segment_sum_blocked(
    blocked: BlockedCSR,
    w_blocked: jnp.ndarray,  # (CB,) f32, blocked order
    feats_blocked: jnp.ndarray,  # (CB, F) f32, blocked order
    interpret: bool = False,
) -> jnp.ndarray:
    """out[n, f] = sum_{e: dst[e]==n} w[e] * feats[e, f] over blocked edges."""
    cb, f = feats_blocked.shape
    # bf16 feats halve the dominant HBM stream and run the MXU at 2x;
    # anything else computes in f32. Accumulation is always f32.
    feat_dtype = (
        jnp.bfloat16 if feats_blocked.dtype == jnp.bfloat16 else jnp.float32
    )
    feats_blocked = feats_blocked.astype(feat_dtype)
    f_pad = _round_up(max(f, LANES), LANES)
    if f_pad != f:
        feats_blocked = jnp.pad(feats_blocked, ((0, 0), (0, f_pad - f)))
    nb = blocked.num_blocks
    nf = f_pad // LANES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, nf),
        in_specs=[
            # Keep edge arrays in HBM (untiled): chunk DMAs slice them at
            # EDGE_CHUNK granularity, which VMEM tiling would reject, and
            # at scale they don't fit VMEM anyway.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (ROW_BLOCK, LANES), lambda rb, ft, *_: (rb, ft), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * _CHUNK_ROWS, LANES), jnp.int32),
            pltpu.VMEM((2 * _CHUNK_ROWS, LANES), jnp.float32),
            pltpu.VMEM((2, EDGE_CHUNK, LANES), feat_dtype),
            pltpu.VMEM((ROW_BLOCK, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _seg_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((blocked.num_rows_padded, f_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * cb * f_pad,
            bytes_accessed=cb * 4 * (f_pad + 2) + blocked.num_rows_padded * f_pad * 4,
            transcendentals=0,
        ),
    )(
        blocked.offsets,
        blocked.counts,
        blocked.dst.reshape(-1, LANES),
        w_blocked.astype(jnp.float32).reshape(-1, LANES),
        feats_blocked,
    )
    return out[: blocked.num_nodes, :f]


def _to_blocked_w(blocked: BlockedCSR, w: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Permute (capacity,) CSR-order edge weights into blocked order.

    Sentinel slots pick up a clamped (garbage) weight, which is harmless:
    their dst sentinel matches no row in the selection matrix.
    """
    if w is None:
        return jnp.ones((blocked.capacity,), jnp.float32)
    return w[jnp.minimum(blocked.perm, w.shape[0] - 1)]


def _make_spmm(
    bf: BlockedCSR, bb: BlockedCSR, weighted: bool, interpret: bool, csr: CSR
):
    """Custom-VJP SpMM closed over the (non-differentiable) blocked graphs."""

    @jax.custom_vjp
    def f(h, w):
        feats = h[bf.cols]  # XLA gather; sentinel cols clamp to garbage rows
        return segment_sum_blocked(
            bf, _to_blocked_w(bf, w if weighted else None), feats, interpret
        )

    def fwd(h, w):
        return f(h, w), (h, w)

    def bwd(res, g):
        h, w = res
        # dL/dh[s] = sum_{e=(s,d)} w_e * g[d]: same kernel on the transpose
        # blocked layout. bb.cols are destinations. Weights live in fwd-CSR
        # order; route them through the shared user eids:
        #   transpose-blocked slot -> user eid -> fwd-CSR position.
        gathered = g[bb.cols]
        if weighted:
            cap = csr.capacity
            pos_in_fwd = jnp.zeros((cap + 1,), jnp.int32)
            pos_in_fwd = pos_in_fwd.at[jnp.minimum(csr.eids, cap)].set(
                jnp.arange(cap, dtype=jnp.int32)
            )
            # Already in blocked order — indexed by transpose-blocked slot.
            w_t = w[pos_in_fwd[jnp.minimum(bb.eids, cap)]]
        else:
            w_t = jnp.ones((bb.capacity,), jnp.float32)
        dh = segment_sum_blocked(bb, w_t, gathered, interpret)
        if weighted:
            dw = jnp.sum(h[csr.cols] * g[csr.rows], axis=-1)  # fused SDDMM
            dw = jnp.where(csr.edge_mask, dw, 0.0)
        else:
            dw = jnp.zeros_like(res[1])
        return (dh, dw)

    f.defvjp(fwd, bwd)
    return f


def _make_spmm_multihead(
    bf: BlockedCSR, bb: BlockedCSR, csr: CSR, interpret: bool
):
    """Custom-VJP multi-head weighted SpMM.

    ``h`` is (N, H, F); ``w`` is (capacity, H) per-edge-per-head weights in
    CSR order (GAT's softmaxed attention). The per-head scaling rides the
    XLA gather (fused elementwise); the segment reduction runs on the
    flattened (H·F)-lane blocked kernel — one MXU matmul per edge chunk
    instead of a serialized scatter-add.
    """

    @jax.custom_vjp
    def f(h, w):
        n, heads, feat = h.shape
        wb = _to_blocked_w_mh(bf, csr, w)  # (CB, H) blocked order
        gathered = h[bf.cols] * wb[:, :, None]  # fused gather+scale
        ones = jnp.ones((bf.capacity,), jnp.float32)
        out = segment_sum_blocked(
            bf, ones, gathered.reshape(bf.capacity, heads * feat), interpret
        )
        return out.reshape(out.shape[0], heads, feat)

    def fwd(h, w):
        return f(h, w), (h, w)

    def bwd(res, g):
        h, w = res
        n, heads, feat = h.shape
        # dh[s,h,:] = sum_{e=(s,d)} w[e,h] * g[d,h,:]: transpose layout.
        wb_t = _to_blocked_w_mh(bb, csr, w)
        gathered = g[bb.cols] * wb_t[:, :, None]
        ones = jnp.ones((bb.capacity,), jnp.float32)
        dh = segment_sum_blocked(
            bb, ones, gathered.reshape(bb.capacity, heads * feat), interpret
        )[:n].reshape(n, heads, feat)
        # dw[e,h] = sum_f h[src_e,h,f] * g[dst_e,h,f]  (per-head SDDMM).
        dw = jnp.sum(h[csr.cols] * g[csr.rows], axis=-1)
        dw = jnp.where(csr.edge_mask[:, None], dw, 0.0)
        return (dh, dw.astype(w.dtype))

    f.defvjp(fwd, bwd)
    return f


def _to_blocked_w_mh(blk: BlockedCSR, csr: CSR, w: jnp.ndarray) -> jnp.ndarray:
    """Permute (capacity, H) CSR-order weights into ``blk``'s edge order.

    For the forward layout ``blk.perm`` maps directly; for the transpose
    layout weights are routed through the shared user eids (sentinels clamp
    to an arbitrary slot — harmless, their dst matches no row).
    """
    cap = csr.capacity
    pos_in_fwd = jnp.zeros((cap + 1,), jnp.int32)
    pos_in_fwd = pos_in_fwd.at[jnp.minimum(csr.eids, cap)].set(
        jnp.arange(cap, dtype=jnp.int32)
    )
    idx = pos_in_fwd[jnp.minimum(blk.eids, cap)]
    return w[idx]


def spmm(
    csr: CSR,
    node_feat: jnp.ndarray,
    edge_weight: Optional[jnp.ndarray] = None,
    reduce: str = "sum",
    blocked: Optional[BlockedCSR] = None,
    blocked_t: Optional[BlockedCSR] = None,
    csr_t: Optional[CSR] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas SpMM entry point matching ``ops.message.spmm``'s contract.

    ``blocked``/``blocked_t`` are the host-precomputed layouts (see
    ``StaticGraph.blocked_fwd``); when absent they are built on the fly,
    which requires concrete (non-traced) CSR arrays.
    """
    if reduce == "sum" and node_feat.ndim == 3 and edge_weight is not None:
        # Multi-head weighted aggregation (GAT): (N, H, F) feats with
        # (capacity, H[, 1]) per-edge-per-head weights.
        w = edge_weight.reshape(edge_weight.shape[0], -1)
        if w.shape == (csr.capacity, node_feat.shape[1]):
            blocked, blocked_t = _ensure_blocked(csr, blocked, blocked_t, csr_t)
            return _make_spmm_multihead(blocked, blocked_t, csr, interpret)(
                node_feat, w
            )
    if reduce != "sum" or node_feat.ndim != 2:
        # max/mean and other >2-D features fall back to the jnp path.
        return _msg.spmm(csr, node_feat, edge_weight, reduce=reduce, impl="jnp")
    weighted = edge_weight is not None
    if weighted:
        w = edge_weight.reshape(-1)
        if w.shape[0] != csr.capacity:
            return _msg.spmm(csr, node_feat, edge_weight, reduce=reduce, impl="jnp")
    else:
        w = jnp.ones((csr.capacity,), jnp.float32)
    blocked, blocked_t = _ensure_blocked(csr, blocked, blocked_t, csr_t)
    return _make_spmm(blocked, blocked_t, weighted, interpret, csr)(node_feat, w)


def _ensure_blocked(
    csr: CSR,
    blocked: Optional[BlockedCSR],
    blocked_t: Optional[BlockedCSR],
    csr_t: Optional[CSR],
):
    """Build missing blocked layouts host-side (requires concrete CSRs).

    Inside a jit trace this still works when the CSR is a closed-over
    constant — ensure_compile_time_eval makes the transpose eager.
    """
    if blocked is None or blocked_t is None:
        with jax.ensure_compile_time_eval():
            if blocked is None:
                blocked = build_blocked(csr)
            if blocked_t is None:
                blocked_t = build_blocked(
                    csr_t if csr_t is not None else csr.transpose()
                )
    return blocked, blocked_t
