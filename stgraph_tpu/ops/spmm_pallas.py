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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stgraph_tpu.graph.blocked import BlockedCSR, EDGE_CHUNK, ROW_BLOCK, build_blocked
from stgraph_tpu.graph.csr import CSR
from stgraph_tpu.ops import message as _msg

__all__ = ["segment_sum_blocked", "segment_sum_edges", "spmm"]

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


# Segmented execution: above this many gathered-feature bytes the SpMM
# streams row-block segments so the (E, F) gather intermediate never
# materializes in full — required at ogbn scale (1e8 edges).
_SEGMENT_BYTES = 512 * 1024 * 1024


def _segment_ranges(blocked: BlockedCSR, f_pad: int, itemsize: int):
    """Split row blocks into segments whose gathered feats fit the budget."""
    offsets = np.asarray(blocked.offsets, dtype=np.int64)
    counts = np.asarray(blocked.counts, dtype=np.int64)
    nb = blocked.num_blocks
    budget = max(_SEGMENT_BYTES // max(f_pad * itemsize, 1), EDGE_CHUNK)
    ranges = []
    b0 = 0
    while b0 < nb:
        b1 = b0 + 1
        edges = counts[b0]
        while b1 < nb and edges + counts[b1] <= budget:
            edges += counts[b1]
            b1 += 1
        ranges.append((b0, b1, int(offsets[b0]), int(offsets[b1 - 1] + counts[b1 - 1])))
        b0 = b1
    return ranges


def _gather_scale_segment_sum(
    blocked: BlockedCSR,
    h_flat: jnp.ndarray,  # (N, F_flat) node features (rows indexed by cols)
    w_blocked: jnp.ndarray,  # (CB,) blocked-order edge weights
    interpret: bool,
) -> jnp.ndarray:
    """gather → weight → blocked segment-sum, streamed in row-block segments.

    Each segment gathers only its own edges' source rows, so peak memory is
    bounded by ``_SEGMENT_BYTES`` regardless of graph size. Single-segment
    graphs take the direct path (no slicing overhead).
    """
    f = h_flat.shape[-1]
    heads = 1 if w_blocked.ndim == 1 else w_blocked.shape[1]

    def scale(gathered, w_slice):
        if heads == 1:
            return gathered * w_slice.reshape(-1, 1).astype(gathered.dtype)
        # Per-head weights over flattened (H, F/H) lanes. A 2-D repeat
        # materializes an (E, F) weight plane but keeps everything in the
        # fast 128-lane layout; routing the multiply through an
        # (E, H, F/H) reshape measures ~2x slower (3-D relayouts).
        w2 = jnp.repeat(w_slice, f // heads, axis=1)
        return gathered * w2.astype(gathered.dtype)

    itemsize = jnp.dtype(h_flat.dtype).itemsize
    ranges = _segment_ranges(blocked, max(f, LANES), itemsize)
    if len(ranges) <= 1:
        gathered = scale(h_flat[blocked.cols], w_blocked)
        return segment_sum_blocked(
            blocked, jnp.ones((blocked.capacity,), jnp.float32), gathered, interpret
        )

    big = jnp.int32(2**30)  # off-range sentinel for shifted dst ids
    n = blocked.num_nodes
    outs = []
    for (b0, b1, o0, o1) in ranges:
        rows = (b1 - b0) * ROW_BLOCK
        dst = blocked.dst[o0:o1]
        dst = jnp.where(dst >= n, big, dst - b0 * ROW_BLOCK)
        sub = BlockedCSR(
            offsets=blocked.offsets[b0:b1] - o0,
            counts=blocked.counts[b0:b1],
            dst=dst,
            cols=blocked.cols[o0:o1],
            perm=blocked.perm[o0:o1],
            eids=blocked.eids[o0:o1],
            num_nodes=rows,  # only out-shape/sentinel bookkeeping below
            num_rows_padded=rows,
            csr_capacity=blocked.csr_capacity,
        )
        gathered = scale(h_flat[sub.cols], w_blocked[o0:o1])
        outs.append(
            segment_sum_blocked(
                sub, jnp.ones((o1 - o0,), jnp.float32), gathered, interpret
            )
        )
    out = jnp.concatenate(outs, axis=0)
    return out[: blocked.num_nodes]


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
        # Streaming gather+weight+reduce; sentinel cols clamp to garbage
        # rows whose dst matches no block row.
        return _gather_scale_segment_sum(
            bf, h, _to_blocked_w(bf, w if weighted else None), interpret
        )

    def fwd(h, w):
        return f(h, w), (h, w)

    def bwd(res, g):
        h, w = res
        # dL/dh[s] = sum_{e=(s,d)} w_e * g[d]: same kernel on the transpose
        # blocked layout. bb.cols are destinations. Weights live in fwd-CSR
        # order; route them through the shared user eids:
        #   transpose-blocked slot -> user eid -> fwd-CSR position.
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
        dh = _gather_scale_segment_sum(bb, g, w_t, interpret)
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
        out = _gather_scale_segment_sum(
            bf, h.reshape(n, heads * feat), wb, interpret
        )
        return out.reshape(out.shape[0], heads, feat)

    def fwd(h, w):
        return f(h, w), (h, w)

    def bwd(res, g):
        h, w = res
        n, heads, feat = h.shape
        # dh[s,h,:] = sum_{e=(s,d)} w[e,h] * g[d,h,:]: transpose layout.
        wb_t = _to_blocked_w_mh(bb, csr, w)
        dh = _gather_scale_segment_sum(
            bb, g.reshape(g.shape[0], heads * feat), wb_t, interpret
        )[:n].reshape(n, heads, feat)
        # dw[e,h] = sum_f h[src_e,h,f] * g[dst_e,h,f]  (per-head SDDMM) on
        # FLATTENED (N, H*F) tables — 3-D row gathers lower to a slow
        # per-element path on TPU.
        h2 = h.reshape(n, heads * feat)
        g2 = g.reshape(g.shape[0], heads * feat)
        dw = jnp.sum(
            (h2[csr.cols] * g2[csr.rows]).reshape(-1, heads, feat), axis=-1
        )
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


def _make_rowmask_spmm(
    csr: CSR,
    csr_t: CSR,
    heads: int,
    interpret: bool,
    weighted: bool = True,
    stream_dtype=None,
):
    """Custom-VJP SpMM over the position-masked rowmask kernel.

    Forward: fused weighted aggregation in CSR order. Backward: the same
    kernel on the transpose CSR (weights routed through the shared user
    eids) plus a flattened SDDMM for the weight gradient — scatter-free
    end to end. Unweighted calls skip the weight stream in BOTH directions.
    """
    from stgraph_tpu.ops import segment_pallas as nsp

    n = csr.num_nodes
    cap = csr.capacity
    _, rows_np, cols_np, eids_np = csr.host_arrays()
    _, _, _, eids_t_np = csr_t.host_arrays()
    emask = (rows_np < n).astype(np.float32)
    pos_in_fwd = np.zeros(cap + 1, np.int32)
    pos_in_fwd[np.minimum(eids_np, cap)] = np.arange(cap, dtype=np.int32)
    perm_t = pos_in_fwd[np.minimum(eids_t_np, cap)]
    pos_in_t = np.zeros(cap + 1, np.int32)
    pos_in_t[np.minimum(eids_t_np, cap)] = np.arange(cap, dtype=np.int32)
    perm_f = pos_in_t[np.minimum(eids_np, cap)]

    @jax.custom_vjp
    def f(h_flat, w):  # h_flat (N, heads*F), w (cap, heads)
        out, _ = nsp.spmm_rowmask(
            csr,
            w if weighted else None,
            h_flat,
            heads=heads,
            interpret=interpret,
            stream_dtype=stream_dtype,
        )
        return out

    def fwd(h_flat, w):
        return f(h_flat, w), (h_flat, w)

    def bwd(res, g):
        h_flat, w = res
        if not weighted:  # constant ones: plain transpose pass, no SDDMM
            dh, _ = nsp.spmm_rowmask(
                csr_t,
                None,
                g,
                heads=heads,
                interpret=interpret,
                stream_dtype=stream_dtype,
            )
            return dh.astype(h_flat.dtype), jnp.zeros_like(w)
        # One fused transpose pass: dh AND the per-edge SDDMM dw (the
        # separate SDDMM's two (E, H·F) gathers disappear).
        dh, dw_t = nsp.spmm_rowmask_bwd(
            csr_t,
            w[perm_t],
            g,
            h_flat,
            heads=heads,
            interpret=interpret,
            stream_dtype=stream_dtype,
        )
        dw = dw_t[perm_f] * emask[:, None]
        return dh.astype(h_flat.dtype), dw.astype(w.dtype)

    f.defvjp(fwd, bwd)
    return f


def _make_rowmask_spmm_dynidx(
    csr: CSR,
    csr_t: CSR,
    heads: int,
    interpret: bool,
    weighted: bool = True,
    stream_dtype=None,
):
    """Like ``_make_rowmask_spmm`` but the per-edge source-id arrays arrive
    as TRACED jit arguments instead of embedded host constants.

    At ogbn scale (1e8+ edges) a (capacity,) int32 constant is ~500 MB —
    past this environment's remote-compile request limit (HTTP 413) and a
    waste of module size anywhere. Callers pass ``(h, w, src_ids,
    src_ids_t)`` where the id arrays are the clamped forward cols and the
    transpose cols (device arrays, uploaded once as arguments). Integer
    args take float0 cotangents.
    """
    from stgraph_tpu.ops import segment_pallas as nsp

    n = csr.num_nodes
    cap = csr.capacity
    _, rows_np, _, eids_np = csr.host_arrays()
    _, _, _, eids_t_np = csr_t.host_arrays()
    emask = (rows_np < n).astype(np.float32)
    pos_in_fwd = np.zeros(cap + 1, np.int32)
    pos_in_fwd[np.minimum(eids_np, cap)] = np.arange(cap, dtype=np.int32)
    perm_t = pos_in_fwd[np.minimum(eids_t_np, cap)]
    pos_in_t = np.zeros(cap + 1, np.int32)
    pos_in_t[np.minimum(eids_t_np, cap)] = np.arange(cap, dtype=np.int32)
    perm_f = pos_in_t[np.minimum(eids_np, cap)]

    @jax.custom_vjp
    def f(h_flat, w, sids, sids_t):
        out, _ = nsp.spmm_rowmask(
            csr,
            w if weighted else None,
            h_flat,
            heads=heads,
            interpret=interpret,
            stream_dtype=stream_dtype,
            src_ids=sids,
        )
        return out

    def fwd(h_flat, w, sids, sids_t):
        return f(h_flat, w, sids, sids_t), (h_flat, w, sids, sids_t)

    def bwd(res, g):
        h_flat, w, sids, sids_t = res
        if weighted:
            dh, dw_t = nsp.spmm_rowmask_bwd(
                csr_t,
                w[perm_t],
                g,
                h_flat,
                heads=heads,
                interpret=interpret,
                stream_dtype=stream_dtype,
                src_ids=sids_t,
            )
            dw = dw_t[perm_f] * emask[:, None]
        else:
            dh, _ = nsp.spmm_rowmask(
                csr_t,
                None,
                g,
                heads=heads,
                interpret=interpret,
                stream_dtype=stream_dtype,
                src_ids=sids_t,
            )
            dw = jnp.zeros_like(w)
        f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # int cotangents
        return (
            dh.astype(h_flat.dtype),
            dw.astype(w.dtype),
            f0(sids),
            f0(sids_t),
        )

    f.defvjp(fwd, bwd)
    return f


def _rowmask_eligible(csr, heads: int, f: int) -> bool:
    if isinstance(csr.rows, jax.core.Tracer) or isinstance(
        csr.indptr, jax.core.Tracer
    ):
        return False
    return heads == 1 or (128 % f == 0 and (heads * f) % 128 == 0)


# f32 inputs on graphs at least this large stream bf16 through the rowmask
# kernel (f32 accumulate): halves the dominant HBM stream and runs the
# selection matmul at the MXU's double bf16 rate. Below this size the
# absolute win is microseconds and exactness is worth keeping (the allclose
# test graphs live there).
_BF16_STREAM_MIN_EDGES = 200_000


def _stream_dtype(csr: CSR, dt) -> Optional[jnp.dtype]:
    if dt == jnp.float32 and csr.capacity >= _BF16_STREAM_MIN_EDGES:
        return jnp.bfloat16
    return None


def spmm(
    csr: CSR,
    node_feat: jnp.ndarray,
    edge_weight: Optional[jnp.ndarray] = None,
    reduce: str = "sum",
    blocked: Optional[BlockedCSR] = None,
    blocked_t: Optional[BlockedCSR] = None,
    csr_t: Optional[CSR] = None,
    interpret: bool = False,
    src_ids: Optional[jnp.ndarray] = None,
    src_ids_t: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pallas SpMM entry point matching ``ops.message.spmm``'s contract.

    Preferred route is the position-masked rowmask kernel
    (``segment_pallas.spmm_rowmask``): it reads CSR order directly, so no
    blocked layouts or weight permutations are needed. The blocked-layout
    pipeline remains as fallback for head/feature tilings that don't
    divide 128.
    """
    if reduce == "sum" and node_feat.ndim == 3 and edge_weight is not None:
        # Multi-head weighted aggregation (GAT): (N, H, F) feats with
        # (capacity, H[, 1]) per-edge-per-head weights.
        w = edge_weight.reshape(edge_weight.shape[0], -1)
        if w.shape == (csr.capacity, node_feat.shape[1]):
            n, h, fpe = node_feat.shape
            if _rowmask_eligible(csr, h, fpe):
                if csr_t is None:
                    csr_t = csr.transpose()
                out = _make_rowmask_spmm(
                    csr, csr_t, h, interpret,
                    stream_dtype=_stream_dtype(csr, node_feat.dtype),
                )(node_feat.reshape(n, h * fpe), w)
                return out.reshape(n, h, fpe).astype(node_feat.dtype)
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
    if _rowmask_eligible(csr, 1, node_feat.shape[-1]):
        if csr_t is None:
            csr_t = csr.transpose()
        if src_ids is not None:
            if src_ids_t is None:
                raise ValueError("src_ids requires src_ids_t")
            out = _make_rowmask_spmm_dynidx(
                csr, csr_t, 1, interpret, weighted=weighted,
                stream_dtype=_stream_dtype(csr, node_feat.dtype),
            )(node_feat, w.reshape(-1, 1), src_ids, src_ids_t)
            return out.astype(node_feat.dtype)
        out = _make_rowmask_spmm(
            csr, csr_t, 1, interpret, weighted=weighted,
            stream_dtype=_stream_dtype(csr, node_feat.dtype),
        )(node_feat, w.reshape(-1, 1))
        return out.astype(node_feat.dtype)
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


def segment_sum_edges(
    csr: CSR,
    edge_vals: jnp.ndarray,  # (capacity, ...) in CSR edge order
    blocked: Optional[BlockedCSR] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Segment-sum CSR-ordered edge values into destination rows on the MXU.

    The scatter-free path for per-edge aggregations (GAT's softmax
    normalizer among them): values are permuted into blocked order and
    reduced by the selection-matmul kernel. The backward needs no scatter
    either — ``d(edge_vals)[e] = g[dst_e]`` is a gather in CSR order.
    """
    if blocked is None:
        with jax.ensure_compile_time_eval():
            blocked = build_blocked(csr)
    cap = csr.capacity
    lead = edge_vals.shape[0]
    trailing = edge_vals.shape[1:]
    k = int(np.prod(trailing)) if trailing else 1
    perm = jnp.minimum(blocked.perm, cap - 1)
    mask_np = (
        blocked.perm < cap
        if isinstance(blocked.perm, np.ndarray)
        else np.asarray(blocked.perm) < cap
    )
    rows_c = jnp.minimum(csr.rows, csr.num_nodes - 1)
    edge_mask = csr.edge_mask

    @jax.custom_vjp
    def f(v):
        vf = v.reshape(lead, k)
        vb = vf[perm] * jnp.asarray(mask_np, vf.dtype)[:, None]
        ones = jnp.ones((blocked.capacity,), jnp.float32)
        out = segment_sum_blocked(blocked, ones, vb, interpret)
        return out.reshape((csr.num_nodes,) + trailing)

    def fwd(v):
        return f(v), ()

    def bwd(_, g):
        gf = g.reshape(csr.num_nodes, k)
        dv = gf[rows_c] * jnp.asarray(edge_mask, gf.dtype)[:, None]
        return (dv.reshape((lead,) + trailing),)

    f.defvjp(fwd, bwd)
    return f(edge_vals)
