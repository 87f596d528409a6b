"""Narrow-feature segment reductions as position-masked Pallas kernels.

GAT-style vertex programs reduce *narrow* per-edge values — attention
logits and softmax normalizers of shape (E, H) with H ≈ 8 — where both the
XLA scatter (serialized) and the 128-lane blocked SpMM kernel (16x lane
padding on the HBM stream) are pathological: measured 19–25 ms for
E = 2M, H = 8 on a v5e chip (docs/PERF.md).

These kernels exploit that CSR edge order is destination-sorted, so each
destination row's edges occupy one *contiguous positional range*
``[indptr[r], indptr[r+1])``. The selection mask is therefore computable
from two range compares against a positional iota — no destination-id
stream, no permutation into a blocked layout, no sentinel edges. Edge
values are read **directly in CSR order** from 128-aligned chunk starts;
the sub-alignment skew is absorbed into the per-row ranges.

  * ``segment_sum_narrow`` — out.T (K, rows) accumulates
    ``vals.T @ mask`` on the MXU: one (K, 1024) x (1024, 128) matmul per
    edge chunk (K on the M dim: underutilized but contraction-bound, ~1
    cycle/edge).
  * ``segment_max_narrow`` — per-head masked max on the VPU
    (``where(mask, v_k, -inf)`` then a cross-sublane max), the scatter-free
    stability max for segment softmax.

Both have gather-only custom VJPs (the transpose of a segment reduction is
a destination-indexed gather). Reference counterpart: the aggregation
stage of the generated fused kernels
(``stgraph/compiler/code_gen/templates/fa/tpl_fa_csr.jinja:28-45``,
``AggSumOp``/``AggMaxOp`` in ``stgraph/compiler/registry.py:269-338``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stgraph_tpu.graph.blocked import EDGE_CHUNK, ROW_BLOCK
from stgraph_tpu.graph.csr import CSR

__all__ = [
    "RowBlockMeta",
    "row_block_meta",
    "segment_sum_narrow",
    "segment_max_narrow",
    "segment_sum_wide",
    "segment_max_wide",
    "spmm_rowmask",
    "spmm_rowmask_bwd",
    "spmm_rowid_traced",
    "traced_block_meta",
    "MAX_NARROW_K",
]

# Largest trailing width routed to these kernels; wider values go to the
# 128-lane blocked SpMM kernel, whose lane padding is then harmless.
MAX_NARROW_K = 16

_ALIGN = 128  # chunk starts are aligned down to this many edges


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class RowBlockMeta(NamedTuple):
    """Host-side per-row-block ranges for position-masked kernels.

    Attributes:
      astart:  (NB,) int32 — 128-aligned CSR position where block b's chunk
        reads begin (``align_down(indptr[b*128])``).
      nchunks: (NB,) int32 — EDGE_CHUNK-sized chunks to stream for block b.
      bs/be:   (NB, 1, ROW_BLOCK) int32 — each row's edge range in *chunk-local*
        positions (CSR position minus ``astart``); empty rows carry (0, 0).
      cap_pad: edge capacity the value arrays must be padded to so the last
        chunk's read stays in bounds.
      num_rows_padded: node count rounded up to ROW_BLOCK.
    """

    astart: np.ndarray
    nchunks: np.ndarray
    bs: np.ndarray
    be: np.ndarray
    cap_pad: int
    num_rows_padded: int

    @property
    def num_blocks(self) -> int:
        return self.astart.shape[0]


def row_block_meta(csr: CSR, chunk: int = EDGE_CHUNK) -> RowBlockMeta:
    """Build (and cache on the CSR object) the row-block position ranges.

    ``chunk`` sets the edge-chunk granularity the consuming kernel streams
    at (cached per value): larger chunks amortize per-chunk fixed costs
    (mask iota, small dots, DMA issue) at the price of more VMEM and more
    overshoot on short rows.
    """
    attr = (
        "_row_block_meta"
        if chunk == EDGE_CHUNK
        else f"_row_block_meta_{chunk}"
    )
    cached = getattr(csr, attr, None)
    if cached is not None:
        return cached
    indptr, _, _, _ = csr.host_arrays()
    indptr = indptr.astype(np.int64)
    n = csr.num_nodes
    n_pad = max(_round_up(n, ROW_BLOCK), ROW_BLOCK)
    nb = n_pad // ROW_BLOCK

    lo = np.minimum(np.arange(nb) * ROW_BLOCK, n)
    hi = np.minimum(lo + ROW_BLOCK, n)
    astart = (indptr[lo] // _ALIGN) * _ALIGN
    span = indptr[hi] - astart
    nchunks = (span + chunk - 1) // chunk

    # Row ranges in chunk-local coordinates. Rows beyond n get (0, 0).
    rows = np.minimum(
        np.arange(n_pad).reshape(nb, ROW_BLOCK), n
    )  # (NB, ROW_BLOCK) clamped row ids
    bs = indptr[rows] - astart[:, None]
    be = indptr[np.minimum(rows + 1, n)] - astart[:, None]
    empty = rows >= n
    bs[empty] = 0
    be[empty] = 0

    # Chunk-aligned so whole-plane passes (e.g. the bwd kernel's dw
    # zeroing) can walk it in full chunks.
    cap_pad = _round_up(
        int(max((astart + nchunks * chunk).max(), chunk)), chunk
    )
    meta = RowBlockMeta(
        astart=astart.astype(np.int32),
        nchunks=nchunks.astype(np.int32),
        # 3-D with a unit sublane dim: Mosaic requires the last two block
        # dims be (8k, 128m) or equal to the array dims; (1, 1, ROW_BLOCK)
        # blocks of an (NB, 1, ROW_BLOCK) array satisfy that.
        bs=bs.astype(np.int32).reshape(nb, 1, ROW_BLOCK),
        be=be.astype(np.int32).reshape(nb, 1, ROW_BLOCK),
        cap_pad=cap_pad,
        num_rows_padded=n_pad,
    )
    object.__setattr__(csr, attr, meta)
    return meta


def _narrow_sum_kernel(
    # scalar prefetch
    astart_ref,  # (NB,)
    nchunks_ref,  # (NB,)
    # inputs
    bs_ref,  # (1, 1, ROW_BLOCK) block
    be_ref,  # (1, 1, ROW_BLOCK) block
    vals_ref,  # (K_pad, CAP_pad) HBM, transposed CSR-order values
    # output
    out_ref,  # (K_pad, ROW_BLOCK) VMEM block
    # scratch
    vals_scratch,  # (2, K_pad, EDGE_CHUNK)
    acc_scratch,  # (K_pad, ROW_BLOCK) f32
    sem,  # (2,) DMA
):
    rb = pl.program_id(0)
    a0 = astart_ref[rb]
    nck = nchunks_ref[rb]

    def dma(slot, i):
        off = pl.multiple_of(a0 + i * EDGE_CHUNK, _ALIGN)
        return pltpu.make_async_copy(
            vals_ref.at[:, pl.ds(off, EDGE_CHUNK)],
            vals_scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(nck > 0)
    def _():
        dma(0, 0).start()

    acc_scratch[...] = jnp.zeros_like(acc_scratch)
    pos0 = jax.lax.broadcasted_iota(jnp.int32, (EDGE_CHUNK, ROW_BLOCK), 0)

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nck)
        def _():
            dma(jax.lax.rem(i + 1, 2), i + 1).start()

        dma(slot, i).wait()
        pos = pos0 + i * EDGE_CHUNK
        # Row r owns chunk-local positions [bs[r], be[r]): two compares
        # replace the dst-id stream entirely (CSR order is dst-sorted).
        m = jnp.logical_and(pos >= bs_ref[0], pos < be_ref[0])
        # TPU DEFAULT f32 matmuls run as ONE bf16 pass (measured ~0.8%
        # error); these are f32 streams, so force the exact path.
        acc_scratch[...] += jax.lax.dot_general(
            vals_scratch[slot],
            m.astype(vals_scratch.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return ()

    jax.lax.fori_loop(0, nck, body, (), unroll=False)
    out_ref[...] = acc_scratch[...]


def _col_i32(row_f32):
    """(1, ROW_BLOCK) f32 -> (ROW_BLOCK, 1) int32 via a one-hot matmul
    transpose — exact for integer values < 2^24 (call sites guard). Lets
    kernels that need per-row COLUMNS consume the (NB, 1, ROW_BLOCK)
    layout: the former (NB, ROW_BLOCK, 1) s32 inputs lane-padded their
    size-1 minor dim 128x (1.17 GB each at ogbn scale — measured OOM)."""
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, ROW_BLOCK), 0)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, ROW_BLOCK), 1)
    eye = (i_ids == j_ids).astype(jnp.float32)
    col = jax.lax.dot_general(
        eye,
        row_f32,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return col.astype(jnp.int32)


def _narrow_max_kernel(
    astart_ref,
    nchunks_ref,
    bs_ref,  # (1, 1, ROW_BLOCK) f32 block (chunk-local ranges < 2^24)
    be_ref,  # (1, 1, ROW_BLOCK) f32 block
    vals_ref,  # (K_pad, CAP_pad) HBM, transposed CSR-order values
    out_ref,  # (ROW_BLOCK, LANES)
    vals_scratch,  # (2, K_pad, EDGE_CHUNK)
    acc_scratch,  # (ROW_BLOCK, LANES) f32
    sem,
    *,
    k: int,
):
    rb = pl.program_id(0)
    a0 = astart_ref[rb]
    nck = nchunks_ref[rb]

    def dma(slot, i):
        off = pl.multiple_of(a0 + i * EDGE_CHUNK, _ALIGN)
        return pltpu.make_async_copy(
            vals_ref.at[:, pl.ds(off, EDGE_CHUNK)],
            vals_scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(nck > 0)
    def _():
        dma(0, 0).start()

    neg_inf = jnp.float32(-jnp.inf)
    acc_scratch[...] = jnp.full_like(acc_scratch, neg_inf)
    # Mask oriented (rows, positions): rows on sublanes so the per-head
    # row maxima reduce along lanes and write one accumulator lane each.
    pos0 = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, EDGE_CHUNK), 1)
    bs_col = _col_i32(bs_ref[0])  # (ROW_BLOCK, 1)
    be_col = _col_i32(be_ref[0])

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nck)
        def _():
            dma(jax.lax.rem(i + 1, 2), i + 1).start()

        dma(slot, i).wait()
        pos = pos0 + i * EDGE_CHUNK
        m = jnp.logical_and(pos >= bs_col, pos < be_col)
        for kk in range(k):  # static unroll; K <= MAX_NARROW_K
            vk = vals_scratch[slot, kk, :].reshape(1, EDGE_CHUNK)
            mk = jnp.where(m, vk, neg_inf)  # (ROW_BLOCK, EDGE_CHUNK)
            rowmax = jnp.max(mk, axis=1, keepdims=True)  # (ROW_BLOCK, 1)
            acc_scratch[:, kk : kk + 1] = jnp.maximum(
                acc_scratch[:, kk : kk + 1], rowmax
            )
        return ()

    jax.lax.fori_loop(0, nck, body, (), unroll=False)
    # Empty segments -> 0, matching ops.segment.segment_max semantics.
    acc = acc_scratch[...]
    out_ref[...] = jnp.where(jnp.isneginf(acc), 0.0, acc)


def _prep(csr: CSR, edge_vals: jnp.ndarray):
    meta = row_block_meta(csr)
    cap = csr.capacity
    lead = edge_vals.shape[0]
    trailing = edge_vals.shape[1:]
    k = int(np.prod(trailing)) if trailing else 1
    if lead != cap:
        raise ValueError(f"edge_vals leading dim {lead} != capacity {cap}")
    if k > MAX_NARROW_K:
        raise ValueError(f"trailing width {k} > MAX_NARROW_K={MAX_NARROW_K}")
    # Host numpy graph constants: the VJP closures embed these, and a
    # traced/jnp value there would leak a tracer into the backward trace
    # (and pull device->host at lowering over remote tunnels).
    _, rows_np, _, _ = csr.host_arrays()
    rows_c = np.minimum(rows_np, csr.num_nodes - 1)
    edge_mask = (rows_np < csr.num_nodes).astype(np.float32)
    return meta, k, trailing, rows_c, edge_mask


def segment_sum_narrow(
    csr: CSR, edge_vals: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """out[r, ...] = sum of CSR-order ``edge_vals`` rows with dst == r.

    For trailing widths K <= MAX_NARROW_K. Scatter-free forward (MXU
    selection matmul over positional masks) and backward (destination
    gather). Requires a concrete CSR.
    """
    meta, k, trailing, rows_c, edge_mask = _prep(csr, edge_vals)
    cap = csr.capacity
    n = csr.num_nodes
    k_pad = max(_round_up(k, 8), 8)

    @jax.custom_vjp
    def f(v):
        vf = v.reshape(cap, k).astype(jnp.float32)
        vt = jnp.pad(vf, ((0, meta.cap_pad - cap), (0, k_pad - k))).T
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(meta.num_blocks,),
            in_specs=[
                pl.BlockSpec((1, 1, ROW_BLOCK), lambda rb, *_: (rb, 0, 0)),
                pl.BlockSpec((1, 1, ROW_BLOCK), lambda rb, *_: (rb, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(
                (k_pad, ROW_BLOCK), lambda rb, *_: (0, rb)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, k_pad, EDGE_CHUNK), jnp.float32),
                pltpu.VMEM((k_pad, ROW_BLOCK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out_t = pl.pallas_call(
            _narrow_sum_kernel,
            out_shape=jax.ShapeDtypeStruct(
                (k_pad, meta.num_rows_padded), jnp.float32
            ),
            grid_spec=grid_spec,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * meta.cap_pad * ROW_BLOCK * k_pad,
                bytes_accessed=meta.cap_pad * 4 * k_pad
                + meta.num_rows_padded * k_pad * 4,
                transcendentals=0,
            ),
        )(meta.astart, meta.nchunks, meta.bs, meta.be, vt)
        return out_t[:k, :n].T.reshape((n,) + trailing).astype(edge_vals.dtype)

    def fwd(v):
        return f(v), ()

    def bwd(_, g):
        gf = g.reshape(n, k)
        dv = gf[rows_c] * edge_mask[:, None]
        return (dv.reshape((cap,) + trailing).astype(edge_vals.dtype),)

    f.defvjp(fwd, bwd)
    return f(edge_vals)


def segment_max_narrow(
    csr: CSR, edge_vals: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Per-destination maximum of CSR-order ``edge_vals``; empty rows -> 0.

    The scatter-free stability max for segment softmax. Gradient follows
    the argmax-mask convention: every edge whose value equals its
    segment's max receives the full output cotangent (ties double-count —
    immaterial for softmax stability shifts, whose net gradient is zero).
    """
    meta, k, trailing, rows_c, edge_mask = _prep(csr, edge_vals)
    cap = csr.capacity
    n = csr.num_nodes
    k_pad = max(_round_up(k, 8), 8)
    # bs/be ride as f32 rows (exact transpose in-kernel needs < 2^24);
    # a >16M-edge single row block falls back to the XLA segment max.
    f32_ranges = int(meta.be.max()) < (1 << 24)

    @jax.custom_vjp
    def f(v):
        vf = v.reshape(cap, k).astype(jnp.float32)
        if not f32_ranges:
            vals = jnp.where(edge_mask[:, None] > 0, vf, -jnp.inf)
            out = jax.ops.segment_max(vals, rows_c, num_segments=n)
            out = jnp.where(jnp.isneginf(out), 0.0, out)
            return out.reshape((n,) + trailing).astype(edge_vals.dtype)
        # Padding edges cannot contaminate a real row's max: they sit
        # beyond every row's [bs, be) range (be <= indptr[n]), so only
        # in-bounds reads are needed — pad, transpose to (K_pad, CAP_pad).
        vt = jnp.pad(vf, ((0, meta.cap_pad - cap), (0, k_pad - k))).T
        lanes = 128
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(meta.num_blocks,),
            in_specs=[
                pl.BlockSpec((1, 1, ROW_BLOCK), lambda rb, *_: (rb, 0, 0)),
                pl.BlockSpec((1, 1, ROW_BLOCK), lambda rb, *_: (rb, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(
                (ROW_BLOCK, lanes), lambda rb, *_: (rb, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, k_pad, EDGE_CHUNK), jnp.float32),
                pltpu.VMEM((ROW_BLOCK, lanes), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_narrow_max_kernel, k=k),
            out_shape=jax.ShapeDtypeStruct(
                (meta.num_rows_padded, lanes), jnp.float32
            ),
            grid_spec=grid_spec,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=meta.cap_pad * ROW_BLOCK * k,
                bytes_accessed=meta.cap_pad * 4 * k
                + meta.num_rows_padded * lanes * 4,
                transcendentals=0,
            ),
        )(
            meta.astart,
            meta.nchunks,
            meta.bs.astype(np.float32),
            meta.be.astype(np.float32),
            vt,
        )
        return out[:n, :k].reshape((n,) + trailing).astype(edge_vals.dtype)

    def fwd(v):
        out = f(v)
        return out, (v, out)

    def bwd(res, g):
        v, out = res
        vf = v.reshape(cap, k)
        gf = g.reshape(n, k)
        of = out.reshape(n, k)
        is_max = (vf == of[rows_c]) & (edge_mask[:, None] > 0)
        dv = jnp.where(is_max, gf[rows_c], 0.0)
        return (dv.reshape((cap,) + trailing).astype(v.dtype),)

    f.defvjp(fwd, bwd)
    return f(edge_vals)


def _wide_max_kernel(
    astart_ref,  # (NB,) scalar prefetch
    nchunks_ref,  # (NB,)
    bs_ref,  # (1, ROW_BLOCK, 1) block
    be_ref,  # (1, ROW_BLOCK, 1) block
    vals_ref,  # (CAP_pad, F_pad) HBM — CSR-order edge values
    out_ref,  # (ROW_BLOCK, 128) block
    vals_scratch,  # (2, EDGE_CHUNK, 128) f32
    acc_scratch,  # (ROW_BLOCK, 128) f32
    sem,
):
    """Per-destination max over WIDE trailing widths (F > MAX_NARROW_K).

    Per chunk: a segmented prefix-max along positions (log2(EDGE_CHUNK)
    shift-and-select steps on the VPU; segment starts come from one
    masked reduce over the row ranges — no scan needed because CSR rows
    are contiguous), then each row picks the prefix value at its last
    in-chunk position with a one-hot selection matmul. Cross-chunk combine
    is an elementwise max on the accumulator. Replaces the serialized XLA
    scatter the wide-max path previously fell to (reference fuses AggMax
    into every kernel: ``stgraph/compiler/registry.py:295-338``).
    """
    rb = pl.program_id(0)
    ft = pl.program_id(1)
    a0 = astart_ref[rb]
    nck = nchunks_ref[rb]

    def dma(slot, i):
        off = pl.multiple_of(a0 + i * EDGE_CHUNK, _ALIGN)
        return pltpu.make_async_copy(
            vals_ref.at[pl.ds(off, EDGE_CHUNK), pl.ds(ft * 128, 128)],
            vals_scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(nck > 0)
    def _():
        dma(0, 0).start()

    neg_inf = jnp.float32(-jnp.inf)
    acc_scratch[...] = jnp.full_like(acc_scratch, neg_inf)
    pos_rc = jax.lax.broadcasted_iota(
        jnp.int32, (ROW_BLOCK, EDGE_CHUNK), 1
    )  # block-local positions per (row, pos)
    pos_col = jax.lax.broadcasted_iota(
        jnp.int32, (EDGE_CHUNK, 128), 0
    )  # position per (pos, lane)
    bs = bs_ref[0]  # (ROW_BLOCK, 1)
    be = be_ref[0]

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nck)
        def _():
            dma(jax.lax.rem(i + 1, 2), i + 1).start()

        dma(slot, i).wait()

        base = i * EDGE_CHUNK
        pos = pos_rc + base  # (ROW_BLOCK, EDGE_CHUNK) block-local
        # Segment start per position: the largest row-start <= pos (rows
        # are contiguous, so this is the position's own row's start). For
        # carried-over positions (their row started before this block's
        # coverage) it clamps to the chunk start — still correct, those
        # rows own the whole chunk prefix.
        starts = jnp.max(
            jnp.where(bs <= pos, bs, jnp.int32(-1)), axis=0
        )  # (EDGE_CHUNK,)
        start_local = jnp.maximum(starts - base, 0).reshape(
            EDGE_CHUNK, 1
        )  # chunk-local, clamped

        v = vals_scratch[slot].astype(jnp.float32)
        step = 1
        while step < EDGE_CHUNK:
            shifted = pltpu.roll(v, step, 0)  # v[p - step] at row p
            take = pos_col - step >= start_local
            v = jnp.where(take, jnp.maximum(v, shifted), v)
            step *= 2
        # Each row picks prefix[min(be, hi) - 1] if it has positions here.
        hi = base + EDGE_CHUNK
        pick_pos = jnp.minimum(be, hi) - 1  # (ROW_BLOCK, 1)
        present = jnp.logical_and(
            bs < be, jnp.logical_and(bs < hi, be > base)
        )  # non-empty row ∩ chunk
        onehot = jnp.logical_and(
            pos == pick_pos, present
        ).astype(v.dtype)  # (ROW_BLOCK, EDGE_CHUNK)
        picked = jax.lax.dot_general(
            onehot,
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (ROW_BLOCK, 128) — exact one-hot rows (DEFAULT would round
        # the selected values through one bf16 pass on TPU)
        picked = jnp.where(present, picked, neg_inf)
        acc_scratch[...] = jnp.maximum(acc_scratch[...], picked)
        return ()

    jax.lax.fori_loop(0, nck, body, (), unroll=False)
    acc = acc_scratch[...]
    # Empty segments -> 0, matching ops.segment.segment_max semantics.
    out_ref[...] = jnp.where(jnp.isneginf(acc), 0.0, acc)


def _wide_call(csr: CSR, edge_vals: jnp.ndarray, kernel, interpret: bool):
    """Shared driver: CSR-order (cap, K) edge values -> (N, K) reduction."""
    meta = row_block_meta(csr)
    n = csr.num_nodes
    cap = csr.capacity
    k = edge_vals.shape[1]
    f_pad = _round_up(max(k, 128), 128)
    vf = edge_vals.astype(jnp.float32)
    vf = jnp.pad(vf, ((0, meta.cap_pad - cap), (0, f_pad - k)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(meta.num_blocks, f_pad // 128),
        in_specs=[
            pl.BlockSpec((1, ROW_BLOCK, 1), lambda rb, ft, *_: (rb, 0, 0)),
            pl.BlockSpec((1, ROW_BLOCK, 1), lambda rb, ft, *_: (rb, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, 128), lambda rb, ft, *_: (rb, ft)),
        scratch_shapes=[
            pltpu.VMEM((2, EDGE_CHUNK, 128), jnp.float32),
            pltpu.VMEM((ROW_BLOCK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (meta.num_rows_padded, f_pad), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * meta.cap_pad * f_pad,
            bytes_accessed=meta.cap_pad * 4 * f_pad
            + meta.num_rows_padded * f_pad * 4,
            transcendentals=0,
        ),
    )(
        meta.astart,
        meta.nchunks,
        meta.bs.reshape(meta.num_blocks, ROW_BLOCK, 1),
        meta.be.reshape(meta.num_blocks, ROW_BLOCK, 1),
        vf,
    )
    return out[:n, :k]


def segment_max_wide(
    csr: CSR, edge_vals: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Per-destination max of CSR-order ``edge_vals`` for ANY trailing
    width; empty rows -> 0. Scatter-free forward (segmented prefix-max)
    and backward (argmax-mask gather, ties double-count like the narrow
    kernel). Requires a concrete CSR.
    """
    cap = csr.capacity
    n = csr.num_nodes
    lead = edge_vals.shape[0]
    trailing = edge_vals.shape[1:]
    k = int(np.prod(trailing)) if trailing else 1
    if lead != cap:
        raise ValueError(f"edge_vals leading dim {lead} != capacity {cap}")
    _, rows_np, _, _ = csr.host_arrays()
    rows_c = np.minimum(rows_np, n - 1)
    edge_mask = (rows_np < n).astype(np.float32)

    @jax.custom_vjp
    def f(v):
        out = _wide_call(csr, v.reshape(cap, k), _wide_max_kernel, interpret)
        return out.reshape((n,) + trailing).astype(edge_vals.dtype)

    def fwd(v):
        out = f(v)
        return out, (v, out)

    def bwd(res, g):
        v, out = res
        vf = v.reshape(cap, k)
        gf = g.reshape(n, k)
        of = out.reshape(n, k)
        is_max = (vf == of[rows_c]) & (edge_mask[:, None] > 0)
        dv = jnp.where(is_max, gf[rows_c], 0.0)
        return (dv.reshape((cap,) + trailing).astype(v.dtype),)

    f.defvjp(fwd, bwd)
    return f(edge_vals)


def segment_sum_wide(
    csr: CSR, edge_vals: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Per-destination sum of CSR-order ``edge_vals`` for ANY trailing
    width — the unweighted rowmask selection-matmul applied directly to
    edge values (no gather). Scatter-free VJP (destination gather)."""
    cap = csr.capacity
    n = csr.num_nodes
    lead = edge_vals.shape[0]
    trailing = edge_vals.shape[1:]
    k = int(np.prod(trailing)) if trailing else 1
    if lead != cap:
        raise ValueError(f"edge_vals leading dim {lead} != capacity {cap}")
    _, rows_np, _, _ = csr.host_arrays()
    rows_c = np.minimum(rows_np, n - 1)
    edge_mask = (rows_np < n).astype(np.float32)
    meta = row_block_meta(csr)
    k_pad = 8  # unused by the unweighted kernel

    # bf16 value stream on large graphs (f32 accumulate) — same rationale
    # and threshold as the SpMM path.
    stream = (
        jnp.bfloat16
        if cap >= 200_000 and edge_vals.dtype == jnp.float32
        else jnp.float32
    )

    @jax.custom_vjp
    def f(v):
        vf = v.reshape(cap, k).astype(stream)
        f_pad = _round_up(max(k, 128), 128)
        vf = jnp.pad(vf, ((0, meta.cap_pad - cap), (0, f_pad - k)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(meta.num_blocks, f_pad // 128),
            in_specs=[
                pl.BlockSpec((1, ROW_BLOCK, 1), lambda rb, ft, *_: (rb, 0, 0)),
                pl.BlockSpec((1, ROW_BLOCK, 1), lambda rb, ft, *_: (rb, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=(
                pl.BlockSpec((ROW_BLOCK, 128), lambda rb, ft, *_: (rb, ft)),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, EDGE_CHUNK, 128), stream),
                pltpu.VMEM((ROW_BLOCK, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        (out,) = pl.pallas_call(
            functools.partial(
                _spmm_rowmask_kernel,
                k_pad=k_pad,
                feats_per_head=128,
                single_head=True,
                with_denom=False,
                weighted=False,
            ),
            out_shape=(
                jax.ShapeDtypeStruct(
                    (meta.num_rows_padded, f_pad), jnp.float32
                ),
            ),
            grid_spec=grid_spec,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * meta.cap_pad * f_pad,
                bytes_accessed=meta.cap_pad * 4 * f_pad
                + meta.num_rows_padded * f_pad * 4,
                transcendentals=0,
            ),
        )(
            meta.astart,
            meta.nchunks,
            meta.bs.reshape(meta.num_blocks, ROW_BLOCK, 1),
            meta.be.reshape(meta.num_blocks, ROW_BLOCK, 1),
            vf,
        )
        return out[:n, :k].reshape((n,) + trailing).astype(edge_vals.dtype)

    def fwd(v):
        return f(v), ()

    def bwd(_, g):
        gf = g.reshape(n, k)
        dv = gf[rows_c] * edge_mask[:, None]
        return (dv.reshape((cap,) + trailing).astype(edge_vals.dtype),)

    f.defvjp(fwd, bwd)
    return f(edge_vals)


# ---------------------------------------------------------------------------
# Row-masked weighted SpMM: the fused multihead aggregation kernel.
# ---------------------------------------------------------------------------

# Gathered-feature bytes per streamed segment (bounds peak HBM at ogbn scale).
_SEGMENT_BYTES = 512 * 1024 * 1024


def _spmm_rowmask_kernel(
    astart_ref,  # (NB,) scalar prefetch
    nchunks_ref,  # (NB,)
    bs_ref,  # (1, ROW_BLOCK, 1) block
    be_ref,  # (1, ROW_BLOCK, 1) block
    *refs,  # [w_ref], feats_ref, out_ref, [den_ref], scratches, sems
    k_pad: int,
    feats_per_head: int,
    single_head: bool,
    with_denom: bool,
    weighted: bool,
):
    # Unpack the flag-dependent ref list. Layout:
    #   inputs:  [w_ref (K_pad, CAP_pad) if weighted], feats_ref (CAP_pad, F_pad)
    #   outputs: out_ref (ROW_BLOCK, LANES) [, den_ref (ROW_BLOCK, LANES)]
    #   scratch: [w_scratch], feat_scratch, acc_scratch [, den_scratch],
    #            [w_sem], feat_sem
    refs = list(refs)
    w_ref = refs.pop(0) if weighted else None
    feats_ref = refs.pop(0)
    out_ref = refs.pop(0)
    den_ref = refs.pop(0) if with_denom else None
    w_scratch = refs.pop(0) if weighted else None
    feat_scratch = refs.pop(0)
    acc_scratch = refs.pop(0)
    den_scratch = refs.pop(0) if with_denom else None
    w_sem = refs.pop(0) if weighted else None
    feat_sem = refs.pop(0)

    rb = pl.program_id(0)
    ft = pl.program_id(1)
    heads_per_tile = 128 // feats_per_head
    a0 = astart_ref[rb]
    nck = nchunks_ref[rb]

    def dma(slot, i):
        off = pl.multiple_of(a0 + i * EDGE_CHUNK, _ALIGN)
        copies = []
        if weighted:
            copies.append(
                pltpu.make_async_copy(
                    w_ref.at[:, pl.ds(off, EDGE_CHUNK)],
                    w_scratch.at[slot],
                    w_sem.at[slot],
                )
            )
        copies.append(
            pltpu.make_async_copy(
                feats_ref.at[pl.ds(off, EDGE_CHUNK), pl.ds(ft * 128, 128)],
                feat_scratch.at[slot],
                feat_sem.at[slot],
            )
        )
        return copies

    @pl.when(nck > 0)
    def _():
        for d in dma(0, 0):
            d.start()

    acc_scratch[...] = jnp.zeros_like(acc_scratch)
    if with_denom:

        @pl.when(ft == 0)
        def _():
            den_scratch[...] = jnp.zeros_like(den_scratch)

    pos0 = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, EDGE_CHUNK), 1)
    if weighted:
        # Spread matrix: lane l of this feature tile belongs to head
        # ft*heads_per_tile + l // F; S scatters the (K_pad, E) weight rows
        # onto their lanes via one tiny exact matmul (no in-kernel
        # transpose needed).
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (k_pad, 128), 0)
        l_ids = jax.lax.broadcasted_iota(jnp.int32, (k_pad, 128), 1)
        if single_head:
            spread = (h_ids == 0).astype(jnp.float32)  # every lane: head 0
        else:
            spread = (
                h_ids == ft * heads_per_tile + l_ids // feats_per_head
            ).astype(jnp.float32)

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nck)
        def _():
            for d in dma(jax.lax.rem(i + 1, 2), i + 1):
                d.start()

        for d in dma(slot, i):
            d.wait()

        pos = pos0 + i * EDGE_CHUNK
        feat_dtype = feat_scratch.dtype
        m = jnp.logical_and(pos >= bs_ref[0], pos < be_ref[0]).astype(
            feat_dtype
        )  # (ROW_BLOCK, EDGE_CHUNK); 0/1 are exact in bf16
        exact = feat_dtype == jnp.float32
        if weighted:
            w_chunk = w_scratch[slot]  # (K_pad, EDGE_CHUNK)
            # bf16 stream: weights ride at bf16 precision end-to-end (the
            # features already do); f32 stream keeps the spread exact.
            w_lane = jax.lax.dot_general(
                w_chunk,
                spread,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(
                    jax.lax.Precision.HIGHEST
                    if exact
                    else jax.lax.Precision.DEFAULT
                ),
            )  # (EDGE_CHUNK, 128): per-edge weight broadcast onto head lanes
            # bf16 feats run the MXU at double rate and halve the dominant
            # HBM stream; the accumulator stays f32.
            if exact:
                scaled = (
                    feat_scratch[slot].astype(jnp.float32) * w_lane
                ).astype(feat_dtype)
            else:
                scaled = feat_scratch[slot] * w_lane.astype(feat_dtype)
        else:
            # Unweighted fast path: no weight stream, no spread matmul, no
            # scaling pass — the selection matmul consumes the chunk as-is.
            scaled = feat_scratch[slot]
        acc_scratch[...] += jnp.dot(
            m, scaled, preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST if exact
                else jax.lax.Precision.DEFAULT
            ),
        )
        if with_denom:

            @pl.when(ft == 0)
            def _():
                den_scratch[:, :k_pad] += jax.lax.dot_general(
                    m.astype(jnp.float32),  # w_chunk is f32; no mixed dot
                    w_chunk,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (ROW_BLOCK, K_pad)
        return ()

    jax.lax.fori_loop(0, nck, body, (), unroll=False)
    out_ref[...] = acc_scratch[...]
    if with_denom:
        den_ref[...] = den_scratch[...]


def spmm_rowmask(
    csr: CSR,
    w: Optional[jnp.ndarray],  # (capacity, heads) CSR-order edge weights
    node_feats: jnp.ndarray,  # (N, heads * F) flat source features
    heads: int = 1,
    with_denom: bool = False,
    interpret: bool = False,
    stream_dtype=None,
    src_ids: Optional[jnp.ndarray] = None,
):
    """out[d] = sum_e w[e, h] * node_feats[src_e, h-lanes] — fused weighted
    multihead SpMM reading CSR order directly through positional row masks.

    Replaces the blocked-layout pipeline for the hot GAT aggregation: no
    permutation of weights into blocked order, no sentinel dst stream, no
    materialized (E, F) weight plane (XLA's repeat+multiply costs gigabytes
    at scale). ``with_denom=True`` additionally returns
    ``denom[d, h] = sum_e w[e, h]`` accumulated in the same pass — the
    softmax normalizer for free.

    ``w=None`` takes the unweighted fast path: no weight stream, no spread
    matmul, no scaling pass (measured: the weighted machinery costs ~25% of
    kernel time on an unweighted 2M-edge SpMM).

    ``stream_dtype`` sets the gathered-feature stream element type; pass
    ``jnp.bfloat16`` to halve the dominant HBM stream and run the selection
    matmul at the MXU's double bf16 rate (accumulation stays f32). The cast
    happens *after* the gather (fused into the gather's output write) —
    gathering from a bf16 table is slower, not faster: the random row reads
    are transaction-bound, so halving the row payload saves nothing while
    the narrower write hurts (measured 3.9 ms vs 3.3 ms at E=2M, F=128).

    Requirements: ``heads * F`` divisible by 128 and ``128 % F == 0``
    (single-head: any F, padded to 128 lanes). Returns ``(out, denom)``;
    ``denom`` is None unless requested.
    """
    meta = row_block_meta(csr)
    n = csr.num_nodes
    cap = csr.capacity
    f_flat = node_feats.shape[-1]
    f = f_flat // heads
    if f * heads != f_flat:
        raise ValueError("node_feats width must be heads * F")
    if heads > 1 and (128 % f != 0 or f_flat % 128 != 0):
        raise ValueError(
            "multihead spmm_rowmask needs 128 % F == 0 and heads*F % 128 == 0"
        )
    weighted = w is not None
    if with_denom and not weighted:
        raise ValueError("with_denom requires weights")
    k_pad = max(_round_up(heads, 8), 8)
    f_pad = _round_up(max(f_flat, 128), 128)
    if stream_dtype is not None:
        feat_dtype = stream_dtype
    else:
        feat_dtype = (
            jnp.bfloat16 if node_feats.dtype == jnp.bfloat16 else jnp.float32
        )
    _, rows_np, cols_np, _ = csr.host_arrays()
    cols_c = np.minimum(cols_np, n - 1)

    # No edge-mask multiply: the positional row ranges [bs, be) never cover
    # padding positions (be <= indptr[n]), so garbage weights there are
    # unreachable — and the (E,) mask constant would add tens of MB to the
    # lowered module at scale.
    if weighted:
        wt = jnp.pad(
            w.reshape(cap, heads).astype(jnp.float32),
            ((0, meta.cap_pad - cap), (0, k_pad - heads)),
        ).T  # (K_pad, CAP_pad)

    # Row padding rides the gather indices (an explicit pad would copy
    # the whole (E, F) plane — gigabytes at scale). One shared constant,
    # sliced in-program per segment: per-segment numpy slices would each
    # embed into the lowered module and blow past remote-compile size
    # limits at ogbn scale. At 1e8+ edges even the ONE constant exceeds
    # the relay's request limit (HTTP 413 at ~500 MB) — callers there pass
    # the ids as a jit ARGUMENT via ``src_ids``.
    if src_ids is not None:
        ids = jnp.minimum(
            jnp.asarray(src_ids, jnp.int32).reshape(-1), jnp.int32(n - 1)
        )
        cols_pad = jnp.pad(ids, (0, meta.cap_pad - cap))
    else:
        cols_pad = jnp.asarray(np.pad(cols_c, (0, meta.cap_pad - cap)))

    if f_pad != f_flat:
        # Pad the TABLE once (an O(N)-row copy): gathering 128-lane-aligned
        # rows takes XLA's fast row-block gather path. Gathering the raw
        # f_flat-wide rows measured 7.5x slower at ogbn scale (5.2 s vs
        # 0.70 s for the 47-lane classes plane — 188 B unaligned rows).
        # The barrier is LOAD-BEARING: without it XLA fuses the pad into
        # the gather's operand and the unaligned reads come back (measured
        # 19M rows/s fused vs 86M materialized). docs/PERF.md round 5.
        node_feats = jax.lax.optimization_barrier(
            jnp.pad(node_feats, ((0, 0), (0, f_pad - f_flat)))
        )

    bs3 = meta.bs.reshape(meta.num_blocks, ROW_BLOCK, 1)
    be3 = meta.be.reshape(meta.num_blocks, ROW_BLOCK, 1)

    def _meta_slice(b0, nb_seg, lo, span):
        """Numpy meta arrays for blocks [b0, b0+nb_seg), padded with empty
        blocks past the end, chunk starts re-based to ``lo``; chunk ranges
        are clamped to the segment span (straggler blocks from the next
        segment would otherwise DMA out of the sliced arrays' bounds —
        faults on real hardware)."""
        b1 = min(b0 + nb_seg, meta.num_blocks)
        pad = nb_seg - (b1 - b0)
        astart = np.pad(meta.astart[b0:b1] - np.int32(lo), (0, pad))
        nchunks = np.pad(meta.nchunks[b0:b1], (0, pad))
        room = np.maximum(span - astart, 0) // EDGE_CHUNK
        nchunks = np.minimum(nchunks, room).astype(np.int32)
        bs_s = np.pad(bs3[b0:b1], ((0, pad), (0, 0), (0, 0)))
        be_s = np.pad(be3[b0:b1], ((0, pad), (0, 0), (0, 0)))
        return astart, nchunks, bs_s, be_s

    def call_segment(b0, b1, lo, hi):
        """Run the kernel over row blocks [b0, b1) whose chunk reads cover
        CSR positions [lo, hi) — the gathered-feature plane for one segment
        stays under ``_SEGMENT_BYTES`` regardless of graph size."""
        nb_seg = b1 - b0
        astart_s, nchunks_s, bs_s, be_s = _meta_slice(b0, nb_seg, lo, hi - lo)
        seg_cols = jax.lax.slice(cols_pad, (lo,), (hi,))
        # Gather from the ORIGINAL dtype table (pre-padded to f_pad lanes
        # above), cast on the output: the random reads are transaction-
        # bound (row payload width is free), and the cast fuses into the
        # gather's sequential write.
        gathered = node_feats[seg_cols].astype(feat_dtype)
        in_specs = [
            pl.BlockSpec((1, ROW_BLOCK, 1), lambda rb, ft, *_: (rb, 0, 0)),
            pl.BlockSpec((1, ROW_BLOCK, 1), lambda rb, ft, *_: (rb, 0, 0)),
        ]
        inputs = [astart_s, nchunks_s, bs_s, be_s]
        if weighted:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
            inputs.append(wt[:, lo:hi])
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        inputs.append(gathered)

        out_specs = [pl.BlockSpec((ROW_BLOCK, 128), lambda rb, ft, *_: (rb, ft))]
        out_shape = [
            jax.ShapeDtypeStruct((nb_seg * ROW_BLOCK, f_pad), jnp.float32)
        ]
        if with_denom:
            out_specs.append(
                pl.BlockSpec((ROW_BLOCK, 128), lambda rb, ft, *_: (rb, 0))
            )
            out_shape.append(
                jax.ShapeDtypeStruct((nb_seg * ROW_BLOCK, 128), jnp.float32)
            )

        scratch = []
        if weighted:
            scratch.append(pltpu.VMEM((2, k_pad, EDGE_CHUNK), jnp.float32))
        scratch.append(pltpu.VMEM((2, EDGE_CHUNK, 128), feat_dtype))
        scratch.append(pltpu.VMEM((ROW_BLOCK, 128), jnp.float32))
        if with_denom:
            scratch.append(pltpu.VMEM((ROW_BLOCK, 128), jnp.float32))
        if weighted:
            scratch.append(pltpu.SemaphoreType.DMA((2,)))
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb_seg, f_pad // 128),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        )
        res = pl.pallas_call(
            functools.partial(
                _spmm_rowmask_kernel,
                k_pad=k_pad,
                feats_per_head=f if heads > 1 else 128,
                single_head=heads == 1,
                with_denom=with_denom,
                weighted=weighted,
            ),
            out_shape=tuple(out_shape),
            grid_spec=grid_spec,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * (hi - lo) * f_pad,
                bytes_accessed=(hi - lo)
                * (f_pad * jnp.dtype(feat_dtype).itemsize + (4 * k_pad if weighted else 0))
                + nb_seg * ROW_BLOCK * f_pad * 4,
                transcendentals=0,
            ),
        )(*inputs)
        if with_denom:
            return res
        return res[0], None

    segs = _rowmask_segments(meta, f_pad, jnp.dtype(feat_dtype).itemsize)
    if len(segs) == 1:
        out, den = call_segment(*segs[0])
        out = out[:n, :f_flat]
        if with_denom:
            return out, den[:n, :heads]
        return out, None

    # Multi-segment: all segments share ONE (nb_seg, span) shape so the
    # Mosaic kernel compiles once and is reused — per-segment shapes would
    # pay a full remote kernel compile each (minutes apiece at ogbn scale).
    nb_u = max(b1 - b0 for b0, b1, _, _ in segs)
    span_u = max(hi - lo for _, _, lo, hi in segs)
    outs, dens = [], []
    for b0, b1, lo, hi in segs:
        lo_u = min(lo, max(meta.cap_pad - span_u, 0))
        out_s, den_s = call_segment(b0, b0 + nb_u, lo_u, lo_u + span_u)
        rows = (b1 - b0) * ROW_BLOCK
        outs.append(out_s[:rows])
        if with_denom:
            dens.append(den_s[:rows])
    out = jnp.concatenate(outs, axis=0)
    out = out[:n, :f_flat]
    if with_denom:
        den = jnp.concatenate(dens, axis=0)
        return out, den[:n, :heads]
    return out, None


def spmm_rowmask_traced(
    astart: jnp.ndarray,  # (NB,) int32 — may be traced (shard_map slices)
    nchunks: jnp.ndarray,  # (NB,)
    bs: jnp.ndarray,  # (NB, ROW_BLOCK, 1) int32 chunk-local row starts
    be: jnp.ndarray,  # (NB, ROW_BLOCK, 1)
    w: Optional[jnp.ndarray],  # (cap_pad, heads) CSR-order weights or None
    gathered: jnp.ndarray,  # (cap_pad, F_flat) pre-gathered edge features
    heads: int = 1,
    with_denom: bool = False,
    interpret: bool = False,
):
    """Row-masked (weighted) SpMM over TRACED layout arrays.

    The shard-local variant of ``spmm_rowmask`` for use INSIDE
    ``shard_map``: the per-shard RowBlockMeta arrays arrive as sliced
    device values (stacked by the partitioner), so nothing here may touch
    host numpy. The caller gathers the features itself (sources live in
    the widened [local | halo] space) and handles autodiff (pallas_call
    has no VJP of its own). Single segment — shard subgraphs are bounded
    by the partitioner's uniform capacity. Returns ``(out, denom)`` with
    ``out`` (num_rows_padded, F_pad) f32; slice rows/lanes at the caller.
    """
    nb = astart.shape[0]
    cap_pad = gathered.shape[0]
    f_flat = gathered.shape[1]
    f = f_flat // heads
    if f * heads != f_flat:
        raise ValueError("gathered width must be heads * F")
    if heads > 1 and (128 % f != 0 or f_flat % 128 != 0):
        raise ValueError("multihead tiling needs 128 % F == 0, H*F % 128 == 0")
    if cap_pad % EDGE_CHUNK:
        raise ValueError("gathered leading dim must be EDGE_CHUNK-aligned")
    weighted = w is not None
    if with_denom and not weighted:
        raise ValueError("with_denom requires weights")
    k_pad = max(_round_up(heads, 8), 8)
    f_pad = _round_up(max(f_flat, 128), 128)
    feat_dtype = (
        jnp.bfloat16 if gathered.dtype == jnp.bfloat16 else jnp.float32
    )
    gat = gathered.astype(feat_dtype)
    if f_pad != f_flat:
        gat = jnp.pad(gat, ((0, 0), (0, f_pad - f_flat)))
    if weighted:
        wt = jnp.pad(
            w.reshape(cap_pad, heads).astype(jnp.float32),
            ((0, 0), (0, k_pad - heads)),
        ).T

    in_specs = [
        pl.BlockSpec((1, ROW_BLOCK, 1), lambda rb, ft, *_: (rb, 0, 0)),
        pl.BlockSpec((1, ROW_BLOCK, 1), lambda rb, ft, *_: (rb, 0, 0)),
    ]
    inputs = [astart.astype(jnp.int32), nchunks.astype(jnp.int32), bs, be]
    if weighted:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        inputs.append(wt)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    inputs.append(gat)
    out_specs = [pl.BlockSpec((ROW_BLOCK, 128), lambda rb, ft, *_: (rb, ft))]
    out_shape = [
        jax.ShapeDtypeStruct((nb * ROW_BLOCK, f_pad), jnp.float32)
    ]
    if with_denom:
        out_specs.append(
            pl.BlockSpec((ROW_BLOCK, 128), lambda rb, ft, *_: (rb, 0))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((nb * ROW_BLOCK, 128), jnp.float32)
        )
    scratch = []
    if weighted:
        scratch.append(pltpu.VMEM((2, k_pad, EDGE_CHUNK), jnp.float32))
    scratch.append(pltpu.VMEM((2, EDGE_CHUNK, 128), feat_dtype))
    scratch.append(pltpu.VMEM((ROW_BLOCK, 128), jnp.float32))
    if with_denom:
        scratch.append(pltpu.VMEM((ROW_BLOCK, 128), jnp.float32))
    if weighted:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, f_pad // 128),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    res = pl.pallas_call(
        functools.partial(
            _spmm_rowmask_kernel,
            k_pad=k_pad,
            feats_per_head=f if heads > 1 else 128,
            single_head=heads == 1,
            with_denom=with_denom,
            weighted=weighted,
        ),
        out_shape=tuple(out_shape),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * cap_pad * f_pad,
            bytes_accessed=cap_pad
            * (f_pad * jnp.dtype(feat_dtype).itemsize + (4 * k_pad if weighted else 0))
            + nb * ROW_BLOCK * f_pad * 4,
            transcendentals=0,
        ),
    )(*inputs)
    if with_denom:
        return res
    return res[0], None


def _spmm_sddmm_rowmask_kernel(
    # scalar prefetch
    astart_ref,  # (NB,)
    nchunks_ref,  # (NB,)
    # inputs
    bs_ref,  # (1, ROW_BLOCK, 1) block
    be_ref,  # (1, ROW_BLOCK, 1) block
    w_ref,  # (K_pad, CAP_pad) HBM — weights in THIS CSR's edge order
    g_ref,  # (CAP_pad, F_pad) HBM — gathered cotangents, this CSR's order
    fs_ref,  # (ROW_BLOCK, 128) VMEM block — node features of this block
    # outputs
    out_ref,  # (ROW_BLOCK, 128) block — dh
    dw_ref,  # (K_pad, CAP_pad) HBM — per-edge SDDMM, manual RMW DMA
    # scratch
    w_scratch,  # (2, K_pad, EDGE_CHUNK) f32
    g_scratch,  # (2, EDGE_CHUNK, 128) feat dtype
    acc_scratch,  # (ROW_BLOCK, 128) f32
    dw_scratch,  # (K_pad, EDGE_CHUNK) f32
    rmw_scratch,  # (K_pad, EDGE_CHUNK) f32
    w_sem,
    g_sem,
    dw_sem,  # (2,): [0] read, [1] write
    *,
    k_pad: int,
    feats_per_head: int,
    single_head: bool,
    cap_pad: int,
):
    """Backward transpose pass with the SDDMM folded in.

    One pass computes BOTH backward quantities of a weighted SpMM:

      dh[r]    = sum_e w[e] * g[col_e]          (rows r of this CSR)
      dw[e, h] = <fs[row_e]|_h , g[col_e]|_h>   (per-edge, per-head)

    The fold exploits that in this (transpose) pass the block's rows ARE the
    SDDMM's first operand: ``fs_edge = mask^T @ fs_block`` recovers each
    edge's row features with one extra MXU matmul, so the separate SDDMM's
    two (E, H·F) gathers disappear (ROADMAP round-1 item 1's "real win").
    dw lands in THIS CSR's positional order. Adjacent row blocks' chunk
    grids overlap WITHOUT being mutually 1024-aligned, and feature tiles
    revisit the same regions, so every chunk does read-modify-write DMA
    against a plane the first grid step zeroes; the sequential TPU grid
    makes the RMW race-free.
    """
    rb = pl.program_id(0)
    ft = pl.program_id(1)
    heads_per_tile = 128 // feats_per_head
    a0 = astart_ref[rb]
    nck = nchunks_ref[rb]

    @pl.when(jnp.logical_and(rb == 0, ft == 0))
    def _():
        # Zero the dw plane once, before any RMW visits it. Output buffers
        # are uninitialized memory; partial chunk overlaps make "first
        # writer wins" untrackable, so everyone accumulates instead.
        rmw_scratch[...] = jnp.zeros_like(rmw_scratch)

        def zbody(j, _):
            z = pltpu.make_async_copy(
                rmw_scratch,
                dw_ref.at[:, pl.ds(j * EDGE_CHUNK, EDGE_CHUNK)],
                dw_sem.at[1],
            )
            z.start()
            z.wait()
            return ()

        jax.lax.fori_loop(0, cap_pad // EDGE_CHUNK, zbody, (), unroll=False)

    def dma(slot, i):
        off = pl.multiple_of(a0 + i * EDGE_CHUNK, _ALIGN)
        return (
            pltpu.make_async_copy(
                w_ref.at[:, pl.ds(off, EDGE_CHUNK)],
                w_scratch.at[slot],
                w_sem.at[slot],
            ),
            pltpu.make_async_copy(
                g_ref.at[pl.ds(off, EDGE_CHUNK), pl.ds(ft * 128, 128)],
                g_scratch.at[slot],
                g_sem.at[slot],
            ),
        )

    @pl.when(nck > 0)
    def _():
        for d in dma(0, 0):
            d.start()

    acc_scratch[...] = jnp.zeros_like(acc_scratch)
    pos0 = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, EDGE_CHUNK), 1)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (k_pad, 128), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (k_pad, 128), 1)
    if single_head:
        spread = (h_ids == 0).astype(jnp.float32)
    else:
        spread = (
            h_ids == ft * heads_per_tile + l_ids // feats_per_head
        ).astype(jnp.float32)

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nck)
        def _():
            for d in dma(jax.lax.rem(i + 1, 2), i + 1):
                d.start()

        for d in dma(slot, i):
            d.wait()

        off = pl.multiple_of(a0 + i * EDGE_CHUNK, _ALIGN)
        pos = pos0 + i * EDGE_CHUNK
        feat_dtype = g_scratch.dtype
        m = jnp.logical_and(pos >= bs_ref[0], pos < be_ref[0]).astype(
            feat_dtype
        )
        w_chunk = w_scratch[slot]
        exact = feat_dtype == jnp.float32
        w_lane = jax.lax.dot_general(
            w_chunk,
            spread,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST
                if exact
                else jax.lax.Precision.DEFAULT
            ),
        )
        g_raw = g_scratch[slot]
        if exact:
            scaled = (g_raw.astype(jnp.float32) * w_lane).astype(feat_dtype)
        else:
            scaled = g_raw * w_lane.astype(feat_dtype)
        acc_scratch[...] += jnp.dot(
            m, scaled, preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST if exact
                else jax.lax.Precision.DEFAULT
            ),
        )
        # --- folded SDDMM ---
        # Each edge's row features via a one-hot-column matmul (mask columns
        # have at most one 1): (CHUNK, RB) @ (RB, 128).
        fs_edge = jax.lax.dot_general(
            m,
            fs_ref[...],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST if exact
                else jax.lax.Precision.DEFAULT
            ),
        ).astype(feat_dtype)  # (EDGE_CHUNK, 128)
        prod = fs_edge * g_raw  # (EDGE_CHUNK, 128)
        dw_chunk = jax.lax.dot_general(
            spread.astype(feat_dtype),
            prod,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST if exact
                else jax.lax.Precision.DEFAULT
            ),
        )  # (K_pad, EDGE_CHUNK): per-head lane-group sums
        rd = pltpu.make_async_copy(
            dw_ref.at[:, pl.ds(off, EDGE_CHUNK)],
            rmw_scratch,
            dw_sem.at[0],
        )
        rd.start()
        rd.wait()
        dw_scratch[...] = rmw_scratch[...] + dw_chunk
        wr = pltpu.make_async_copy(
            dw_scratch, dw_ref.at[:, pl.ds(off, EDGE_CHUNK)], dw_sem.at[1]
        )
        wr.start()
        wr.wait()  # next grid step may RMW this region — must be durable
        return ()

    jax.lax.fori_loop(0, nck, body, (), unroll=False)
    out_ref[...] = acc_scratch[...]


def spmm_rowmask_bwd(
    csr: CSR,
    w: jnp.ndarray,  # (capacity, heads) weights in THIS CSR's edge order
    node_feats: jnp.ndarray,  # (N, heads*F) cotangents to aggregate (gu)
    fs: jnp.ndarray,  # (N, heads*F) forward source features (SDDMM operand)
    heads: int = 1,
    interpret: bool = False,
    stream_dtype=None,
    src_ids: Optional[jnp.ndarray] = None,
):
    """Fused backward for the rowmask SpMM: ``(dh, dw)`` in one kernel pass.

    Call on the TRANSPOSE CSR with transpose-order weights:
    ``dh[s] = sum_e w[e] * node_feats[dst_e]`` and
    ``dw[e, h] = <fs[src_e]|_h, node_feats[dst_e]|_h>`` — ``dw`` is returned
    in the SAME (transpose) edge order as ``w``; permute to forward order
    with the shared-eids permutation. Saves the separate SDDMM's two
    (E, H·F) gathers (the transpose pass already gathers the cotangent
    plane, and the block's rows are exactly the SDDMM's other operand).
    """
    meta = row_block_meta(csr)
    n = csr.num_nodes
    cap = csr.capacity
    f_flat = node_feats.shape[-1]
    f = f_flat // heads
    if f * heads != f_flat:
        raise ValueError("node_feats width must be heads * F")
    if heads > 1 and (128 % f != 0 or f_flat % 128 != 0):
        raise ValueError(
            "multihead spmm_rowmask_bwd needs 128 % F == 0 and heads*F % 128 == 0"
        )
    k_pad = max(_round_up(heads, 8), 8)
    f_pad = _round_up(max(f_flat, 128), 128)
    if stream_dtype is not None:
        feat_dtype = stream_dtype
    else:
        feat_dtype = (
            jnp.bfloat16 if node_feats.dtype == jnp.bfloat16 else jnp.float32
        )
    _, rows_np, cols_np, _ = csr.host_arrays()
    cols_c = np.minimum(cols_np, n - 1)
    if src_ids is not None:
        ids = jnp.minimum(
            jnp.asarray(src_ids, jnp.int32).reshape(-1), jnp.int32(n - 1)
        )
        cols_pad = jnp.pad(ids, (0, meta.cap_pad - cap))
    else:
        cols_pad = jnp.asarray(np.pad(cols_c, (0, meta.cap_pad - cap)))

    wt = jnp.pad(
        w.reshape(cap, heads).astype(jnp.float32),
        ((0, meta.cap_pad - cap), (0, k_pad - heads)),
    ).T  # (K_pad, CAP_pad)

    if f_pad != f_flat:
        # Pad the gathered table once, behind an optimization_barrier so
        # the pad MATERIALIZES (same 7.5x finding as spmm_rowmask, r5).
        node_feats = jax.lax.optimization_barrier(
            jnp.pad(node_feats, ((0, 0), (0, f_pad - f_flat)))
        )

    fs_tbl = fs
    if f_pad != f_flat:
        fs_tbl = jnp.pad(fs_tbl, ((0, 0), (0, f_pad - f_flat)))
    fs_tbl = jnp.pad(
        fs_tbl, ((0, meta.num_rows_padded - fs_tbl.shape[0]), (0, 0))
    ).astype(feat_dtype)

    bs3 = meta.bs.reshape(meta.num_blocks, ROW_BLOCK, 1)
    be3 = meta.be.reshape(meta.num_blocks, ROW_BLOCK, 1)

    def _meta_slice(b0, nb_seg, lo, span):
        b1 = min(b0 + nb_seg, meta.num_blocks)
        pad = nb_seg - (b1 - b0)
        astart = np.pad(meta.astart[b0:b1] - np.int32(lo), (0, pad))
        nchunks = np.pad(meta.nchunks[b0:b1], (0, pad))
        # Clamp chunk ranges to the segment span (stragglers from the next
        # segment would otherwise DMA out of the sliced arrays' bounds).
        room = np.maximum(span - astart, 0) // EDGE_CHUNK
        nchunks = np.minimum(nchunks, room).astype(np.int32)
        bs_s = np.pad(bs3[b0:b1], ((0, pad), (0, 0), (0, 0)))
        be_s = np.pad(be3[b0:b1], ((0, pad), (0, 0), (0, 0)))
        return astart.astype(np.int32), nchunks, bs_s, be_s

    def call_segment(b0, nb_seg, lo, hi):
        span = hi - lo
        astart_s, nchunks_s, bs_s, be_s = _meta_slice(b0, nb_seg, lo, span)
        seg_cols = jax.lax.slice(cols_pad, (lo,), (hi,))
        gathered = node_feats[seg_cols].astype(feat_dtype)
        # Uniform multi-segment shapes can overrun the row table; slice what
        # exists and zero-pad the (empty, nchunks==0) straggler blocks.
        hi_row = min((b0 + nb_seg) * ROW_BLOCK, fs_tbl.shape[0])
        fs_seg = jax.lax.slice(fs_tbl, (b0 * ROW_BLOCK, 0), (hi_row, f_pad))
        want = nb_seg * ROW_BLOCK
        if fs_seg.shape[0] < want:
            fs_seg = jnp.pad(fs_seg, ((0, want - fs_seg.shape[0]), (0, 0)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb_seg, f_pad // 128),
            in_specs=[
                pl.BlockSpec((1, ROW_BLOCK, 1), lambda rb, ft, *_: (rb, 0, 0)),
                pl.BlockSpec((1, ROW_BLOCK, 1), lambda rb, ft, *_: (rb, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((ROW_BLOCK, 128), lambda rb, ft, *_: (rb, ft)),
            ],
            out_specs=(
                pl.BlockSpec((ROW_BLOCK, 128), lambda rb, ft, *_: (rb, ft)),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, k_pad, EDGE_CHUNK), jnp.float32),
                pltpu.VMEM((2, EDGE_CHUNK, 128), feat_dtype),
                pltpu.VMEM((ROW_BLOCK, 128), jnp.float32),
                pltpu.VMEM((k_pad, EDGE_CHUNK), jnp.float32),
                pltpu.VMEM((k_pad, EDGE_CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            functools.partial(
                _spmm_sddmm_rowmask_kernel,
                k_pad=k_pad,
                feats_per_head=f if heads > 1 else 128,
                single_head=heads == 1,
                cap_pad=span,
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nb_seg * ROW_BLOCK, f_pad), jnp.float32),
                jax.ShapeDtypeStruct((k_pad, span), jnp.float32),
            ),
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=6 * span * f_pad,
                bytes_accessed=span
                * (f_pad * jnp.dtype(feat_dtype).itemsize + 12 * k_pad)
                + nb_seg * ROW_BLOCK * f_pad * 4,
                transcendentals=0,
            ),
        )(
            astart_s, nchunks_s, bs_s, be_s,
            wt[:, lo:hi], gathered, fs_seg,
        )

    segs = _rowmask_segments(meta, f_pad, jnp.dtype(feat_dtype).itemsize)
    # EDGE_CHUNK-align segment bounds: the kernel zeroes/walks the dw span
    # in whole chunks (cap_pad itself is chunk-aligned).
    segs = [
        (b0, b1, (lo // EDGE_CHUNK) * EDGE_CHUNK,
         min(_round_up(hi, EDGE_CHUNK), meta.cap_pad))
        for b0, b1, lo, hi in segs
    ]
    if len(segs) == 1:
        b0, b1, lo, hi = segs[0]
        dh, dw_t = call_segment(b0, b1 - b0, lo, hi)
        dw = dw_t[:heads, :cap].T  # (cap, heads), this CSR's edge order
        return dh[:n, :f_flat], dw

    nb_u = max(b1 - b0 for b0, b1, _, _ in segs)
    span_u = max(hi - lo for _, _, lo, hi in segs)
    outs = []
    dw_full = jnp.zeros((k_pad, meta.cap_pad), jnp.float32)
    prev_hi = 0
    for b0, b1, lo, hi in segs:
        lo_u = min(lo, max(meta.cap_pad - span_u, 0))
        dh_s, dw_s = call_segment(b0, nb_u, lo_u, lo_u + span_u)
        rows = (b1 - b0) * ROW_BLOCK
        outs.append(dh_s[:rows])
        # Stitch dw: within [lo_u, lo_u+span_u), positions before prev_hi
        # already hold earlier segments' contributions — add the overlap.
        seg_lo = max(lo_u, 0)
        keep = jax.lax.dynamic_slice(
            dw_full, (0, seg_lo), (k_pad, span_u)
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (1, span_u), 1) + seg_lo
        merged = jnp.where(col < prev_hi, keep + dw_s, dw_s)
        dw_full = jax.lax.dynamic_update_slice(dw_full, merged, (0, seg_lo))
        prev_hi = max(prev_hi, lo_u + span_u)
    dh = jnp.concatenate(outs, axis=0)[:n, :f_flat]
    dw = dw_full[:heads, :cap].T
    return dh, dw


# ---------------------------------------------------------------------------
# Row-id-masked SpMM over TRACED dynamic stores (PMA / flat delta).
# ---------------------------------------------------------------------------


def traced_block_meta(
    rows_flat: jnp.ndarray, num_nodes: int, chunk: int = EDGE_CHUNK
):
    """Per-row-block (astart, nchunks) from a TRACED flat edge store.

    Works for any "live-sorted" flat layout: live entries (row < n) are
    globally nondecreasing by row, with sentinel slots (row == n)
    interspersed anywhere — the PMA store's chunk tails, or the flat delta
    store's tail padding. No scatters: two monotone envelopes
    (prefix-max / suffix-min of the live block ids) turn the gapped layout
    into sorted arrays that ``searchsorted`` can bisect.

    Returns ``(astart, nchunks)`` of shape (NB,) int32 where NB covers
    ``num_nodes`` rounded up to ROW_BLOCK; chunk reads span
    ``[astart, astart + nchunks*chunk)`` and the consuming kernel's row-id
    mask discards out-of-block and sentinel positions. The flat arrays the
    kernel streams must be padded to at least
    ``round_up(cap, chunk) + chunk`` so the aligned-down start cannot read
    out of bounds.

    Reference counterpart: the GPMA template reads the PMA key array
    directly and skips sentinel slots in-kernel
    (``stgraph/compiler/code_gen/templates/fa/tpl_fa_gpma.jinja:29-44``);
    this is that capability for traced, in-scan stores.
    """
    n = int(num_nodes)
    nb = max(_round_up(n, ROW_BLOCK), ROW_BLOCK) // ROW_BLOCK
    rows = rows_flat.astype(jnp.int32)
    live = rows < n
    blk = rows // ROW_BLOCK
    lo_env = jax.lax.associative_scan(
        jnp.maximum, jnp.where(live, blk, -1)
    )  # nondecreasing; lo_env[p] = max live blk at position <= p
    hi_env = jax.lax.associative_scan(
        jnp.minimum, jnp.where(live, blk, nb), reverse=True
    )  # nondecreasing; hi_env[p] = min live blk at position >= p
    bids = jnp.arange(nb, dtype=jnp.int32)
    starts = jnp.searchsorted(lo_env, bids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(hi_env, bids, side="right").astype(jnp.int32)
    astart = (starts // _ALIGN) * _ALIGN
    span = jnp.maximum(ends - astart, 0)
    nchunks = jnp.where(
        ends > starts, (span + chunk - 1) // chunk, 0
    ).astype(jnp.int32)
    return astart, nchunks


def _spmm_rowid_kernel(
    astart_ref,  # (NB,) scalar prefetch (traced values allowed)
    nchunks_ref,  # (NB,)
    w_ref,  # (K_pad, CAP_pad) HBM f32: rows [0,h) weights, row h = row ids
    feats_ref,  # (CAP_pad, F_pad) HBM gathered features (flat store order)
    *refs,  # out_ref [, den_ref], scratches, sems
    k_pad: int,
    heads: int,
    feats_per_head: int,
    single_head: bool,
    with_denom: bool,
    weighted: bool,
):
    """Row-ID-masked fused SpMM: the mask comes from the row-id stream.

    One f32 equality compare replaces the positional kernels' two range
    compares AND tolerates interspersed sentinel slots (row id == n matches
    no real block row; blocks past n are sliced off by the caller). Row ids
    ride the spare rows of the (K_pad, E) weight stream as exact f32
    (requires num_nodes < 2^24), so the mask costs no extra DMA stream.
    """
    refs = list(refs)
    out_ref = refs.pop(0)
    den_ref = refs.pop(0) if with_denom else None
    w_scratch = refs.pop(0)
    feat_scratch = refs.pop(0)
    acc_scratch = refs.pop(0)
    den_scratch = refs.pop(0) if with_denom else None
    w_sem = refs.pop(0)
    feat_sem = refs.pop(0)

    rb = pl.program_id(0)
    ft = pl.program_id(1)
    heads_per_tile = 128 // feats_per_head
    a0 = astart_ref[rb]
    nck = nchunks_ref[rb]
    r0 = (rb * ROW_BLOCK).astype(jnp.float32)

    def dma(slot, i):
        off = pl.multiple_of(a0 + i * EDGE_CHUNK, _ALIGN)
        return (
            pltpu.make_async_copy(
                w_ref.at[:, pl.ds(off, EDGE_CHUNK)],
                w_scratch.at[slot],
                w_sem.at[slot],
            ),
            pltpu.make_async_copy(
                feats_ref.at[pl.ds(off, EDGE_CHUNK), pl.ds(ft * 128, 128)],
                feat_scratch.at[slot],
                feat_sem.at[slot],
            ),
        )

    @pl.when(nck > 0)
    def _():
        for d in dma(0, 0):
            d.start()

    acc_scratch[...] = jnp.zeros_like(acc_scratch)
    if with_denom:

        @pl.when(ft == 0)
        def _():
            den_scratch[...] = jnp.zeros_like(den_scratch)

    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (ROW_BLOCK, EDGE_CHUNK), 0
    ).astype(jnp.float32)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (k_pad, 128), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (k_pad, 128), 1)
    if weighted:
        if single_head:
            spread = (h_ids == 0).astype(jnp.float32)
        else:
            spread = (
                h_ids == ft * heads_per_tile + l_ids // feats_per_head
            ).astype(jnp.float32)

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nck)
        def _():
            for d in dma(jax.lax.rem(i + 1, 2), i + 1):
                d.start()

        for d in dma(slot, i):
            d.wait()

        feat_dtype = feat_scratch.dtype
        exact = feat_dtype == jnp.float32
        # Row-id mask: rowids ride w row `heads` as exact f32.
        rowid = w_scratch[slot, heads : heads + 1, :]  # (1, EDGE_CHUNK)
        m = ((rowid - r0) == row_iota).astype(
            feat_dtype
        )  # (ROW_BLOCK, EDGE_CHUNK); sentinels (id n) match no real row
        if weighted:
            w_chunk = w_scratch[slot]  # (K_pad, EDGE_CHUNK)
            w_lane = jax.lax.dot_general(
                w_chunk,
                spread,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(
                    jax.lax.Precision.HIGHEST
                    if exact
                    else jax.lax.Precision.DEFAULT
                ),
            )  # (EDGE_CHUNK, 128)
            if exact:
                scaled = (
                    feat_scratch[slot].astype(jnp.float32) * w_lane
                ).astype(feat_dtype)
            else:
                scaled = feat_scratch[slot] * w_lane.astype(feat_dtype)
        else:
            scaled = feat_scratch[slot]
        acc_scratch[...] += jnp.dot(
            m, scaled, preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST if exact
                else jax.lax.Precision.DEFAULT
            ),
        )
        if with_denom:

            @pl.when(ft == 0)
            def _():
                den_scratch[:, :k_pad] += jax.lax.dot_general(
                    m.astype(jnp.float32),
                    w_chunk,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
        return ()

    jax.lax.fori_loop(0, nck, body, (), unroll=False)
    out_ref[...] = acc_scratch[...]
    if with_denom:
        den_ref[...] = den_scratch[...]


def spmm_rowid_traced(
    rows_flat: jnp.ndarray,  # (cap_pad,) int32, live-sorted w/ sentinels
    w_flat: Optional[jnp.ndarray],  # (cap_pad,) or (cap_pad, H) or None
    gathered: jnp.ndarray,  # (cap_pad, F_flat) features in store order
    num_nodes: int,
    heads: int = 1,
    with_denom: bool = False,
    interpret: bool = False,
):
    """Fused (weighted) SpMM over a TRACED flat dynamic store.

    Everything may be traced (PMA store inside ``lax.scan``): block spans
    come from ``traced_block_meta``, the selection mask from the row-id
    stream. ``cap_pad`` must be EDGE_CHUNK-aligned with at least one chunk
    of slack past the last live entry (see ``traced_block_meta``);
    ``num_nodes < 2^24`` (row ids ride an f32 lane). Sentinel slots must
    carry finite weights (the store pads with 0) and ``gathered`` rows must
    be finite (clamp gather ids). Returns ``(out, denom)`` with ``out``
    (num_rows_padded, F_pad) f32 — slice rows/lanes at the caller; no
    custom VJP here (see ``ops.dyn_spmm`` for the differentiable wrapper).
    """
    cap_pad = gathered.shape[0]
    if cap_pad % EDGE_CHUNK:
        raise ValueError("gathered leading dim must be EDGE_CHUNK-aligned")
    n = int(num_nodes)
    if n >= (1 << 24):
        raise ValueError("row-id f32 lanes require num_nodes < 2^24")
    f_flat = gathered.shape[1]
    f = f_flat // heads
    if f * heads != f_flat:
        raise ValueError("gathered width must be heads * F")
    if heads > 1 and (128 % f != 0 or f_flat % 128 != 0):
        raise ValueError("multihead tiling needs 128 % F == 0, H*F % 128 == 0")
    weighted = w_flat is not None
    if with_denom and not weighted:
        raise ValueError("with_denom requires weights")
    k_pad = max(_round_up(heads + 1, 8), 8)  # +1: the row-id row
    f_pad = _round_up(max(f_flat, 128), 128)
    feat_dtype = (
        jnp.bfloat16 if gathered.dtype == jnp.bfloat16 else jnp.float32
    )
    nb = max(_round_up(n, ROW_BLOCK), ROW_BLOCK) // ROW_BLOCK
    astart, nchunks = traced_block_meta(rows_flat, n)

    gat = gathered.astype(feat_dtype)
    if f_pad != f_flat:
        gat = jnp.pad(gat, ((0, 0), (0, f_pad - f_flat)))
    # Weight stream rows [0, heads) = weights; row `heads` = row ids (f32,
    # exact for n < 2^24); remaining rows zero.
    if weighted:
        w2 = w_flat.reshape(cap_pad, -1).astype(jnp.float32)
        if w2.shape[1] != heads:
            raise ValueError("w_flat trailing dim must equal heads")
    else:
        w2 = jnp.ones((cap_pad, heads), jnp.float32)
    wt = jnp.concatenate(
        [
            w2,
            rows_flat.astype(jnp.float32).reshape(cap_pad, 1),
            jnp.zeros((cap_pad, k_pad - heads - 1), jnp.float32),
        ],
        axis=1,
    ).T  # (K_pad, CAP_pad)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    out_specs = [pl.BlockSpec((ROW_BLOCK, 128), lambda rb, ft, *_: (rb, ft))]
    out_shape = [jax.ShapeDtypeStruct((nb * ROW_BLOCK, f_pad), jnp.float32)]
    if with_denom:
        out_specs.append(
            pl.BlockSpec((ROW_BLOCK, 128), lambda rb, ft, *_: (rb, 0))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((nb * ROW_BLOCK, 128), jnp.float32)
        )
    scratch = [
        pltpu.VMEM((2, k_pad, EDGE_CHUNK), jnp.float32),
        pltpu.VMEM((2, EDGE_CHUNK, 128), feat_dtype),
        pltpu.VMEM((ROW_BLOCK, 128), jnp.float32),
    ]
    if with_denom:
        scratch.append(pltpu.VMEM((ROW_BLOCK, 128), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, f_pad // 128),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    res = pl.pallas_call(
        functools.partial(
            _spmm_rowid_kernel,
            k_pad=k_pad,
            heads=heads,
            feats_per_head=f if heads > 1 else 128,
            single_head=heads == 1,
            with_denom=with_denom,
            weighted=weighted,
        ),
        out_shape=tuple(out_shape),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * cap_pad * f_pad,
            bytes_accessed=cap_pad
            * (f_pad * jnp.dtype(feat_dtype).itemsize + 4 * k_pad)
            + nb * ROW_BLOCK * f_pad * 4,
            transcendentals=0,
        ),
    )(astart, nchunks, wt, gat)
    if with_denom:
        return res
    return res[0], None


def _rowmask_segments(meta: RowBlockMeta, f_pad: int, itemsize: int):
    """Partition row blocks into (b0, b1, lo, hi) segments whose gathered
    feature plane fits ``_SEGMENT_BYTES``. lo/hi are 128-aligned CSR
    positions (astart and chunk ends are 128-aligned by construction).

    The row budget backs off 128 rows from the byte boundary: XLA's
    row gather has a measured ~2.2x performance cliff at certain plane
    sizes — in particular the saturated power-of-two budget (a
    (2^21, 128) bf16 plane gathers at 92M rows/s where (2^21 ± 128, 128)
    gathers at 206M; docs/PERF.md round-4 section). Saturated segments
    land exactly on the budget, so the budget itself must be a
    measured-fast size."""
    astart = meta.astart.astype(np.int64)
    ends = astart + meta.nchunks.astype(np.int64) * EDGE_CHUNK
    nb = meta.num_blocks
    budget = max(
        _SEGMENT_BYTES // max(f_pad * itemsize, 1) - 128, EDGE_CHUNK
    )
    segs = []
    b0 = 0
    while b0 < nb:
        lo = int(astart[b0])
        hi = int(ends[b0])
        b1 = b0 + 1
        while b1 < nb and max(hi, int(ends[b1])) - lo <= budget:
            hi = max(hi, int(ends[b1]))
            b1 += 1
        hi = min(max(hi, lo + EDGE_CHUNK), meta.cap_pad)
        lo = min(lo, hi - EDGE_CHUNK)  # keep >= one chunk in range
        segs.append((b0, b1, lo, hi))
        b0 = b1
    if not segs:
        segs.append((0, 0, 0, EDGE_CHUNK))
    return segs
