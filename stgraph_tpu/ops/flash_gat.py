"""Flash-GAT: fully fused segment-softmax attention, no (E, H) tensors.

The round-2 GAT pipeline still materialized per-edge logits and softmax
weights in HBM and paid three narrow random gathers per step — measured at
~9.7 ms EACH for an (E, 8) gather at E=2M (narrow rows waste the HBM
transaction; docs/PERF.md). This module removes all of them:

  * **The stability max factors through the graph.** ``leaky_relu`` is
    monotone, so ``max_e leaky(el[src_e] + er[d]) = leaky(max_e el[src_e]
    + er[d])`` — bitwise-exactly (float add is monotone and the winning
    edge's sum is the same float). The per-destination max therefore needs
    only a narrow segment-max over ``el[cols]``, which is *sliced out of
    the feature gather plane* rather than gathered separately.
  * **Source-side scores ride the feature gather.** The per-edge random
    row fetch is transaction-bound, so appending lanes to the gathered row
    is nearly free: the forward plane is ``[feat_src | el_hi | el_lo]``
    (hi/lo bf16 split reconstructs ~17 mantissa bits when streaming bf16).
    The softmax weight ``w = exp(min(leaky(el+er) - m, 0))`` is computed
    INSIDE the aggregation kernel; destination-side quantities (er, m) are
    ROW-BLOCK inputs recovered per edge with a one-hot mask matmul. The
    min-0 clamp is exact for real edges (m is the exact max) and bounds
    the exp of out-of-block garbage positions the row masks discard.
  * **Backward: single edge pass (round 5, every stage measured).**
    The softmax VJP needs four reductions: d feat (by src), dl (by src),
    der (by dst), and the per-edge SDDMM ``dw = <fs[src], gu[dst]>``.
    Pass B (transpose CSR, rows = src) handles the src-grouped pair over
    a fresh gather plane ``[gu | er | m | c]`` (hi/lo pairs) — measured
    14.9 ms at E=2M. For ``der`` (dst-grouped) the FORWARD kernel
    accumulates ``u[d] = Σ w·lp·q·fs[src]`` and ``p[d] = Σ w·lp`` (one
    extra accumulator matmul + two den lanes, +3.6 ms measured) and der
    distributes through the dot product::

        der[d] = Σ_e w·lp·(q·dw − c[d]) = <gu[d], u[d]> − c[d]·p[d]

    — node-table glue, no second edge pass, no saved plane. (A hybrid
    that kept a saved-plane backward pass A for the non-segmented case
    was reverted in round 5: the bench that favored it consumed only
    the feature gradient, letting XLA DCE pass A out of the measured
    baseline; with all three gradients consumed pass A costs a measured
    5.28 ms > the 3.6 ms forward aux, and dropping it frees the
    ~1.5 GB saved-plane residual at E=2M.)

    No pass writes any per-edge tensor to HBM, so there is no
    read-modify-write dw plane and no (E, 8) permutation gathers either.

Reference counterpart: the fully fused generated GAT kernels
(``stgraph/compiler/code_gen/templates/fa/tpl_fa_csr.jinja:28-45``) plus
the sympy peephole's reuse of materialized softmax sums
(``stgraph/compiler/passes/peephole.py``) — here the peephole's closed
form is ``c[d] = <g[d], out[d]> / denom[d]`` and the whole softmax VJP is
re-derived scatter-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stgraph_tpu.graph.blocked import EDGE_CHUNK, ROW_BLOCK
from stgraph_tpu.graph.csr import CSR
from stgraph_tpu.ops.segment_pallas import (
    RowBlockMeta,
    _ALIGN,
    _round_up,
    _rowmask_segments,
    row_block_meta,
    segment_max_narrow,
)

__all__ = [
    "flash_gat_attention",
    "flash_supported",
    "FLASH_MAX_PLANE_BYTES",
    "edge_keep_mask",
]

# Above this forward-plane size the caller should fall back to the
# segment-streaming composed path (the flash plane is held as a residual).
FLASH_MAX_PLANE_BYTES = 6 * 1024**3

_SIDE = 128  # extra lane tile appended to each gather plane

# Edge-chunk granularity of the flash kernels (independent of the
# rowmask kernels' EDGE_CHUNK): larger chunks amortize the per-chunk
# mask/score fixed costs; VMEM cost is 2 slabs of (chunk, f_pad+128).
_FLASH_CHUNK = EDGE_CHUNK

# Bench-only knob (benchmarking/micro/flash_gat_bench.py): "A" or "B"
# skips that backward pass (its outputs become zeros), so the pass's cost
# is measured as full - skipped. Never set in production code.
_SKIP_BWD_PASS = None


def flash_supported(heads: int, f: int) -> bool:
    """Tiling constraints: whole head groups per 128-lane tile, and the
    pass-B side tile must hold six h-wide hi/lo fields."""
    if heads < 1 or f < 1:
        return False
    if heads == 1:
        return f % 128 == 0 or f <= 128
    return 128 % f == 0 and (heads * f) % 128 == 0 and 6 * heads <= _SIDE


def edge_keep_mask(
    src_ids, dst_ids, seed, heads: int, rate: float
) -> jnp.ndarray:
    """(E, heads) f32 dropout keep-mask from a stateless (src, dst, head,
    seed) hash — values are 0 or 1/(1-rate) (inverted-dropout scaling).

    Order-independence is the point: the transpose-CSR backward pass
    regenerates the SAME per-edge mask by hashing its own (rows, cols)
    arrays — no (E, H) permutation gather between edge orders (measured
    ~9.7 ms each at E=2M, docs/PERF.md). The hash is a murmur3-style
    finalizer over the packed endpoints; its bits are i.i.d.-uniform enough
    for dropout (tests pin per-edge keep probability).
    """
    src = jnp.asarray(src_ids).astype(jnp.uint32)
    dst = jnp.asarray(dst_ids).astype(jnp.uint32)
    seed = jnp.asarray(seed).astype(jnp.uint32)
    k = (
        src * jnp.uint32(0x9E3779B9)
        ^ dst * jnp.uint32(0x85EBCA6B)
        ^ (seed + jnp.uint32(0x27D4EB2F))
    )
    hs = jnp.arange(heads, dtype=jnp.uint32) * jnp.uint32(0x165667B1)
    x = k[:, None] + hs[None, :]
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    u = (x >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
    keep = u >= jnp.float32(rate)
    return jnp.where(keep, jnp.float32(1.0 / (1.0 - rate)), 0.0)


def _hi_lo(x: jnp.ndarray, stream_bf16: bool):
    """Split f32 columns into (hi, lo) so a bf16 plane keeps ~17 mantissa
    bits; the f32 plane carries (x, 0)."""
    if not stream_bf16:
        return x, jnp.zeros_like(x)
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _spreads(h: int, f: int, n_ft: int):
    """spread[t][k, l] = 1 iff lane l of feature tile t belongs to head k.

    Built from iotas (in-kernel; pallas kernels cannot capture array
    constants)."""
    out = []
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (h, 128), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (h, 128), 1)
    for t in range(n_ft):
        if h == 1:
            m = jnp.ones((1, 128), jnp.float32)
        else:
            hpt = 128 // f
            m = (k_ids == t * hpt + l_ids // f).astype(jnp.float32)
        out.append(m)
    return out


def _mask(bs, be, pos0, base):
    pos = pos0 + base
    return jnp.logical_and(pos >= bs, pos < be)


def _q_transpose(q_chunk: jnp.ndarray, h: int, ch: int) -> jnp.ndarray:
    """(h_pad, CHUNK) dropout stream chunk -> (CHUNK, h) via a one-pass
    exact transpose matmul (identity is one-hot, HIGHEST keeps it exact)."""
    hp = q_chunk.shape[0]
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (hp, hp), 0)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (hp, hp), 1)
    eye = (i_ids == j_ids).astype(jnp.float32)
    qt = jax.lax.dot_general(
        q_chunk,
        eye,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (CHUNK, h_pad)
    return qt[:, :h]


def _flash_fwd_kernel(
    astart_ref,
    nchunks_ref,
    bs_ref,  # (1, 1, ROW_BLOCK) block of per-row chunk-local ranges
    be_ref,
    side_ref,  # (ROW_BLOCK, 2h) f32: [er | m]
    plane_ref,  # (CAP_pad, f_flat + 128) HBM
    *refs,  # [q_ref], out_ref, den_ref, [u_ref], slab, acc, den_acc,
    #         [u_acc], sem, [q_scr, q_sem]
    h: int,
    f: int,
    f_flat: int,
    n_ft: int,
    slope: float,
    ch: int,
    dropped: bool = False,
    bwd_aux: bool = False,
):
    """Forward flash kernel. With ``bwd_aux`` it additionally emits the
    der-precursor aggregations ``u[d] = Σ w·lp·q·fs[src]`` (third output,
    f_flat lanes) and ``p[d] = Σ w·lp`` (den lanes [h, 2h)) — see module
    docstring: these make backward pass A unnecessary. The output is
    normalized in-kernel (each row block owns ALL its CSR row's edges, so
    ``den_acc`` is the complete softmax denominator at loop exit)."""
    refs = list(refs)
    q_ref = refs.pop(0) if dropped else None
    if bwd_aux:
        out_ref, den_ref, u_ref, slab, acc, den_acc, u_acc, sem = refs[:8]
        rest = refs[8:]
    else:
        out_ref, den_ref, slab, acc, den_acc, sem = refs[:6]
        u_ref = u_acc = None
        rest = refs[6:]
    q_scr, q_sem = (rest[0], rest[1]) if dropped else (None, None)
    rb = pl.program_id(0)
    a0 = astart_ref[rb]
    nck = nchunks_ref[rb]
    sdt = slab.dtype
    # TPU DEFAULT f32 matmuls run as ONE bf16 pass (~0.8% error —
    # measured); the f32 stream exists for precision, so raise it.
    prec = (
        jax.lax.Precision.HIGHEST
        if sdt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def dma(slot, i):
        off = pl.multiple_of(a0 + i * ch, _ALIGN)
        copies = [
            pltpu.make_async_copy(
                plane_ref.at[pl.ds(off, ch), :], slab.at[slot], sem.at[slot]
            )
        ]
        if dropped:
            copies.append(
                pltpu.make_async_copy(
                    q_ref.at[:, pl.ds(off, ch)], q_scr.at[slot],
                    q_sem.at[slot],
                )
            )
        return copies

    @pl.when(nck > 0)
    def _():
        for d in dma(0, 0):
            d.start()

    acc[...] = jnp.zeros_like(acc)
    den_acc[...] = jnp.zeros_like(den_acc)
    if bwd_aux:
        u_acc[...] = jnp.zeros_like(u_acc)
    pos0 = jax.lax.broadcasted_iota(jnp.int32, (ch, ROW_BLOCK), 0)
    spreads = _spreads(h, f, n_ft)

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nck)
        def _():
            for d in dma(jax.lax.rem(i + 1, 2), i + 1):
                d.start()

        for d in dma(slot, i):
            d.wait()
        mb = _mask(bs_ref[0], be_ref[0], pos0, i * ch)  # (CHUNK, ROW_BLOCK)
        m32 = mb.astype(jnp.float32)
        msd = mb.astype(sdt)
        sl = slab[slot]
        el = sl[:, f_flat : f_flat + h].astype(jnp.float32) + sl[
            :, f_flat + h : f_flat + 2 * h
        ].astype(jnp.float32)  # (CHUNK, h)
        erm = jax.lax.dot_general(
            m32,
            side_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (CHUNK, 2h): one-hot columns -> exact per-edge er/m
        s0 = el + erm[:, :h]
        s = jnp.where(s0 >= 0, s0, slope * s0)
        # Exact for real edges (m is the exact segment max, so s - m <= 0);
        # bounds garbage positions (mask 0) so no inf reaches the matmul.
        w = jnp.exp(jnp.minimum(s - erm[:, h:], 0.0))  # (CHUNK, h) f32
        qt = _q_transpose(q_scr[slot], h, ch) if dropped else None
        # Denominator uses the UNdropped weights (DGL semantics: dropout on
        # the normalized coefficients); the numerator uses q-scaled ones.
        # With bwd_aux the same dot also accumulates p = Σ w·lp (lanes
        # [h, 2h)) — the leaky-slope-weighted denominator der needs.
        if bwd_aux:
            wlp = w * jnp.where(s0 >= 0, 1.0, slope)
            den_in = jnp.concatenate([w, wlp], axis=1)  # (CHUNK, 2h)
            den_acc[:, : 2 * h] += jax.lax.dot_general(
                m32, den_in, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        else:
            den_acc[:, :h] += jax.lax.dot_general(
                m32, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        wq = w * qt if dropped else w
        # ONE spread dot + ONE selection matmul across all feature tiles
        # (measured: -12% kernel time vs per-tile dots, flash_ablate.py).
        spread_all = jnp.concatenate(spreads, axis=1)  # (h, f_flat)
        w_lane = jax.lax.dot_general(
            wq,
            spread_all,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (CHUNK, f_flat)
        tiles = sl[:, :f_flat]
        if sdt == jnp.float32:
            scaled = tiles * w_lane
        else:
            scaled = tiles * w_lane.astype(sdt)
        acc[...] += jax.lax.dot_general(
            msd, scaled, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if bwd_aux:
            # u = Σ w·lp·q·fs[src]: second accumulator, same mask matmul.
            uw = wlp * qt if dropped else wlp
            u_lane = jax.lax.dot_general(
                uw, spread_all, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            scaled_u = tiles * (
                u_lane if sdt == jnp.float32 else u_lane.astype(sdt)
            )
            u_acc[...] += jax.lax.dot_general(
                msd, scaled_u, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        return ()

    jax.lax.fori_loop(0, nck, body, (), unroll=False)
    # In-kernel softmax normalization: den_acc is COMPLETE here (a row
    # block owns every edge of its rows), so the former (N, f) divide
    # pass outside the kernel collapses into this epilogue.
    spread_all = jnp.concatenate(spreads, axis=1)
    den_lane = jax.lax.dot_general(
        den_acc[:, :h], spread_all, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (ROW_BLOCK, f_flat) — per-head denominator broadcast to its lanes
    out_ref[...] = acc[...] / jnp.maximum(
        den_lane, jnp.finfo(jnp.float32).tiny
    )
    den_ref[...] = den_acc[...]
    if bwd_aux:
        u_ref[...] = u_acc[...]


def _flash_bwd_b_kernel(
    astart_ref,
    nchunks_ref,
    bs_ref,
    be_ref,
    el_ref,  # (ROW_BLOCK, h) f32 — src-row scores
    fs_ref,  # (ROW_BLOCK, f_flat) sdt — src-row forward features
    plane_ref,  # (CAP_pad, f_flat + 128) HBM: [gu | er±, m±, c±]
    *refs,  # [q_ref], dfs_ref, dl_ref, slab, dfs_acc, dl_acc, sem, [q_scr, q_sem]
    h: int,
    f: int,
    f_flat: int,
    n_ft: int,
    slope: float,
    ch: int,
    dropped: bool = False,
):
    """Pass B (transpose CSR, rows = sources): d feat_src and dl.

    The destination-side fields (er, m, c) ride the gather plane as hi/lo
    lane pairs; el comes from the row block. w is recomputed bit-compatibly
    with the forward (same m, same clamp), then one pass aggregates
    ``d feat_src = sum (q·w) * gu`` and ``dl = sum ds0`` per source row,
    with the SDDMM again folded in registers. With dropout the keep mask is
    REGENERATED in this CSR's edge order by the caller (stateless
    (src, dst, head) hash — no permutation between orders) and streamed.
    """
    refs = list(refs)
    q_ref = refs.pop(0) if dropped else None
    dfs_ref, dl_ref, slab, dfs_acc, dl_acc, sem = refs[:6]
    q_scr, q_sem = (refs[6], refs[7]) if dropped else (None, None)
    rb = pl.program_id(0)
    a0 = astart_ref[rb]
    nck = nchunks_ref[rb]
    sdt = slab.dtype
    # TPU DEFAULT f32 matmuls run as ONE bf16 pass (~0.8% error —
    # measured); the f32 stream exists for precision, so raise it.
    prec = (
        jax.lax.Precision.HIGHEST
        if sdt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def dma(slot, i):
        off = pl.multiple_of(a0 + i * ch, _ALIGN)
        copies = [
            pltpu.make_async_copy(
                plane_ref.at[pl.ds(off, ch), :], slab.at[slot], sem.at[slot]
            )
        ]
        if dropped:
            copies.append(
                pltpu.make_async_copy(
                    q_ref.at[:, pl.ds(off, ch)], q_scr.at[slot],
                    q_sem.at[slot],
                )
            )
        return copies

    @pl.when(nck > 0)
    def _():
        for d in dma(0, 0):
            d.start()

    dfs_acc[...] = jnp.zeros_like(dfs_acc)
    dl_acc[...] = jnp.zeros_like(dl_acc)
    pos0 = jax.lax.broadcasted_iota(jnp.int32, (ch, ROW_BLOCK), 0)
    spreads = _spreads(h, f, n_ft)

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nck)
        def _():
            for d in dma(jax.lax.rem(i + 1, 2), i + 1):
                d.start()

        for d in dma(slot, i):
            d.wait()
        mb = _mask(bs_ref[0], be_ref[0], pos0, i * ch)  # (CHUNK, ROW_BLOCK)
        m32 = mb.astype(jnp.float32)
        msd = mb.astype(sdt)
        sl = slab[slot]

        def pair(j):
            lo = f_flat + 2 * j * h
            return sl[:, lo : lo + h].astype(jnp.float32) + sl[
                :, lo + h : lo + 2 * h
            ].astype(jnp.float32)

        er_e, m_e, c_e = pair(0), pair(1), pair(2)
        el_e = jax.lax.dot_general(
            m32,
            el_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (CHUNK, h)
        s = el_e + er_e
        lp = jnp.where(s >= 0, 1.0, slope)
        s = jnp.where(s >= 0, s, slope * s)
        w = jnp.exp(jnp.minimum(s - m_e, 0.0))
        qt = _q_transpose(q_scr[slot], h, ch) if dropped else None
        wq = w * qt if dropped else w
        # Combined across feature tiles: one spread dot, one aggregation
        # matmul, one recovery dot, one SDDMM dot.
        spread_all = jnp.concatenate(spreads, axis=1)  # (h, f_flat)
        w_lane = jax.lax.dot_general(
            wq,
            spread_all,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (CHUNK, f_flat)
        gu_all = sl[:, :f_flat]
        if sdt == jnp.float32:
            scaled = gu_all * w_lane
        else:
            scaled = gu_all * w_lane.astype(sdt)
        dfs_acc[...] += jax.lax.dot_general(
            msd, scaled, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        fs_all = jax.lax.dot_general(
            msd,
            fs_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(sdt)  # (CHUNK, f_flat) per-edge src features
        prod = fs_all * gu_all
        dw = jax.lax.dot_general(
            prod.astype(jnp.float32),
            spread_all,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        if dropped:
            dw = dw * qt
        ds0 = w * (dw - c_e) * lp
        dl_acc[:, :h] += jax.lax.dot_general(
            m32,
            ds0,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        return ()

    jax.lax.fori_loop(0, nck, body, (), unroll=False)
    dfs_ref[...] = dfs_acc[...]
    dl_ref[...] = dl_acc[...]


def _common_specs(meta: RowBlockMeta):
    # meta's native (NB, 1, ROW_BLOCK) layout: Mosaic-legal blocks
    # ((1, 1, ROW_BLOCK) — trailing dims equal the array's), only 8x
    # sublane padding (~75 MB at ogbn scale). The former
    # (NB, ROW_BLOCK, 1) layout lane-padded its size-1 minor dim to 128 —
    # 2.33 GB of constant literals, the measured ogbn OOM; the kernels
    # consume the row dim TRANSPOSED (mask is (CHUNK, ROW_BLOCK)).
    return meta.bs, meta.be


def _seg_meta(meta: RowBlockMeta, b0: int, nb_seg: int, lo: int, span: int):
    """Host meta for row blocks [b0, b0+nb_seg) over re-based CSR positions
    [lo, lo+span); straggler blocks past the end are padded empty and chunk
    counts are clamped to the span (same contract as the rowmask SpMM's
    segment slicing — out-of-span DMA faults on hardware)."""
    b1 = min(b0 + nb_seg, meta.num_blocks)
    pad = nb_seg - (b1 - b0)
    astart = np.pad(meta.astart[b0:b1] - np.int32(lo), (0, pad))
    nchunks = np.pad(meta.nchunks[b0:b1], (0, pad))
    room = np.maximum(span - astart, 0) // _FLASH_CHUNK
    nchunks = np.minimum(nchunks, room).astype(np.int32)
    return astart.astype(np.int32), nchunks


def _pad_rows(x: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    if x.shape[0] == n_pad:
        return x
    return jnp.pad(x, ((0, n_pad - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def flash_gat_attention(
    csr: CSR,
    el2: jnp.ndarray,  # (N, H) f32 source-side scores
    er2: jnp.ndarray,  # (N, H) f32 destination-side scores
    fs_flat: jnp.ndarray,  # (N, H*F) flat source features
    heads: int,
    negative_slope: float = 0.2,
    csr_t: CSR = None,
    stream_dtype=None,
    interpret: bool = False,
    attn_drop: float = 0.0,
    drop_seed=0,
    src_ids=None,
    src_ids_t=None,
) -> jnp.ndarray:
    """Fused GAT segment-softmax attention; returns (N, H*F) f32.

    One XLA gather + one Pallas pass forward; one gather + two Pallas
    passes backward. ``attn_drop > 0`` applies dropout to the NORMALIZED
    attention coefficients (DGL semantics) *inside* the kernels: the keep
    mask is a stateless (src, dst, head, ``drop_seed``) hash regenerated
    per pass in each CSR's own edge order (``edge_keep_mask``), streamed as
    a narrow q plane — no (E, H) alpha tensor, no permutation gathers. See
    module docstring for the base design.
    """
    n = csr.num_nodes
    cap = csr.capacity
    h = heads
    f_flat = fs_flat.shape[-1]
    f = f_flat // h
    if not flash_supported(h, f):
        raise ValueError(f"flash tiling unsupported for heads={h}, F={f}")
    f_pad = _round_up(max(f_flat, 128), 128)
    sdt = stream_dtype if stream_dtype is not None else jnp.float32
    bf16 = sdt == jnp.bfloat16
    slope = float(negative_slope)
    n_ft = f_pad // 128

    if csr_t is None:
        csr_t = csr.transpose()
    meta = row_block_meta(csr, _FLASH_CHUNK)
    meta_t = row_block_meta(csr_t, _FLASH_CHUNK)
    bs3, be3 = _common_specs(meta)
    bs3_t, be3_t = _common_specs(meta_t)

    _, rows_np, cols_np, _ = csr.host_arrays()
    _, rows_t_np, cols_t_np, _ = csr_t.host_arrays()
    if src_ids is not None:
        # Per-edge id arrays as traced ARGUMENTS: at 1e8+ edges the (cap,)
        # numpy constants exceed remote-compile request limits (HTTP 413;
        # same workaround as spmm_pallas's src_ids).
        ids = jnp.minimum(jnp.asarray(src_ids, jnp.int32), jnp.int32(n - 1))
        cols_pad = jnp.pad(ids.reshape(-1), (0, meta.cap_pad - cap))
        ids_t = jnp.minimum(
            jnp.asarray(src_ids_t, jnp.int32), jnp.int32(n - 1)
        )
        cols_t_pad = jnp.pad(ids_t.reshape(-1), (0, meta_t.cap_pad - cap))
    else:
        cols_c = np.minimum(cols_np, n - 1)
        cols_pad = np.pad(cols_c, (0, meta.cap_pad - cap))
        cols_t_c = np.minimum(cols_t_np, n - 1)
        cols_t_pad = np.pad(cols_t_c, (0, meta_t.cap_pad - cap))

    ftot = f_pad + _SIDE

    h_pad = max(_round_up(h, 8), 8)

    def run_raw(
        kernel, astart, nchunks, nb, bs_, be_, blocks, block_widths,
        plane, n_out, kw, qstream=None,
    ):
        """Shared pallas_call driver: grid (nb,), whole-slab double-buffered
        DMA, (ROW_BLOCK, width) outputs; optional narrow dropout q stream."""
        dropped = qstream is not None
        in_specs = [
            pl.BlockSpec((1, 1, ROW_BLOCK), lambda rb, *_: (rb, 0, 0)),
            pl.BlockSpec((1, 1, ROW_BLOCK), lambda rb, *_: (rb, 0, 0)),
        ]
        inputs = [astart, nchunks, bs_, be_]
        for b, wdt in zip(blocks, block_widths):
            in_specs.append(
                pl.BlockSpec((ROW_BLOCK, wdt), lambda rb, *_: (rb, 0))
            )
            inputs.append(b)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        inputs.append(plane)
        if dropped:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
            inputs.append(qstream)
        out_specs = tuple(
            pl.BlockSpec((ROW_BLOCK, wdt), lambda rb, *_: (rb, 0))
            for wdt in n_out
        )
        out_shape = tuple(
            jax.ShapeDtypeStruct((nb * ROW_BLOCK, wdt), jnp.float32)
            for wdt in n_out
        )
        scratch = [pltpu.VMEM((2, _FLASH_CHUNK, ftot), sdt)]
        scratch += [
            pltpu.VMEM((ROW_BLOCK, wdt), jnp.float32) for wdt in n_out
        ]
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
        if dropped:
            scratch.append(pltpu.VMEM((2, h_pad, _FLASH_CHUNK), jnp.float32))
            scratch.append(pltpu.SemaphoreType.DMA((2,)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        cap_here = plane.shape[0]
        return pl.pallas_call(
            functools.partial(
                kernel, h=h, f=f if h > 1 else 128, f_flat=f_pad,
                n_ft=n_ft, slope=slope, ch=_FLASH_CHUNK, dropped=dropped,
                **kw
            ),
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=6 * cap_here * f_pad,
                bytes_accessed=cap_here * ftot * jnp.dtype(sdt).itemsize
                + nb * ROW_BLOCK * sum(n_out) * 4,
                transcendentals=cap_here * h,
            ),
        )(*inputs)

    def run(
        kernel, meta_, bs_, be_, blocks, block_widths, plane, n_out, kw,
        qstream=None,
    ):
        """Single-segment driver over a prebuilt whole plane."""
        return run_raw(
            kernel, meta_.astart, meta_.nchunks, meta_.num_blocks,
            bs_, be_, blocks, block_widths, plane, n_out, kw,
            qstream=qstream,
        )

    def run_segmented(
        kernel, meta_, bs3_, be3_, blocks, block_widths, table, cols_pad_,
        n_out, kw, qstream=None,
    ):
        """Segment-streaming driver: the gather plane is built PER SEGMENT
        (bounded by ``segment_pallas._SEGMENT_BYTES``) instead of held
        whole — how flash GAT runs past ``FLASH_MAX_PLANE_BYTES`` (ogbn
        scale). All segments share one (nb_u, span_u) shape so the Mosaic
        kernel compiles once; per-segment outputs concatenate on rows
        (row blocks never span segments)."""
        segs = _rowmask_segments(meta_, ftot, jnp.dtype(sdt).itemsize)
        nb_u = max(b1 - b0 for b0, b1, _, _ in segs)
        span_u = max(hi - lo for _, _, lo, hi in segs)
        span_u = _round_up(span_u, _FLASH_CHUNK)
        outs = [[] for _ in n_out]
        for b0, b1, lo, hi in segs:
            lo_u = min(lo, max(meta_.cap_pad - span_u, 0))
            astart_s, nch_s = _seg_meta(meta_, b0, nb_u, lo_u, span_u)
            hi_b = min((b0 + nb_u), meta_.num_blocks)
            pad_b = nb_u - (hi_b - b0)
            bs_s = np.pad(bs3_[b0:hi_b], ((0, pad_b), (0, 0), (0, 0)))
            be_s = np.pad(be3_[b0:hi_b], ((0, pad_b), (0, 0), (0, 0)))
            blk_s = []
            for b in blocks:
                rows_have = min((b0 + nb_u) * ROW_BLOCK, b.shape[0])
                sl = jax.lax.slice(
                    b, (b0 * ROW_BLOCK, 0), (rows_have, b.shape[1])
                )
                want = nb_u * ROW_BLOCK
                if sl.shape[0] < want:
                    sl = jnp.pad(sl, ((0, want - sl.shape[0]), (0, 0)))
                blk_s.append(sl)
            seg_cols = jax.lax.slice(cols_pad_, (lo_u,), (lo_u + span_u,))
            plane_s = table[seg_cols]
            if plane_s.dtype != sdt:
                plane_s = plane_s.astype(sdt)
            q_s = (
                jax.lax.slice(
                    qstream, (0, lo_u), (qstream.shape[0], lo_u + span_u)
                )
                if qstream is not None
                else None
            )
            res = run_raw(
                kernel, astart_s, nch_s, nb_u, bs_s, be_s, blk_s,
                block_widths, plane_s, n_out, kw, qstream=q_s,
            )
            rows_real = (b1 - b0) * ROW_BLOCK
            for acc, r in zip(outs, res):
                acc.append(r[:rows_real])
        full = tuple(jnp.concatenate(a, axis=0) for a in outs)
        return tuple(
            jnp.pad(x, ((0, meta_.num_rows_padded - x.shape[0]), (0, 0)))
            if x.shape[0] < meta_.num_rows_padded
            else x[: meta_.num_rows_padded]
            for x in full
        )

    def build_plane(table_f32, cols):
        # Gather from the f32 table, cast on the output write: random row
        # reads are transaction-bound (payload width ~free), sequential
        # writes are halved by bf16 (docs/PERF.md).
        return table_f32[jnp.asarray(cols)].astype(sdt)

    # Above the plane budget, planes are gathered per segment in every pass
    # (and re-gathered in backward instead of saved) — one extra gather per
    # backward pass buys O(_SEGMENT_BYTES) peak instead of O(E·ftot).
    segmented = (
        meta.cap_pad * ftot * jnp.dtype(sdt).itemsize > FLASH_MAX_PLANE_BYTES
        or meta_t.cap_pad * ftot * jnp.dtype(sdt).itemsize
        > FLASH_MAX_PLANE_BYTES
    )

    dropped = float(attn_drop) > 0.0

    def _q_stream(src_ids, dst_ids, cap_pad_):
        """(h_pad, cap_pad) q stream ({0, 1/(1-p)}) in the given order."""
        q = edge_keep_mask(src_ids, dst_ids, drop_seed, h, float(attn_drop))
        q = jnp.pad(q, ((0, cap_pad_ - q.shape[0]), (0, h_pad - h)))
        return q.T

    if dropped:
        rows_pad_f = np.pad(rows_np, (0, meta.cap_pad - cap))
        rows_t_pad = np.pad(rows_t_np, (0, meta_t.cap_pad - cap))
        # The hash must see the same (src, dst) per edge in both orders.
        # With src_ids given (ids-as-arguments mode), the traced clamped
        # ids are used — they differ from raw only on padding slots, which
        # the row masks discard.
        if src_ids is not None:
            cols_raw_f, cols_raw_t = cols_pad, cols_t_pad
        else:
            cols_raw_f = np.pad(cols_np, (0, meta.cap_pad - cap))
            cols_raw_t = np.pad(cols_t_np, (0, meta_t.cap_pad - cap))
        qf = _q_stream(cols_raw_f, rows_pad_f, meta.cap_pad)
        qt = _q_stream(rows_t_pad, cols_raw_t, meta_t.cap_pad)
    else:
        qf = jnp.zeros((1, 1), jnp.float32)
        qt = jnp.zeros((1, 1), jnp.float32)

    def _table_fwd(el2_, fs_):
        """[fs | el_hi | el_lo | 0] node table for the forward plane."""
        el_hi, el_lo = _hi_lo(el2_, bf16)
        return jnp.concatenate(
            [
                fs_.astype(jnp.float32),
                jnp.zeros((n, f_pad - f_flat), jnp.float32),
                el_hi,
                el_lo,
                jnp.zeros((n, _SIDE - 2 * h), jnp.float32),
            ],
            axis=1,
        )  # (N, ftot) f32

    @jax.custom_vjp
    def attn(el2_, er2_, fs_, qf_, qt_):
        out = _fwd_parts(el2_, er2_, fs_, qf_, need_aux=False)[0]
        return out

    def _fwd_parts(el2_, er2_, fs_, qf_, need_aux: bool):
        # Segmented mode holds the whole node table while planes are
        # gathered per segment; storing it in the STREAM dtype is
        # compute-identical (every plane is cast to sdt anyway; el/er hi-lo
        # pairs are bf16-exact) and halves its HBM footprint at ogbn scale.
        table = _table_fwd(el2_, fs_)
        if segmented:
            table = table.astype(sdt)
        if segmented:
            plane = None
            # The per-edge el for the stability max comes from a narrow
            # gather here (the whole plane is never materialized); the
            # (cap, h) f32 transient is bounded and streamed by the max
            # kernel.
            el_edge = el2_[jnp.asarray(cols_pad)[:cap]]
        else:
            plane = build_plane(table, cols_pad)  # (cap_pad, ftot) sdt
            # Stability max, factored: m[d] = leaky(max_in el + er[d]).
            el_edge = (
                plane[:cap, f_pad : f_pad + h].astype(jnp.float32)
                + plane[:cap, f_pad + h : f_pad + 2 * h].astype(jnp.float32)
            )
        elmax = segment_max_narrow(csr, el_edge, interpret=interpret)
        s_top = elmax + er2_
        m = jnp.where(s_top >= 0, s_top, slope * s_top)  # (N, h)
        side = _pad_rows(
            jnp.concatenate([er2_, m], axis=1), meta.num_rows_padded
        )
        n_out = (f_pad, _SIDE, f_pad) if need_aux else (f_pad, _SIDE)
        kw = {"bwd_aux": need_aux}
        # need_aux is requested by the VJP fwd in BOTH modes (see fwd).
        if segmented:
            res = run_segmented(
                _flash_fwd_kernel, meta, bs3, be3,
                [side], [2 * h], table, jnp.asarray(cols_pad),
                n_out, kw,
                qstream=qf_ if dropped else None,
            )
        else:
            res = run(
                _flash_fwd_kernel, meta, bs3, be3,
                [side], [2 * h], plane, n_out, kw,
                qstream=qf_ if dropped else None,
            )
        out_u, den = res[0], res[1]
        denom = jnp.maximum(den[:n, :h], jnp.finfo(jnp.float32).tiny)
        # Output is normalized IN-KERNEL (den complete per row block).
        out = out_u[:n, :f_flat]
        if need_aux:
            u = res[2][:n, :f_flat]  # Σ w·lp·q·fs[src], unnormalized
            p = den[:n, h : 2 * h]  # Σ w·lp, unnormalized
        else:
            u = p = None
        return out, m, denom, u, p, plane

    def fwd(el2_, er2_, fs_, qf_, qt_):
        # Single-pass backward everywhere (measured, docs/PERF.md round
        # 5): the forward kernel accumulates u = Σ w·lp·q·fs[src] and
        # p = Σ w·lp (+3.6 ms), and der becomes node-table glue:
        # der = <gu, u> - c·p — no backward pass A at all. A round-5
        # hybrid briefly kept a saved-plane pass A for the non-segmented
        # case, justified by a bench whose grad consumption let XLA DCE
        # pass A out of the baseline; with all three gradients consumed,
        # pass A measures 5.28 ms > the 3.6 ms forward aux cost, and
        # dropping it also frees the (E, f+128) saved-plane residual
        # (~1.5 GB at E=2M bf16).
        out, m, denom, u, p, _ = _fwd_parts(
            el2_, er2_, fs_, qf_, need_aux=True
        )
        return out, (el2_, er2_, fs_, m, denom, out, u, p, qf_, qt_)

    def bwd(res, g):
        el2_, er2_, fs_, m, denom, out, u, p, qf_, qt_ = res
        g2 = g.reshape(n, h, f)
        gu = (g2 / denom[:, :, None]).reshape(n, f_flat)
        c = jnp.sum(g2 * out.reshape(n, h, f), axis=-1) / denom  # (N, h)

        if _SKIP_BWD_PASS == "A":
            der = jnp.zeros((n, h), jnp.float32)
        else:
            # der from the forward's aux aggregations (module docstring):
            # der[d] = <gu[d], u[d]> - c[d]*p[d].
            der = (
                jnp.sum(gu.reshape(n, h, f) * u.reshape(n, h, f), axis=-1)
                - c * p
            )

        # Pass B: transpose CSR -> d feat_src, dl.
        if _SKIP_BWD_PASS == "B":
            return (
                jnp.zeros((n, h), el2_.dtype),
                der.astype(er2_.dtype),
                jnp.zeros_like(fs_),
                jnp.zeros_like(qf_),
                jnp.zeros_like(qt_),
            )
        er_hi, er_lo = _hi_lo(er2_, bf16)
        m_hi, m_lo = _hi_lo(m, bf16)
        c_hi, c_lo = _hi_lo(c, bf16)
        tableB = jnp.concatenate(
            [
                gu.astype(jnp.float32),
                jnp.zeros((n, f_pad - f_flat), jnp.float32),
                er_hi, er_lo, m_hi, m_lo, c_hi, c_lo,
                jnp.zeros((n, _SIDE - 6 * h), jnp.float32),
            ],
            axis=1,
        )
        elB = _pad_rows(el2_, meta_t.num_rows_padded)
        fsB = _pad_rows(
            jnp.pad(
                fs_.astype(jnp.float32), ((0, 0), (0, f_pad - f_flat))
            ).astype(sdt),
            meta_t.num_rows_padded,
        )
        if segmented:
            dfs_p, dl_p = run_segmented(
                _flash_bwd_b_kernel, meta_t, bs3_t, be3_t,
                [elB, fsB], [h, f_pad], tableB.astype(sdt),
                jnp.asarray(cols_t_pad),
                (f_pad, _SIDE), {},
                qstream=qt_ if dropped else None,
            )
        else:
            planeB = build_plane(tableB, cols_t_pad)
            dfs_p, dl_p = run(
                _flash_bwd_b_kernel, meta_t, bs3_t, be3_t,
                [elB, fsB], [h, f_pad], planeB, (f_pad, _SIDE), {},
                qstream=qt_ if dropped else None,
            )
        dfs = dfs_p[:n, :f_flat].astype(fs_.dtype)
        dl = dl_p[:n, :h]
        return (
            dl.astype(el2_.dtype),
            der.astype(er2_.dtype),
            dfs,
            jnp.zeros_like(qf_),  # dropout masks are data, not params
            jnp.zeros_like(qt_),
        )

    attn.defvjp(fwd, bwd)
    return attn(
        el2.astype(jnp.float32), er2.astype(jnp.float32), fs_flat, qf, qt
    )
