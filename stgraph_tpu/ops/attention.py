"""Fused attention aggregation paths.

``dense_gat_attention`` computes GAT's segment-softmax attention through the
dense adjacency for small graphs: per head, the (N, N) score matrix
``leaky_relu(el[s] + er[d])`` is masked by edge counts, softmax-normalized
per destination row, and applied as one MXU matmul — no edge-domain
materialization and no scatters (XLA scatters are both slower than a small
dense matmul at this scale and compile-fragile on some TPU toolchains).
Heads run sequentially under ``lax.map`` to bound the N² temporary to one
head at a time.

Semantics match the per-edge segment softmax exactly, including duplicate
edges: an edge with multiplicity m contributes m·exp(score) to the
normalizer and m·alpha·x to the sum (same score per duplicate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stgraph_tpu.graph.csr import CSR

__all__ = [
    "dense_gat_attention",
    "sparse_gat_attention",
    "flash_path_available",
]


def flash_path_available(
    csr: CSR, heads: int, f: int, interpret: bool = False
) -> bool:
    """True when ``sparse_gat_attention`` would take the fully fused flash
    path (tiling supported, plane under budget, TPU or interpret) — the
    predicate GATConv uses to keep attention-dropout training fused."""
    from stgraph_tpu.ops import flash_gat as FG
    from stgraph_tpu.ops.message import _on_tpu

    # No plane-size cap: past FLASH_MAX_PLANE_BYTES the flash path streams
    # the plane in segments (and re-gathers in backward instead of saving).
    return (interpret or _on_tpu()) and FG.flash_supported(heads, f)


def _dense_counts(csr: CSR) -> np.ndarray:
    """(N, N) edge-count matrix A[d, s], host-built (concrete CSR only)."""
    indptr, rows, cols, _ = csr.host_arrays()
    n = csr.num_nodes
    a = np.zeros((n, n), np.float32)
    valid = rows < n
    np.add.at(a, (rows[valid], cols[valid]), 1.0)
    return a


def dense_gat_attention(
    csr: CSR,
    el: jnp.ndarray,  # (N, H, 1) source-side scores
    er: jnp.ndarray,  # (N, H, 1) destination-side scores
    feat_src: jnp.ndarray,  # (N, H, F)
    negative_slope: float = 0.2,
    attn_drop_rate: float = 0.0,
    attn_drop_rng=None,
) -> jnp.ndarray:
    """out[d, h, :] = sum_s softmax_s(leaky(el[s,h]+er[d,h])) * feat[s,h,:].

    ``attn_drop_rate`` > 0 (with an rng key) applies dropout to the
    NORMALIZED coefficients (DGL semantics) — per (dst, src, head), with
    the usual 1/(1-p) rescale of the kept entries.
    """
    cached = getattr(csr, "_dense_counts", None)
    if cached is None:
        cached = _dense_counts(csr)
        object.__setattr__(csr, "_dense_counts", cached)
    counts = cached  # host constant; embeds without device pulls
    el2 = el[..., 0]  # (N, H)
    er2 = er[..., 0]  # (N, H)
    x = jnp.moveaxis(feat_src, 1, 0)  # (H, N, F)
    h = el2.shape[1]
    head_keys = jax.random.split(
        attn_drop_rng if attn_drop_rate > 0.0 else jax.random.key(0), h
    )

    def per_head(args):
        el_h, er_h, x_h, key = args  # (N,), (N,), (N, F), key
        s = el_h[None, :] + er_h[:, None]  # (N_dst, N_src)
        s = jnp.where(s >= 0, s, negative_slope * s)
        # Stability shift by the per-row max over actual neighbors. The exp
        # must also use the MASKED scores: a non-edge score above the
        # neighbor max would overflow exp (0 * inf = NaN), and zero-degree
        # rows must come out 0, not NaN. With `masked`, non-neighbors give
        # exp(finfo.min - m) == 0 and a zero-degree row gives
        # counts(=0) * exp(0) == 0 everywhere.
        neg = jnp.finfo(s.dtype).min
        masked = jnp.where(counts > 0, s, neg)
        m = jnp.max(masked, axis=1, keepdims=True)
        e = counts * jnp.exp(masked - m)  # multiplicity-weighted exp
        denom = jnp.maximum(e.sum(axis=1, keepdims=True), jnp.finfo(s.dtype).tiny)
        alpha = e / denom  # (N_dst, N_src)
        if attn_drop_rate > 0.0:
            keep = jax.random.bernoulli(
                key, 1.0 - attn_drop_rate, alpha.shape
            )
            alpha = jnp.where(keep, alpha / (1.0 - attn_drop_rate), 0.0)
        return jnp.dot(alpha, x_h, preferred_element_type=jnp.float32).astype(
            x_h.dtype
        )

    out = jax.lax.map(per_head, (el2.T, er2.T, x, head_keys))  # (H, N, F)
    return jnp.moveaxis(out, 0, 1)  # (N, H, F)


def sparse_gat_attention(
    csr: CSR,
    el: jnp.ndarray,  # (N, H, 1) source-side scores
    er: jnp.ndarray,  # (N, H, 1) destination-side scores
    feat_src: jnp.ndarray,  # (N, H, F)
    negative_slope: float = 0.2,
    blocked=None,
    blocked_t=None,
    csr_t: CSR = None,
    interpret: bool = False,
    attn_drop_rate: float = 0.0,
    attn_drop_seed=0,
) -> jnp.ndarray:
    """Large-graph GAT attention, scatter-free forward AND backward.

    ``attn_drop_rate > 0`` requires the flash path
    (``flash_path_available``): dropout on the normalized coefficients runs
    in-kernel via the stateless (src, dst, head, seed) hash — no (E, H)
    alpha plane, no permutation gathers (``flash_gat.edge_keep_mask``).

    Forward: per-edge logits from two gathers, stability max and softmax
    normalizer on the position-masked narrow kernels, weighted aggregation
    on the multihead blocked SpMM.

    Backward is hand-derived (one ``custom_vjp`` over the whole op) because
    XLA's gather VJP is a serialized scatter-add — exactly the op this path
    exists to avoid. The softmax structure eliminates every scatter:

      * ``d feat_src`` — the same multihead SpMM on the transpose CSR with
        the (recomputed) attention coefficients;
      * ``d alpha_e = <g[dst_e], feat_src[src_e]>`` — per-edge SDDMM
        (gathers only);
      * softmax VJP: ``d s_e = alpha_e (d alpha_e - c[dst_e])`` where
        ``c[d] = sum_e alpha_e d alpha_e = <g[d], out[d]>`` — a *node-wise*
        dot, no extra aggregation;
      * ``d el / d er`` — narrow segment sums on the transpose / forward
        CSR;
      * ``d m = 0`` exactly (softmax is invariant to the shift), so the max
        contributes no backward term at all.

    Reference counterpart: the fused GAT kernels plus the sympy peephole
    that reuses materialized softmax sums in backward
    (``stgraph/compiler/passes/peephole.py``); here the peephole's insight
    is the closed-form ``c = <g, out>``.
    """
    from stgraph_tpu.ops import message as M
    from stgraph_tpu.ops import segment_pallas as nsp
    from stgraph_tpu.ops.message import _on_tpu

    n, h, f = feat_src.shape
    cap = csr.capacity
    # Fully fused flash path: no (E, H) tensors, no narrow random gathers
    # (ops/flash_gat.py). Falls back to the rowmask pipeline when the
    # tiling is unsupported or the residual gather plane would be too
    # large to hold un-streamed.
    from stgraph_tpu.ops import flash_gat as FG
    from stgraph_tpu.ops.spmm_pallas import _stream_dtype as _sdt_of

    sdt0 = _sdt_of(csr, jnp.float32) or jnp.float32
    # No plane-size cap: flash self-segments past FLASH_MAX_PLANE_BYTES.
    if (interpret or _on_tpu()) and FG.flash_supported(h, f):
        out = FG.flash_gat_attention(
            csr,
            el[..., 0].astype(jnp.float32),
            er[..., 0].astype(jnp.float32),
            feat_src.reshape(n, h * f),
            heads=h,
            negative_slope=negative_slope,
            csr_t=csr_t,
            stream_dtype=sdt0,
            interpret=interpret,
            attn_drop=attn_drop_rate,
            drop_seed=attn_drop_seed,
        )
        return out.reshape(n, h, f).astype(feat_src.dtype)
    if attn_drop_rate > 0.0:
        raise ValueError(
            "attention dropout needs the flash path; gate on "
            "flash_path_available() before calling"
        )
    # Fused row-masked kernel: weights applied in-kernel from an (H, E)
    # stream, softmax denominator accumulated in the same pass. Falls back
    # to the composed spmm when off-TPU or the head/feature tiling doesn't
    # divide 128.
    use_rowmask = (
        (interpret or _on_tpu())
        and (h == 1 or (128 % f == 0 and (h * f) % 128 == 0))
    )
    _, rows_np, cols_np, eids_np = csr.host_arrays()
    rows_c = np.minimum(rows_np, n - 1)
    cols_c = np.minimum(cols_np, n - 1)
    emask = (rows_np < n).astype(np.float32)
    if csr_t is None:
        csr_t = csr.transpose()
    # Host-side permutations between the two edge orders (shared user eids):
    # perm_t: transpose position -> forward position; perm_f the inverse.
    _, _, _, eids_t_np = csr_t.host_arrays()
    pos_in_fwd = np.zeros(cap + 1, np.int32)
    pos_in_fwd[np.minimum(eids_np, cap)] = np.arange(cap, dtype=np.int32)
    perm_t = pos_in_fwd[np.minimum(eids_t_np, cap)]
    pos_in_t = np.zeros(cap + 1, np.int32)
    pos_in_t[np.minimum(eids_t_np, cap)] = np.arange(cap, dtype=np.int32)
    perm_f = pos_in_t[np.minimum(eids_np, cap)]

    # bf16 feature/cotangent streaming through the Pallas kernels on large
    # graphs (f32 accumulate); see spmm_pallas._BF16_STREAM_MIN_EDGES.
    from stgraph_tpu.ops.spmm_pallas import _stream_dtype

    sdt = _stream_dtype(csr, jnp.float32)

    slope = negative_slope

    def raw_logits(el2, er2):
        return el2[cols_c] + er2[rows_c]  # (cap, H)

    def leaky(s0):
        return jnp.where(s0 >= 0, s0, slope * s0)

    @jax.custom_vjp
    def attn(el2, er2, fs):
        out, _, _, _ = _fwd_parts(el2, er2, fs)
        return out

    def _fwd_parts(el2, er2, fs):
        s = leaky(raw_logits(el2, er2))
        m = M.aggregate(csr, s, reduce="max", blocked=blocked)  # (N, H)
        w = jnp.exp(s - m[rows_c]) * emask[:, None]
        denom = None
        if not use_rowmask:
            denom = jnp.maximum(
                M.aggregate(csr, w, reduce="sum", blocked=blocked),
                jnp.finfo(jnp.float32).tiny,
            )  # (N, H)
        # Aggregate with the *unnormalized* weights and divide at node
        # level: E-domain division + a denom[dst] gather would cost several
        # ms at 2M edges (narrow-lane edge streams); the (N, H) divide is
        # noise.
        if use_rowmask:
            u_flat, den_k = nsp.spmm_rowmask(
                csr, w, fs.reshape(n, h * f), heads=h,
                with_denom=True, interpret=interpret, stream_dtype=sdt,
            )
            denom = jnp.maximum(den_k, jnp.finfo(jnp.float32).tiny)
            u = u_flat.reshape(n, h, f)
        else:
            u = M.spmm(
                csr,
                fs,
                edge_weight=w,
                impl="auto",
                blocked=blocked,
                blocked_t=blocked_t,
                csr_t=csr_t,
            )  # (N, H, F)
        out = u / denom[:, :, None]
        return out, m, denom, w

    def fwd(el2, er2, fs):
        out, m, denom, w = _fwd_parts(el2, er2, fs)
        # w is residual-saved: recomputing it in bwd costs two (E, H)
        # gathers + an exp pass; the (cap, H) buffer is cheaper.
        return out, (el2, er2, fs, m, denom, out, w)

    # Transpose-CSR host constants for the transpose-order backward.
    _, rows_t_np, cols_t_np, _ = csr_t.host_arrays()
    rows_t_c = np.minimum(rows_t_np, n - 1)  # src ids, SORTED
    cols_t_c = np.minimum(cols_t_np, n - 1)  # dst ids
    emask_t = (rows_t_np < n).astype(np.float32)

    def bwd(res, g):
        el2, er2, fs, m, denom, out, w = res
        gu = g / denom[:, :, None]  # cotangent of the pre-division sum
        # Softmax VJP without any scatter: the normalizer's backward term
        # is the node-wise dot c = <g, out> / denom (the peephole closed
        # form), and d m = 0 exactly by softmax shift invariance.
        c = jnp.sum(g * out, axis=-1) / denom  # (N, H)
        if use_rowmask:
            # The ENTIRE edge-domain backward runs in TRANSPOSE order.
            # Rationale (measured, docs/PERF.md): a narrow (E, 8)
            # permutation gather costs ~9.7 ms at E=2M — more than the
            # (E, 128) feature gather — so the fwd-order formulation's
            # three permutations (w[perm_t], dw_t[perm_f], ds0[perm_t])
            # dominate the whole backward. In transpose order: dw is
            # native kernel output, w is recomputed from node tables
            # (dst-indexed er/m/c ride ONE fused narrow gather; src-indexed
            # el is a cheap sorted gather), dl aggregates directly, and
            # only der pays the one unavoidable order crossing.
            side = jnp.concatenate([er2, m, c], axis=1)  # (N, 3H)
            side_t = side[cols_t_c]  # one (E, 3H) dst-indexed gather
            er_t = side_t[:, :h]
            m_t = side_t[:, h : 2 * h]
            c_t = side_t[:, 2 * h :]
            el_t = el2[rows_t_c]  # sorted (src-major) gather — cheap
            s0_t = el_t + er_t
            w_t = jnp.exp(leaky(s0_t) - m_t) * emask_t[:, None]
            # d feat_src AND the per-edge SDDMM in ONE transpose-pass
            # kernel: dw[e] = <fs[src_e], gu[dst_e]> falls out of the same
            # pass that aggregates gu (the block's rows are the SDDMM's
            # other operand) — the separate SDDMM's two (E, H·F) gathers
            # disappear.
            dfs_flat, dw_t = nsp.spmm_rowmask_bwd(
                csr_t, w_t, gu.reshape(n, h * f),
                fs.reshape(n, h * f), heads=h,
                interpret=interpret, stream_dtype=sdt,
            )
            dfs = dfs_flat.reshape(n, h, f)
            ds_t = w_t * (dw_t - c_t)
            ds0_t = ds_t * jnp.where(s0_t >= 0, 1.0, slope)
            dl = M.aggregate(csr_t, ds0_t, reduce="sum", blocked=blocked_t)
            der = M.aggregate(
                csr, ds0_t[perm_f], reduce="sum", blocked=blocked
            )
        else:
            dfs = M.spmm(
                csr_t,
                gu,
                edge_weight=w[perm_t],
                impl="auto",
                blocked=blocked_t,
                blocked_t=blocked,
                csr_t=csr,
            )
            fs2 = fs.reshape(n, h * f)
            gu2 = gu.reshape(n, h * f)
            dw = jnp.sum(
                (fs2[cols_c] * gu2[rows_c]).reshape(cap, h, f), axis=-1
            )  # (cap, H)
            s0 = raw_logits(el2, er2)
            ds = w * (dw - c[rows_c])
            ds0 = ds * jnp.where(s0 >= 0, 1.0, slope)
            der = M.aggregate(csr, ds0, reduce="sum", blocked=blocked)
            dl = M.aggregate(
                csr_t, ds0[perm_t], reduce="sum", blocked=blocked_t
            )
        return (
            dl.astype(el2.dtype),
            der.astype(er2.dtype),
            dfs.astype(fs.dtype),
        )

    attn.defvjp(fwd, bwd)
    out = attn(
        el[..., 0].astype(jnp.float32),
        er[..., 0].astype(jnp.float32),
        feat_src,
    )
    return out.astype(feat_src.dtype)
