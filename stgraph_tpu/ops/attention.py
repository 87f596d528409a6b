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

__all__ = ["dense_gat_attention"]


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
) -> jnp.ndarray:
    """out[d, h, :] = sum_s softmax_s(leaky(el[s,h]+er[d,h])) * feat[s,h,:]."""
    cached = getattr(csr, "_dense_counts", None)
    if cached is None:
        cached = _dense_counts(csr)
        object.__setattr__(csr, "_dense_counts", cached)
    counts = cached  # host constant; embeds without device pulls
    el2 = el[..., 0]  # (N, H)
    er2 = er[..., 0]  # (N, H)
    x = jnp.moveaxis(feat_src, 1, 0)  # (H, N, F)

    def per_head(args):
        el_h, er_h, x_h = args  # (N,), (N,), (N, F)
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
        return jnp.dot(alpha, x_h, preferred_element_type=jnp.float32).astype(
            x_h.dtype
        )

    out = jax.lax.map(per_head, (el2.T, er2.T, x))  # (H, N, F)
    return jnp.moveaxis(out, 0, 1)  # (N, H, F)
