"""Segment reductions and segment softmax — the numerical core.

These are the TPU-native replacements for the reference's generated CUDA
aggregation loops (``AggSumOp``/``AggMaxOp`` in
``stgraph/compiler/registry.py:269-338`` and the edge loop of
``code_gen/templates/fa/tpl_fa_csr.jinja:28-45``). Pure-``jnp``
implementations double as the allclose oracle for the Pallas kernels and as
the CPU/interpret fallback.

All functions take *CSR-ordered* edge data (sorted by destination row), so
``indices_are_sorted=True`` is always passed to XLA — the scatter lowers to
a segmented reduction rather than a serialized scatter-add.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "segment_sum",
    "segment_max",
    "segment_min",
    "segment_mean",
    "segment_softmax",
    "broadcast_to_edges",
]

_NEG_INF = -jnp.inf


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sum ``data`` rows into ``num_segments`` buckets by ``segment_ids``.

    Padding edges carry ``segment_ids == num_segments`` (out of range) and
    are dropped by XLA scatter semantics; ``edge_mask`` additionally zeroes
    them so NaN/Inf garbage from clamped gathers cannot propagate.
    """
    if edge_mask is not None:
        data = jnp.where(_expand(edge_mask, data), data, 0)
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-segment maximum. Empty segments produce 0 (matching the
    reference kernels, which leave the zero-initialized output untouched
    for isolated nodes)."""
    if edge_mask is not None:
        data = jnp.where(_expand(edge_mask, data), data, _NEG_INF)
    out = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )
    return jnp.where(jnp.isneginf(out), 0.0, out)


def segment_min(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    if edge_mask is not None:
        data = jnp.where(_expand(edge_mask, data), data, jnp.inf)
    out = jax.ops.segment_min(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )
    return jnp.where(jnp.isposinf(out), 0.0, out)


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-segment mean with the reference's divisor semantics
    (``registry.py:96-99``: sum divided by in-degree; empty segments → 0)."""
    s = segment_sum(data, segment_ids, num_segments, edge_mask)
    ones = jnp.ones(segment_ids.shape[:1], dtype=data.dtype)
    if edge_mask is not None:
        ones = jnp.where(edge_mask, ones, 0)
    counts = jax.ops.segment_sum(
        ones, segment_ids, num_segments=num_segments, indices_are_sorted=True
    )
    counts = jnp.maximum(counts, 1.0)
    return s / _expand_counts(counts, s)


def segment_softmax(
    scores: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Numerically-stable per-segment softmax over edges.

    This is the *correct* segment softmax the reference GAT intends: its
    traced ``max(embs)`` is a no-op (a single symbolic neighbor, so Python's
    builtin ``max`` returns the operand — ``nn/pytorch/static/gat_conv.py:50``
    with ``compiler/node.py:23``). Here the max really is the per-segment
    max, subtracted before ``exp`` for stability.
    """
    m = segment_max(scores, segment_ids, num_segments, edge_mask)
    shifted = scores - m[segment_ids]
    e = jnp.exp(shifted)
    if edge_mask is not None:
        e = jnp.where(_expand(edge_mask, e), e, 0)
    denom = segment_sum(e, segment_ids, num_segments)
    denom = jnp.maximum(denom, jnp.finfo(scores.dtype).tiny)
    return e / denom[segment_ids]


def broadcast_to_edges(node_vals: jnp.ndarray, segment_ids: jnp.ndarray) -> jnp.ndarray:
    """Gather per-node values back to edge positions (dest broadcast)."""
    return node_vals[segment_ids]


def _expand(mask: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Reshape a (E,) mask to broadcast against (E, ...) data."""
    return mask.reshape(mask.shape + (1,) * (like.ndim - 1))


def _expand_counts(counts: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    return counts.reshape(counts.shape + (1,) * (like.ndim - 1))
