"""Degree-normalization helpers for GCN-style layers.

The reference computes ``norm = in_deg^{-1/2}`` in every training script
(e.g. ``benchmarking/gcn/seastar/train.py``) and passes it as ndata; these
helpers centralize that.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["symmetric_norm"]


def symmetric_norm(graph) -> jnp.ndarray:
    """(N, 1) ``in_degree^{-1/2}`` with zero-degree nodes mapped to 1."""
    if hasattr(graph, "fwd_csr"):
        deg = graph.fwd_csr.degrees()
    else:  # bare CSR
        deg = graph.degrees()
    deg = deg.astype(jnp.float32)
    norm = jnp.where(deg > 0, jnp.power(jnp.maximum(deg, 1.0), -0.5), 1.0)
    return norm[:, None]
