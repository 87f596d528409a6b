"""Degree-normalization helpers for GCN-style layers.

The reference computes ``norm = in_deg^{-1/2}`` in every training script
(e.g. ``benchmarking/gcn/seastar/train.py``) and passes it as ndata; these
helpers centralize that.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["symmetric_norm"]


def symmetric_norm(graph) -> jnp.ndarray:
    """(N, 1) ``in_degree^{-1/2}`` with zero-degree nodes mapped to 1.

    Computed host-side from ``indptr`` when the graph is concrete: this runs
    during (possibly eager) layer init, where per-op device dispatch over a
    remote-TPU tunnel costs seconds; traced CSRs fall back to device ops.
    """
    csr = graph.fwd_csr if hasattr(graph, "fwd_csr") else graph
    indptr = csr.indptr
    if isinstance(indptr, np.ndarray) or not _is_traced(indptr):
        deg = np.diff(np.asarray(indptr)).astype(np.float32)
        norm = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1.0)), 1.0)
        # Host numpy on purpose: this becomes a closed-over constant of
        # jitted layers; device-array constants cost a device->host pull
        # per lowering on remote-TPU setups (docs/PERF.md).
        return norm[:, None].astype(np.float32)
    deg = (indptr[1:] - indptr[:-1]).astype(jnp.float32)
    norm = jnp.where(deg > 0, jnp.power(jnp.maximum(deg, 1.0), -0.5), 1.0)
    return norm[:, None]


def _is_traced(x) -> bool:
    import jax.core

    return isinstance(x, jax.core.Tracer)
