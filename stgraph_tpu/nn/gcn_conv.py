"""Graph Convolutional Network layer (Kipf & Welling) on the vertex frontend.

API-parity port of the reference ``stgraph/nn/pytorch/static/gcn_conv.py``:
the dense projection runs on the MXU outside the vertex program, and the
aggregation is the traced one-liner

    ``sum([nb.h * nb.norm for nb in v.innbs]) * v.norm``

(reference ``gcn_conv.py:163-164``; weighted variant ``:170-176``). The
lowering's SpMM peephole turns that whole formula into one fused
(dense-adjacency or blocked-CSR Pallas) aggregation kernel.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as fnn
import jax.numpy as jnp
import numpy as np

from stgraph_tpu.compiler import STGraph
from stgraph_tpu.utils.norm import symmetric_norm

__all__ = ["GCNConv"]


class GCNConv(fnn.Module):
    """One GCN layer: ``act(norm·A·norm · (h W) + b)``.

    Attributes:
      in_feats / out_feats: dense projection shape.
      activation: optional elementwise activation applied outside the kernel
        (reference applies bias/activation outside too, ``gcn_conv.py:185-189``).
      use_bias: add a learned (out_feats,) bias.
      impl: aggregation backend — 'auto' | 'jnp' | 'dense' | 'pallas'.
    """

    in_feats: int
    out_feats: int
    activation: Optional[Callable] = None
    use_bias: bool = True
    impl: str = "auto"
    dtype: Optional[Any] = None  # compute dtype (e.g. jnp.bfloat16); params stay f32

    @fnn.compact
    def __call__(self, graph, h: jnp.ndarray, edge_weight=None) -> jnp.ndarray:
        weight = self.param(
            "weight",
            fnn.initializers.xavier_uniform(),
            (self.in_feats, self.out_feats),
            jnp.float32 if self.dtype is not None else h.dtype,
        )
        from stgraph_tpu.ops.dyn_spmm import LazyPair, PMAGraphPair

        if isinstance(graph, (PMAGraphPair, LazyPair)):
            # Traced dynamic-store path (in-scan structure mutation): the
            # row-id-masked kernel aggregates directly from the PMA or lazy
            # (tombstone+tail-log) layout; per-step norms come from the
            # scatter-free degree kernel. Edge weights ride the store
            # itself (``pma_spmm``/``lazy_spmm`` apply them), so the
            # argument is rejected to avoid double application.
            if edge_weight is not None:
                raise ValueError(
                    "dynamic graph pairs carry edge weights in the store; "
                    "pass them at *_pair_from_edges/apply_delta_*_pair time"
                )
            if isinstance(graph, PMAGraphPair):
                from stgraph_tpu.ops.dyn_spmm import (
                    pma_norm as _pair_norm,
                    pma_spmm as _pair_spmm,
                )
            else:
                from stgraph_tpu.ops.dyn_spmm import (
                    lazy_norm as _pair_norm,
                    lazy_spmm as _pair_spmm,
                )

            norm = _pair_norm(graph)
            h = jnp.dot(
                h, weight, preferred_element_type=jnp.float32
            ).astype(h.dtype)
            h = _pair_spmm(graph, h * norm) * norm
            if self.use_bias:
                bias = self.param(
                    "bias", fnn.initializers.zeros_init(),
                    (self.out_feats,), h.dtype,
                )
                h = h + bias
            if self.activation is not None:
                h = self.activation(h)
            return h

        norm = _get_norm(graph)
        if self.dtype is not None:
            h = h.astype(self.dtype)
            weight = weight.astype(self.dtype)
            norm = norm.astype(self.dtype)
        h = jnp.dot(h, weight, preferred_element_type=jnp.float32).astype(h.dtype)

        stgraph = STGraph()
        if edge_weight is None:

            @stgraph.compile(gnn_module=self, impl=self.impl)
            def nb_compute(v):
                return sum([nb.h * nb.norm for nb in v.innbs]) * v.norm

            h = nb_compute(graph, n_feats={"norm": norm, "h": h})
        else:
            edge_weight = jnp.asarray(edge_weight)
            if edge_weight.ndim == 1:
                edge_weight = edge_weight[:, None]

            @stgraph.compile(gnn_module=self, impl=self.impl)
            def nb_compute(v):
                return (
                    sum(
                        [
                            nb_edge.src.norm * nb_edge.src.h * nb_edge.edge_weight
                            for nb_edge in v.inedges
                        ]
                    )
                    * v.norm
                )

            h = nb_compute(
                graph,
                n_feats={"norm": norm, "h": h},
                e_feats={"edge_weight": edge_weight},
            )

        if self.use_bias:
            bias = self.param(
                "bias",
                fnn.initializers.zeros_init(),
                (self.out_feats,),
                jnp.float32 if self.dtype is not None else h.dtype,
            )
            h = h + bias.astype(h.dtype)
        if self.activation is not None:
            h = self.activation(h)
        return h


def _get_norm(graph) -> jnp.ndarray:
    """Fetch the (N, 1) symmetric-normalization vector.

    The reference requires users to precompute ``norm`` ndata
    (``gcn_conv.py:151-156``); we honor that but compute the standard
    ``deg^{-1/2}`` automatically when absent.
    """
    import jax

    norm = None
    if hasattr(graph, "get_ndata"):
        norm = graph.get_ndata("norm")
    if norm is None:
        norm = symmetric_norm(graph)
    if not isinstance(norm, jax.core.Tracer):
        norm = np.asarray(norm)  # host constant: embeds without device pulls
    if norm.ndim != 2 or norm.shape[1] != 1:
        raise ValueError("node data 'norm' must have shape (num_nodes, 1)")
    return norm
