"""EvolveGCN: GCN whose weights evolve over time via a recurrent cell.

Listed in BASELINE.json's north star alongside GCN/GAT/TGCN. The reference
repo does not ship it; this follows the EvolveGCN paper (Pareja et al.,
AAAI'20):

  * **-O variant**: the GCN weight matrix itself is the recurrent state,
    updated each timestep by a GRU cell that takes the previous weights as
    both input and hidden state — no node-embedding summarization needed.
  * **-H variant**: the weights are the hidden state of a GRU whose input
    is a top-k summary of the current node embeddings.

Both return ``(output, new_weight_state)`` so training loops thread the
evolving weights through ``jax.lax.scan`` exactly like TGCN's hidden state.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from stgraph_tpu.compiler import STGraph
from stgraph_tpu.utils.norm import symmetric_norm

__all__ = ["EvolveGCNO", "EvolveGCNH"]


class _WeightGRU(fnn.Module):
    """GRU cell over a (in, out) weight matrix, column-wise gates."""

    out_feats: int

    @fnn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        dz_x = fnn.Dense(self.out_feats, name="wz_x")
        dz_h = fnn.Dense(self.out_feats, use_bias=False, name="wz_h")
        dr_x = fnn.Dense(self.out_feats, name="wr_x")
        dr_h = fnn.Dense(self.out_feats, use_bias=False, name="wr_h")
        dh_x = fnn.Dense(self.out_feats, name="wh_x")
        dh_h = fnn.Dense(self.out_feats, use_bias=False, name="wh_h")
        z = fnn.sigmoid(dz_x(x) + dz_h(h))
        r = fnn.sigmoid(dr_x(x) + dr_h(h))
        htil = fnn.tanh(dh_x(x) + dh_h(r * h))
        return z * h + (1 - z) * htil


def _gcn_aggregate(graph, h: jnp.ndarray, impl: str) -> jnp.ndarray:
    norm = None
    if hasattr(graph, "get_ndata"):
        norm = graph.get_ndata("norm")
    if norm is None:
        norm = symmetric_norm(graph)
    norm = jnp.asarray(norm)

    stgraph = STGraph()

    @stgraph.compile(impl=impl)
    def nb_compute(v):
        return sum([nb.h * nb.norm for nb in v.innbs]) * v.norm

    return nb_compute(graph, n_feats={"norm": norm, "h": h})


class EvolveGCNO(fnn.Module):
    """EvolveGCN-O: ``W_t = GRU(W_{t-1}, W_{t-1})``, then a GCN conv."""

    in_feats: int
    out_feats: int
    impl: str = "auto"

    @fnn.compact
    def __call__(
        self, graph, x: jnp.ndarray, weight: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w0 = self.param(
            "weight",
            fnn.initializers.xavier_uniform(),
            (self.in_feats, self.out_feats),
            x.dtype,
        )
        w = w0 if weight is None else weight
        w = _WeightGRU(self.out_feats, name="gru")(w, w)
        h = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
        return _gcn_aggregate(graph, h, self.impl), w


class EvolveGCNH(fnn.Module):
    """EvolveGCN-H: weights are GRU state driven by top-k node summaries."""

    in_feats: int
    out_feats: int
    impl: str = "auto"

    @fnn.compact
    def __call__(
        self, graph, x: jnp.ndarray, weight: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w0 = self.param(
            "weight",
            fnn.initializers.xavier_uniform(),
            (self.in_feats, self.out_feats),
            x.dtype,
        )
        p = self.param(
            "summarize_p",
            fnn.initializers.normal(1.0 / self.in_feats**0.5),
            (self.in_feats,),
            x.dtype,
        )
        w = w0 if weight is None else weight
        # Top-out_feats node summary (paper's summarize + tanh weighting):
        # scores y = X p / |p|; take the out_feats highest-scoring rows.
        y = x @ p / (jnp.linalg.norm(p) + 1e-12)
        _, idx = jax.lax.top_k(y, self.out_feats)
        summary = x[idx] * jnp.tanh(y[idx])[:, None]  # (out_feats, in_feats)
        w = _WeightGRU(self.out_feats, name="gru")(summary.T, w)
        h = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
        return _gcn_aggregate(graph, h, self.impl), w
