"""Graph Attention Network layer with fused segment-softmax attention.

Re-design of the reference ``stgraph/nn/pytorch/static/gat_conv.py``: the
per-head projections and el/er scores run dense on the MXU; the vertex
program fuses SDDMM score, *numerically-stable* segment softmax, and the
weighted aggregation.

Deliberate semantic fix vs the reference: its traced ``max(embs)``
(``gat_conv.py:50``) is a no-op because ``embs`` holds a single symbolic
neighbor (``compiler/node.py:23``) — Python's builtin ``max`` of a
one-element list returns the element, so the reference kernel computes
``exp(leaky_relu(0)) = 1`` per edge, i.e. mean aggregation. Here
``dsl.agg_max`` is a true segment max and the layer computes the real GAT
softmax ``softmax_dst(leaky_relu(el_src + er_dst))``.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from stgraph_tpu.compiler import STGraph, dsl

# Same scale as ops.message._DENSE_BUDGET_BYTES: an (N, N) f32 mask.
_DENSE_ATTN_BUDGET_BYTES = 64 * 1024 * 1024

__all__ = ["GATConv"]


class GATConv(fnn.Module):
    in_feats: int
    out_feats: int
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    activation: Optional[Callable] = None
    impl: str = "auto"

    @fnn.compact
    def __call__(
        self, graph, feat: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        # Reference init: xavier_normal with gain = calculate_gain('relu')
        # = sqrt(2) on fc and both attention vectors (reference
        # gat_conv.py:33-38). variance_scaling's scale is the VARIANCE
        # multiplier, so gain^2 = 2.0 reproduces it.
        relu_xavier = fnn.initializers.variance_scaling(
            2.0, "fan_avg", "normal"
        )
        fc = fnn.Dense(
            self.out_feats * self.num_heads,
            use_bias=False,
            kernel_init=relu_xavier,
            name="fc",
        )
        # Attn params are (H, F) like the reference (fan_in = F,
        # fan_out = H), broadcast to (1, H, F) at use.
        attn_l = self.param(
            "attn_l",
            relu_xavier,
            (self.num_heads, self.out_feats),
            feat.dtype,
        )[None]
        attn_r = self.param(
            "attn_r",
            relu_xavier,
            (self.num_heads, self.out_feats),
            feat.dtype,
        )[None]

        # Attention dropout (DGL semantics: dropout on the NORMALIZED
        # coefficients). The reference declares attn_drop and never applies
        # it (gat_conv.py:25 creates the module; forward never calls it) —
        # here it is honored on every path: the dense path masks alpha per
        # head; large graphs stay on the FUSED flash pipeline with an
        # in-kernel stateless-hash keep mask (no (E, H) alpha in HBM); only
        # flash-unsupported tilings fall back to the edge-domain jnp
        # softmax.
        use_attn_drop = self.attn_drop > 0.0 and not deterministic
        attn_rng = self.make_rng("dropout") if use_attn_drop else None
        h = fnn.Dropout(self.feat_drop, deterministic=deterministic)(feat)
        feat_src = fc(h).reshape(-1, self.num_heads, self.out_feats)
        # Per-head scalar scores (N, H, 1): the halves of the GAT logit.
        el = jnp.sum(feat_src * attn_l, axis=-1, keepdims=True)
        er = jnp.sum(feat_src * attn_r, axis=-1, keepdims=True)

        negative_slope = self.negative_slope

        # Fast path: small graphs compute the whole segment-softmax
        # attention densely on the MXU (ops/attention.py) — no edge-domain
        # arrays, no scatters. Same numerics as the vertex program below
        # (pinned together by tests/test_nn.py::test_gat_dense_path_agrees).
        csr = getattr(graph, "fwd_csr", graph)
        n = csr.num_nodes
        concrete = not isinstance(csr.rows, jax.core.Tracer)
        if (
            self.impl in ("auto", "dense")
            and concrete
            and n * n * 4 <= _DENSE_ATTN_BUDGET_BYTES
        ):
            from stgraph_tpu.ops.attention import dense_gat_attention

            rst = dense_gat_attention(
                csr, el, er, feat_src, negative_slope=negative_slope,
                attn_drop_rate=self.attn_drop if use_attn_drop else 0.0,
                attn_drop_rng=attn_rng,
            )
            if self.activation is not None:
                rst = self.activation(rst)
            return rst

        # Attention-dropout training stays on the FUSED path whenever the
        # flash tiling supports it: the keep mask is a stateless
        # (src, dst, head, seed) hash applied in-kernel — no (E, H) alpha
        # tensor in HBM (ops/flash_gat.edge_keep_mask).
        if (
            use_attn_drop
            and concrete
            and self.impl in ("auto", "sparse")
        ):
            from stgraph_tpu.ops.attention import (
                flash_path_available,
                sparse_gat_attention,
            )

            if flash_path_available(csr, self.num_heads, self.out_feats):
                seed = jax.random.bits(attn_rng, dtype=jnp.uint32)
                rst = sparse_gat_attention(
                    csr,
                    el,
                    er,
                    feat_src,
                    negative_slope=negative_slope,
                    csr_t=getattr(graph, "bwd_csr", None),
                    attn_drop_rate=self.attn_drop,
                    attn_drop_seed=seed,
                )
                if self.activation is not None:
                    rst = self.activation(rst)
                return rst

        if use_attn_drop and concrete:
            # Edge-domain jnp fallback (flash tiling unsupported): explicit
            # alpha so the mask applies per coefficient; differentiable
            # end-to-end through XLA.
            import numpy as np

            from stgraph_tpu.ops import segment as seg

            _, rows_np, cols_np, _ = csr.host_arrays()
            rows_c = np.minimum(rows_np, n - 1)
            cols_c = np.minimum(cols_np, n - 1)
            emask = jnp.asarray(rows_np < n)
            s = el[..., 0][cols_c] + er[..., 0][rows_c]
            s = jnp.where(s >= 0, s, negative_slope * s)
            alpha = seg.segment_softmax(
                s, jnp.asarray(rows_c), n, edge_mask=emask
            )
            keep = jax.random.bernoulli(
                attn_rng, 1.0 - self.attn_drop, alpha.shape
            )
            alpha = jnp.where(keep, alpha / (1.0 - self.attn_drop), 0.0)
            msg = feat_src[cols_c] * alpha[:, :, None]
            rst = seg.segment_sum(
                msg, jnp.asarray(rows_c), n, edge_mask=emask
            )
            if self.activation is not None:
                rst = self.activation(rst)
            return rst

        # Large-graph fast path: scatter-free fused segment softmax —
        # stability max on the narrow position-masked kernel, normalizer
        # fused into the multihead blocked SpMM (ops/attention.py).
        if self.impl in ("auto", "sparse") and concrete:
            from stgraph_tpu.ops.attention import sparse_gat_attention

            rst = sparse_gat_attention(
                csr,
                el,
                er,
                feat_src,
                negative_slope=negative_slope,
                blocked=getattr(graph, "blocked_fwd", None),
                blocked_t=getattr(graph, "blocked_bwd", None),
                csr_t=getattr(graph, "bwd_csr", None),
            )
            if self.activation is not None:
                rst = self.activation(rst)
            return rst

        stgraph = STGraph()

        @stgraph.compile(gnn_module=self, impl=self.impl)
        def nb_forward(v):
            # leaky_relu before the stability shift, matching DGL/paper.
            embs = [
                dsl.leaky_relu(nb.el + v.er, negative_slope=negative_slope)
                for nb in v.innbs
            ]
            m = dsl.agg_max(embs)
            coeff = [dsl.exp(emb - m) for emb in embs]
            s = dsl.agg_sum(coeff)
            alpha = [c / s for c in coeff]
            feat_srcs = [nb.feat_src for nb in v.innbs]
            return sum([alpha[i] * feat_srcs[i] for i in range(len(feat_srcs))])

        rst = nb_forward(
            graph, n_feats={"el": el, "er": er, "feat_src": feat_src}
        )

        if self.activation is not None:
            rst = self.activation(rst)
        return rst
