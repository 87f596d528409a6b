"""Message-passing primitives over CSR graphs: gather, SpMM, SDDMM.

This module is the functional target of the vertex-centric compiler's
lowering (``stgraph_tpu.compiler.lowering``) and the contract the Pallas
kernels implement. Three execution paths share one semantics:

  * ``impl='jnp'``   — pure jnp gather + sorted segment reduce. The oracle.
  * ``impl='dense'`` — adjacency as a dense (N, N) matrix; aggregation is a
    plain MXU matmul. For the small graphs that dominate the temporal
    benchmarks (N ≲ 4k: Cora 2708, England-COVID 129, WindmillOutput ≤ 319)
    this is the fastest thing a TPU can do — the systolic array at full
    tilt — and XLA batches it over timesteps for free.
  * ``impl='pallas'`` — blocked-CSR Pallas kernels (``stgraph_tpu.ops.spmm_pallas``)
    for graphs too large for dense.

``impl='auto'`` picks dense when the adjacency fits a budget, else pallas on
TPU, else jnp.

Reference equivalents: the generated fused kernels of
``stgraph/compiler/code_gen/templates/fa/tpl_fa_csr.jinja`` (gather +
edge-compute + aggregate) and their transpose-CSR backward launches
(``stgraph/compiler/execution_unit.py:241-269``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stgraph_tpu.graph.csr import CSR
from stgraph_tpu.ops import segment as seg

__all__ = [
    "gather_src",
    "gather_dst",
    "edge_data_to_csr_order",
    "aggregate",
    "spmm",
    "sddmm",
    "csr_to_dense",
]

# Dense-path budget: adjacency bytes we are willing to spend. 64 MB of f32
# covers N = 4096; bf16 doubles that. Kept deliberately small relative to
# HBM so large graphs route to the sparse kernels.
_DENSE_BUDGET_BYTES = 64 * 1024 * 1024

# Minimum edge capacity for the 'auto' Pallas route. Graphs under the
# dense-adjacency budget never get here; in the mid-size band the blocked
# kernel already beats the XLA scatter (measured ~2x at 10k edges), so the
# bar is set just above the dense regime's edge counts.
_PALLAS_MIN_EDGES = 50_000


def gather_src(csr: CSR, node_feat: jnp.ndarray) -> jnp.ndarray:
    """Per-edge source features: ``node_feat[src]`` in CSR edge order."""
    return node_feat[csr.cols]


def gather_dst(csr: CSR, node_feat: jnp.ndarray) -> jnp.ndarray:
    """Per-edge destination features: ``node_feat[dst]`` in CSR edge order."""
    return node_feat[csr.rows]


def edge_data_to_csr_order(csr: CSR, edata: jnp.ndarray) -> jnp.ndarray:
    """Permute user-order edge data into CSR edge order via ``eids``.

    Same role as the reference's eids indirection in the generated kernels
    (``tpl_fa_csr.jinja:32-34``).
    """
    return edata[jnp.minimum(csr.eids, edata.shape[0] - 1)]


def aggregate(
    csr: CSR,
    edge_vals: jnp.ndarray,
    reduce: str = "sum",
    masked: bool = True,
    blocked=None,
) -> jnp.ndarray:
    """Segment-reduce per-edge values into per-destination rows.

    On TPU, large-graph reductions route to scatter-free Pallas kernels:
    narrow trailing widths (GAT logits/normalizers, K <= 16) go to the
    position-masked kernels in ``ops.segment_pallas`` (sum/max/mean —
    measured 6-12x over the XLA scatter at 2M edges); wide sums with a
    blocked layout at hand go to the 128-lane blocked MXU kernel."""
    concrete = not isinstance(csr.rows, jax.core.Tracer) and not isinstance(
        csr.indptr, jax.core.Tracer
    )
    if _on_tpu() and concrete and csr.capacity >= _PALLAS_MIN_EDGES:
        from stgraph_tpu.ops import segment_pallas as nsp

        k = int(np.prod(edge_vals.shape[1:])) if edge_vals.ndim > 1 else 1
        if reduce in ("sum", "max", "mean"):
            narrow = k <= nsp.MAX_NARROW_K
            if reduce == "sum":
                fn = nsp.segment_sum_narrow if narrow else nsp.segment_sum_wide
                return fn(csr, edge_vals)
            if reduce == "max":
                fn = nsp.segment_max_narrow if narrow else nsp.segment_max_wide
                return fn(csr, edge_vals)
            # mean = sum / host-side in-degree (empty rows -> 0/1=0, the
            # reference's divisor semantics, registry.py:96-99)
            indptr, _, _, _ = csr.host_arrays()
            deg = np.maximum(indptr[1:] - indptr[:-1], 1).astype(np.float32)
            fn = nsp.segment_sum_narrow if narrow else nsp.segment_sum_wide
            s = fn(csr, edge_vals)
            return s / deg.reshape((csr.num_nodes,) + (1,) * (s.ndim - 1))
    mask = csr.edge_mask if masked else None
    fn = {
        "sum": seg.segment_sum,
        "max": seg.segment_max,
        "min": seg.segment_min,
        "mean": seg.segment_mean,
    }[reduce]
    return fn(edge_vals, csr.rows, csr.num_nodes, edge_mask=mask)


def csr_to_dense(
    csr: CSR,
    edge_weight: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Materialize the (N, N) dense adjacency A[dst, src].

    ``A @ H`` then equals sum-aggregation of in-neighbor features. Padding
    edges scatter out of range and are dropped.
    """
    n = csr.num_nodes
    vals = (
        jnp.ones(csr.capacity, dtype=dtype)
        if edge_weight is None
        else edge_weight.reshape(-1).astype(dtype)
    )
    vals = jnp.where(csr.edge_mask, vals, 0)
    flat = csr.rows.astype(jnp.int32) * n + csr.cols.astype(jnp.int32)
    flat = jnp.where(csr.edge_mask, flat, n * n)
    dense = jax.ops.segment_sum(vals, flat, num_segments=n * n)
    return dense.reshape(n, n)


def spmm(
    csr: CSR,
    node_feat: jnp.ndarray,
    edge_weight: Optional[jnp.ndarray] = None,
    reduce: str = "sum",
    impl: str = "auto",
    blocked=None,
    blocked_t=None,
    csr_t: Optional[CSR] = None,
) -> jnp.ndarray:
    """out[dst] = reduce_{(src,dst) in E} edge_weight * node_feat[src].

    ``edge_weight`` is in CSR edge order, shape (capacity,) or
    (capacity, 1) (or (capacity, H) for per-head weights against
    (N, H, F) features — broadcasting rules follow the IR's bcast_dim,
    reference ``compiler/utils.py:86``).
    """
    impl = _resolve_impl(csr, node_feat, impl, reduce, has_blocked=blocked is not None)
    if edge_weight is not None:
        edge_weight = jnp.asarray(edge_weight)
        if edge_weight.ndim == 0:
            # Scalar weight: fold into the features, keep the fast paths.
            node_feat = node_feat * edge_weight
            edge_weight = None
    # The dense path folds one scalar weight per edge into the adjacency;
    # per-head weights (E, H) take the multi-head Pallas kernel on TPU
    # (one MXU matmul per edge chunk over flattened H·F lanes) and the jnp
    # segment reduction elsewhere.
    if impl == "dense" and not (
        edge_weight is None or edge_weight.size == csr.capacity
    ):
        impl = (
            "pallas"
            if (
                blocked is not None
                and _on_tpu()
                and csr.capacity >= _PALLAS_MIN_EDGES
            )
            else "jnp"
        )
    if impl == "dense" and reduce == "sum":
        # Build A at trace time when graph and weights are concrete: the
        # scatter then runs once per trace, not once per step. Folded on the
        # CPU backend and kept as HOST numpy — embedding a device-array
        # constant would pull it device->host at every lowering, which is
        # pathologically slow over remote-TPU tunnels (docs/PERF.md).
        w_c = edge_weight
        if not any(
            isinstance(a, jax.core.Tracer)
            for a in (csr.rows, csr.cols) + (() if w_c is None else (w_c,))
        ):
            import numpy as _np

            cpu = jax.devices("cpu")[0]
            with jax.ensure_compile_time_eval(), jax.default_device(cpu):
                a = csr_to_dense(csr, edge_weight, dtype=node_feat.dtype)
            a = _np.asarray(a)
        else:
            a = csr_to_dense(csr, edge_weight, dtype=node_feat.dtype)
        flat = node_feat.reshape(node_feat.shape[0], -1)
        out = jnp.dot(a, flat, preferred_element_type=jnp.float32)
        return out.astype(node_feat.dtype).reshape(node_feat.shape)
    if impl == "pallas":
        from stgraph_tpu.ops import spmm_pallas

        return spmm_pallas.spmm(
            csr,
            node_feat,
            edge_weight,
            reduce,
            blocked=blocked,
            blocked_t=blocked_t,
            csr_t=csr_t,
        )
    # jnp path
    msg = gather_src(csr, node_feat)
    if edge_weight is not None:
        w = edge_weight
        if w.ndim < msg.ndim:
            w = w.reshape(w.shape + (1,) * (msg.ndim - w.ndim))
        msg = msg * w
    return aggregate(csr, msg, reduce=reduce)


def sddmm(
    csr: CSR,
    src_feat: jnp.ndarray,
    dst_feat: jnp.ndarray,
    op: str = "dot",
) -> jnp.ndarray:
    """Sampled dense-dense products: per-edge  op(src_feat[s], dst_feat[d]).

    ``op='dot'`` contracts the last axis (GAT attention scores); ``op='add'``
    / ``'mul'`` are elementwise. Output is in CSR edge order.
    """
    a = gather_src(csr, src_feat)
    b = gather_dst(csr, dst_feat)
    if op == "dot":
        return jnp.sum(a * b, axis=-1)
    if op == "add":
        return a + b
    if op == "mul":
        return a * b
    raise ValueError(f"unknown sddmm op: {op}")


def _resolve_impl(
    csr: CSR, node_feat: jnp.ndarray, impl: str, reduce: str, has_blocked: bool = False
) -> str:
    if impl != "auto":
        return impl
    n = csr.num_nodes
    itemsize = jnp.dtype(node_feat.dtype).itemsize
    if reduce == "sum" and n * n * itemsize <= _DENSE_BUDGET_BYTES:
        return "dense"
    if (
        reduce == "sum"
        and has_blocked
        and _on_tpu()
        and csr.capacity >= _PALLAS_MIN_EDGES
    ):
        return "pallas"
    return "jnp"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False
