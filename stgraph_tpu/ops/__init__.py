"""Sparse message-passing ops: segment reductions, SpMM, SDDMM, softmax.

Three interchangeable execution paths (pure jnp oracle, dense-adjacency MXU
path, blocked-CSR Pallas kernels) behind one functional API — the TPU
replacement for the reference's generated CUDA kernels
(``stgraph/compiler/code_gen/``).
"""

from stgraph_tpu.ops.message import (
    aggregate,
    csr_to_dense,
    edge_data_to_csr_order,
    gather_dst,
    gather_src,
    sddmm,
    spmm,
)
from stgraph_tpu.ops.segment import (
    broadcast_to_edges,
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
)
from stgraph_tpu.ops.segment_pallas import (
    segment_max_narrow,
    segment_sum_narrow,
    spmm_rowmask,
)

__all__ = [
    "aggregate",
    "broadcast_to_edges",
    "csr_to_dense",
    "edge_data_to_csr_order",
    "gather_dst",
    "gather_src",
    "sddmm",
    "segment_max",
    "segment_max_narrow",
    "segment_mean",
    "segment_min",
    "segment_softmax",
    "segment_sum",
    "segment_sum_narrow",
    "spmm",
    "spmm_rowmask",
]
