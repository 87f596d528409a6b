"""STGraph-TPU: a TPU-native vertex-centric GNN/TGNN training framework.

A from-scratch re-design of the capabilities of STGraph (reference:
``/root/reference``, bfGraph/STGraph v1.1.0) for TPU hardware:

- the Seastar-style vertex-centric programming model (one-line per-vertex
  aggregation formulas, reference ``stgraph/compiler/stgraph.py``) traces to a
  small op-graph IR and lowers to fused JAX/Pallas sparse kernels instead of
  Jinja-templated CUDA (reference ``stgraph/compiler/code_gen/``);
- autodiff is JAX's ``jax.vjp`` plus ``jax.custom_vjp`` on the fused kernels,
  replacing the reference's symbolic ``diff()`` pass
  (``stgraph/compiler/autodiff.py``) and the Seastar state stack
  (``stgraph/compiler/executor.py``);
- CSR graph storage lives in HBM as padded, statically-shaped device arrays
  (``stgraph_tpu.graph``), with dynamic-graph delta updates recast as
  XLA-friendly sort/scan updates rather than PCSR/GPMA rebalancing
  (reference ``stgraph/graph/dynamic/``);
- a net-new distribution layer (``stgraph_tpu.parallel``) edge-partitions the
  graph over a ``jax.sharding.Mesh`` and overlaps boundary-feature halo
  exchange with local aggregation via ``shard_map`` — the reference is
  single-GPU only.
"""

from stgraph_tpu import compiler, dataset, graph, nn, ops, parallel, serve, utils
from stgraph_tpu.compiler.stgraph import STGraph
from stgraph_tpu.graph import CSR, StaticGraph

__version__ = "0.1.0"

__all__ = [
    "CSR",
    "STGraph",
    "StaticGraph",
    "compiler",
    "dataset",
    "graph",
    "nn",
    "ops",
    "parallel",
    "serve",
    "utils",
]
