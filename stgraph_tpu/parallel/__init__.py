"""Distribution layer: edge partitioning + halo exchange over device meshes.

Net-new relative to the single-GPU reference (SURVEY §2.6). Host-side
partitioner in ``partition.py``; shard_map halo-exchange SpMM in
``halo.py``; mesh helpers in ``mesh.py``.
"""

from stgraph_tpu.parallel.halo import (
    dist_gat_attention,
    dist_spmm,
    replicate,
    shard_edge_array,
    shard_node_array,
)
from stgraph_tpu.parallel.mesh import make_mesh, manual_shard_map
from stgraph_tpu.parallel import launch
from stgraph_tpu.parallel.batch import (
    dist_tgcn_batched_loss,
    shard_window_batch,
)
from stgraph_tpu.parallel.layers import (
    dist_gat_conv,
    dist_gat_params,
    dist_gcn_conv,
    dist_gcn_params,
    dist_tgcn_cell,
    dist_tgcn_params,
)
from stgraph_tpu.parallel.partition import DistGraph, partition_edges
from stgraph_tpu.parallel.dyn import (
    DistDynGraph,
    dist_dyn_apply_delta,
    dist_dyn_degree,
    dist_dyn_spmm,
    partition_dynamic,
    shard_dyn_arrays,
)

__all__ = [
    "DistDynGraph",
    "DistGraph",
    "dist_dyn_apply_delta",
    "dist_dyn_degree",
    "dist_dyn_spmm",
    "partition_dynamic",
    "shard_dyn_arrays",
    "dist_gat_attention",
    "dist_gat_conv",
    "dist_gat_params",
    "dist_gcn_conv",
    "dist_gcn_params",
    "dist_spmm",
    "dist_tgcn_batched_loss",
    "dist_tgcn_cell",
    "dist_tgcn_params",
    "launch",
    "make_mesh",
    "manual_shard_map",
    "shard_window_batch",
    "partition_edges",
    "replicate",
    "shard_edge_array",
    "shard_node_array",
]
