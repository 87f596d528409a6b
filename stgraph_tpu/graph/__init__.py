"""Graph storage layer: CSR core, static and dynamic graph classes.

TPU-native re-design of the reference ``stgraph/graph/`` package (CSR in
``csr.cu``, dynamic structures in ``dynamic/{naive,pcsr,gpma}``): device
pointers become statically-shaped ``jnp`` array pytrees, and dynamic
structure updates become functional delta replays.
"""

from stgraph_tpu.graph.csr import CSR, build_csr, round_up
from stgraph_tpu.graph.static_graph import StaticGraph
from stgraph_tpu.graph.dynamic_graph import DynamicGraph
from stgraph_tpu.graph.naive_graph import NaiveGraph
from stgraph_tpu.graph.delta_graph import DeltaGraph
from stgraph_tpu.graph.reorder import locality_order, relabel_edges

__all__ = [
    "CSR",
    "DeltaGraph",
    "DynamicGraph",
    "NaiveGraph",
    "StaticGraph",
    "build_csr",
    "locality_order",
    "relabel_edges",
    "round_up",
]
