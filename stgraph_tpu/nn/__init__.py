"""NN layer zoo: GCN, GAT, TGCN, EvolveGCN on the vertex-centric frontend.

TPU re-design of the reference ``stgraph/nn/pytorch/`` (torch modules →
flax.linen modules; compiled vertex programs inside ``__call__``).
"""

from stgraph_tpu.nn.gcn_conv import GCNConv
from stgraph_tpu.nn.gat_conv import GATConv
from stgraph_tpu.nn.tgcn import TGCN

__all__ = ["GATConv", "GCNConv", "TGCN"]

from stgraph_tpu.nn.evolvegcn import EvolveGCNH, EvolveGCNO

__all__ += ["EvolveGCNH", "EvolveGCNO"]
