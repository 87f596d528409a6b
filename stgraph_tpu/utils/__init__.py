"""Utilities: normalization helpers, metrics tables, checkpointing, profiling."""

from stgraph_tpu.utils.norm import symmetric_norm
from stgraph_tpu.utils.data_table import DataTable
from stgraph_tpu.utils.checkpoint import Checkpointer
from stgraph_tpu.utils import profiler

__all__ = ["Checkpointer", "DataTable", "profiler", "symmetric_norm"]
