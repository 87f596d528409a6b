"""Utilities: normalization helpers, metrics tables, constants."""

from stgraph_tpu.utils.norm import symmetric_norm
from stgraph_tpu.utils.data_table import DataTable

__all__ = ["DataTable", "symmetric_norm"]
