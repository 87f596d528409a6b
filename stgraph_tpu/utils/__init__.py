"""Utilities: normalization helpers, metrics tables, constants."""

from stgraph_tpu.utils.norm import symmetric_norm

__all__ = ["symmetric_norm"]
