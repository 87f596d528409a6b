"""Utilities: normalization helpers, metrics tables, checkpointing, profiling."""

from stgraph_tpu.utils.norm import symmetric_norm
from stgraph_tpu.utils.data_table import DataTable
from stgraph_tpu.utils.checkpoint import Checkpointer
from stgraph_tpu.utils.constants import SizeConstants, TileConstants
from stgraph_tpu.utils.device_info import DeviceInfo
from stgraph_tpu.utils.fetch import d2h_available, device_fetch, fetch_float
from stgraph_tpu.utils.train_utils import EarlyStopping, accuracy
from stgraph_tpu.utils import profiler

__all__ = [
    "Checkpointer",
    "DataTable",
    "DeviceInfo",
    "EarlyStopping",
    "SizeConstants",
    "TileConstants",
    "accuracy",
    "d2h_available",
    "device_fetch",
    "fetch_float",
    "profiler",
    "symmetric_norm",
]
