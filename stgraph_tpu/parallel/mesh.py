"""Device-mesh helpers.

The TPU build's device model: a ``jax.sharding.Mesh`` with a ``graph``
axis for edge-partitioned message passing and an optional ``data`` axis for
batch/snapshot parallelism. Replaces nothing in the reference (single-GPU,
SURVEY §2.6) — this is the net-new scaling layer.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(
    graph: Optional[int] = None, data: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Create a ('data', 'graph') mesh.

    ``graph`` defaults to all available devices divided by ``data``. On a
    pod slice, call ``jax.distributed.initialize()`` first so
    ``jax.devices()`` spans hosts.
    """
    devices = list(devices if devices is not None else jax.devices())
    if graph is None:
        graph = len(devices) // data
    n = data * graph
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, graph)
    return Mesh(arr, ("data", "graph"))
