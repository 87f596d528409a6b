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

__all__ = ["make_mesh", "manual_shard_map"]


def _in_manual_context() -> bool:
    """True while tracing inside an outer ``shard_map`` manual region."""
    try:
        am = jax.sharding.get_abstract_mesh()
        return any(
            t == jax.sharding.AxisType.Manual
            for t in getattr(am, "axis_types", ())
        )
    except Exception:
        return False


def manual_shard_map(
    body=None,
    *,
    mesh: Mesh,
    in_specs,
    out_specs,
    axes: Sequence[str] = ("graph",),
    check_vma: bool = True,
):
    """``shard_map`` manual over ``axes`` only — nestable.

    Standalone this is plain ``jax.shard_map`` restricted to ``axes``
    (other mesh axes stay automatic, so a ('data', 'graph') mesh runs the
    graph-manual body once, replicated over 'data'). Inside an OUTER
    manual region (e.g. a window-parallel wrapper manual over 'data',
    ``parallel/batch.py``) the context's AbstractMesh is used instead of
    ``mesh`` — jax requires nested shard_maps to share the context mesh.
    Usable directly or as a decorator (``body=None``).
    """
    kw = dict(
        in_specs=in_specs,
        out_specs=out_specs,
        axis_names=frozenset(axes),
        check_vma=check_vma,
    )
    if not _in_manual_context():
        kw["mesh"] = mesh
    if body is None:
        return lambda f: jax.shard_map(f, **kw)
    return jax.shard_map(body, **kw)


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
