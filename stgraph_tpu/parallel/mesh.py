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


def _context_manual_axes() -> frozenset:
    """Names of mesh axes that are Manual in the current trace context."""
    try:
        am = jax.sharding.get_abstract_mesh()
        return frozenset(
            n
            for n, t in zip(
                getattr(am, "axis_names", ()), getattr(am, "axis_types", ())
            )
            if t == jax.sharding.AxisType.Manual
        )
    except Exception:
        return frozenset()


def _slice_local(x, spec, mesh_axis_sizes):
    """Slice a GLOBAL host-constant array down to this shard's slice per
    its PartitionSpec, using ``axis_index`` for the position."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    for dim, part in enumerate(tuple(spec)):
        if part is None:
            continue
        names = part if isinstance(part, tuple) else (part,)
        size = x.shape[dim]
        lin = None
        for name in names:
            size //= mesh_axis_sizes[name]
            idx = jax.lax.axis_index(name)
            lin = idx if lin is None else lin * mesh_axis_sizes[name] + idx
        x = jax.lax.dynamic_slice_in_dim(x, lin * size, size, axis=dim)
    return x


def manual_shard_map(
    body=None,
    *,
    mesh: Mesh,
    in_specs,
    out_specs,
    axes: Sequence[str] = ("graph",),
    check_vma: bool = True,
):
    """``shard_map`` manual over ``axes`` only — nestable AND flattenable.

    Standalone this is plain ``jax.shard_map`` restricted to ``axes``
    (other mesh axes stay automatic, so a ('data', 'graph') mesh runs the
    graph-manual body once, replicated over 'data'). Inside an OUTER
    manual region over *different* axes the context's AbstractMesh is used
    instead of ``mesh`` — jax requires nested shard_maps to share the
    context mesh. Usable directly or as a decorator (``body=None``).

    **Bypass mode** (the flat-2-D path, ``parallel/batch.py``): when the
    requested ``axes`` are ALREADY manual in the context — i.e. the caller
    flattened what would have been a nested shard_map into one region over
    all axes — no inner shard_map is built at all (transposing a *nested*
    shard_map trips jax 0.9's sdy verifier; a single flat region
    differentiates fine). Instead the body runs inline under this
    convention: host-constant args (numpy leaves — graph metadata) arrive
    GLOBAL and are sliced down to the shard per ``in_specs`` via
    ``axis_index``; traced args are assumed ALREADY LOCAL and pass
    through; the body's return value is the shard-local result
    (``out_specs`` is not applied — the caller lives inside the manual
    region and consumes local values).
    """
    kw = dict(
        in_specs=in_specs,
        out_specs=out_specs,
        axis_names=frozenset(axes),
        check_vma=check_vma,
    )
    req = frozenset(axes)

    def wrap(f):
        # The manual-context check must run when the wrapped body is
        # TRACED, not when the wrapper is built: a function constructed
        # outside a manual region but later invoked inside one must use
        # the context's AbstractMesh (jax rejects a concrete mesh there).
        def call(*args):
            manual = _context_manual_axes()
            if req & manual:
                if not req <= manual:
                    raise NotImplementedError(
                        f"axes {sorted(req)} partially manual in context "
                        f"{sorted(manual)}; flatten all or none"
                    )
                from jax._src.tree_util import broadcast_prefix

                sizes = dict(mesh.shape)
                specs_flat = broadcast_prefix(tuple(in_specs), args)
                leaves, treedef = jax.tree_util.tree_flatten(args)
                sliced = [
                    _slice_local(x, s, sizes)
                    if isinstance(x, np.ndarray)
                    else x
                    for x, s in zip(leaves, specs_flat)
                ]
                return f(*jax.tree_util.tree_unflatten(treedef, sliced))
            k = dict(kw)
            if not manual:
                k["mesh"] = mesh
            return jax.shard_map(f, **k)(*args)

        return call

    if body is None:
        return wrap
    return wrap(body)


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
