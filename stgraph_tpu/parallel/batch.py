"""Window-parallel temporal training on a 2-D ('data', 'graph') mesh.

DTDG/TGCN mini-batching (ROADMAP "2-D meshes"): BPTT windows are
data-parallel — each window threads its own hidden state through time, so
different windows can train on different device groups while every group
keeps the graph edge-partitioned over its 'graph' sub-axis.

Mechanics: one OUTER ``shard_map`` manual over the 'data' axis splits the
window batch; inside it the existing graph-manual primitives
(``dist_tgcn_cell`` → ``dist_spmm`` halo exchange) nest via
``manual_shard_map``'s context-mesh path (``parallel/mesh.py``). Gradients
w.r.t. the replicated parameters are summed across 'data' by the shard_map
transpose automatically — there is no hand-written gradient reduction.

Net-new vs the reference (single-GPU, one window at a time —
``benchmarking/static-temporal-tgcn/seastar/train.py:124-131`` processes
``backprop_every`` windows strictly sequentially).

Known limitation (jax 0.9): the FORWARD nests and matches the sequential
oracle, but TRANSPOSING the nested shard_map (``jax.grad``) trips an sdy
verifier bug — the inner manual computation's operand shardings order the
outer free axis before the inner manual axis ("Saw manual axis 'graph'
after free axis 'data'"). Tracked by the strict-xfail
``tests/test_batch2d.py::test_batched_tgcn_grads_match_sequential``;
training on 2-D meshes is gated on a jax fix (or on threading gradients
per data-shard once sdy accepts nested transposes).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stgraph_tpu.parallel.layers import dist_tgcn_cell
from stgraph_tpu.parallel.mesh import manual_shard_map
from stgraph_tpu.parallel.partition import DistGraph

__all__ = ["dist_tgcn_batched_loss", "shard_window_batch"]


def shard_window_batch(mesh: Mesh, xs: jnp.ndarray, dg: DistGraph):
    """Device-place a (B, T, N, F) window batch: windows over 'data', node
    rows over 'graph'. Pads node rows to ``dg.padded_nodes``."""
    b, t, n, f = xs.shape
    pad = dg.padded_nodes - n
    if pad:
        xs = jnp.concatenate(
            [xs, jnp.zeros((b, t, pad, f), xs.dtype)], axis=2
        )
    return jax.device_put(
        xs, NamedSharding(mesh, P("data", None, "graph", None))
    )


def dist_tgcn_batched_loss(
    mesh: Mesh,
    dg: DistGraph,
    params: Dict,
    norm: jnp.ndarray,  # (padded_nodes, 1) graph-sharded
    xs_b: jnp.ndarray,  # (B, T, padded_nodes, F) data+graph sharded
    ys_b: jnp.ndarray,  # (B, T, padded_nodes, F_out)
    data_axis: str = "data",
) -> jnp.ndarray:
    """Mean MSE of TGCN regression over a batch of BPTT windows.

    Each window runs its own hidden-state scan; windows are split across
    ``data_axis``. Differentiable: ``jax.grad`` w.r.t. ``params`` yields
    the batch-mean gradient (the outer shard_map transpose psums the
    replicated-parameter cotangents over 'data').
    """
    if mesh.shape.get(data_axis, 1) > 1 and (
        xs_b.shape[0] % mesh.shape[data_axis]
    ):
        raise ValueError(
            f"window batch {xs_b.shape[0]} not divisible by "
            f"{data_axis}={mesh.shape[data_axis]}"
        )
    b_local = xs_b.shape[0] // mesh.shape.get(data_axis, 1)
    out_feats = params["conv_z"]["weight"].shape[1]

    def outer(p, norm_a, xs_l, ys_l):
        def one_window(xs, ys):
            def step(hidden, xy):
                x_t, y_t = xy
                hidden = dist_tgcn_cell(mesh, dg, p, x_t, norm_a, hidden)
                return hidden, jnp.mean((hidden - y_t) ** 2)

            # The carry becomes data-varying after the first cell call;
            # seed it as varying so scan's carry types are stable.
            h0 = jax.lax.pcast(
                jnp.zeros((xs.shape[1], out_feats), xs.dtype),
                (data_axis,), to="varying",
            )
            _, losses = jax.lax.scan(step, h0, (xs, ys))
            return losses.mean()

        loss = jnp.stack(
            [one_window(xs_l[i], ys_l[i]) for i in range(b_local)]
        ).mean()
        return jax.lax.pmean(loss, data_axis)

    run = manual_shard_map(
        outer,
        mesh=mesh,
        in_specs=(P(), P(), P(data_axis), P(data_axis)),
        out_specs=P(),
        axes=(data_axis,),
    )
    return run(params, norm, xs_b, ys_b)
