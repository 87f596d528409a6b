"""Window-parallel temporal training on a 2-D ('data', 'graph') mesh.

DTDG/TGCN mini-batching (ROADMAP "2-D meshes"): BPTT windows are
data-parallel — each window threads its own hidden state through time, so
different windows can train on different device groups while every group
keeps the graph edge-partitioned over its 'graph' sub-axis.

Mechanics: ONE flat ``shard_map`` manual over BOTH axes. Inside it the
graph-manual primitives (``dist_tgcn_cell`` → ``dist_spmm`` halo
exchange) run in ``manual_shard_map``'s bypass mode (``parallel/mesh.py``):
since 'graph' is already manual, no inner shard_map is constructed — the
shard-local bodies run inline, with the host-constant graph metadata
sliced per shard via ``axis_index``. This flat structure exists because
jax 0.9's sdy verifier rejects TRANSPOSING a nested shard_map ("Saw
manual axis 'graph' after free axis 'data'") — nesting works forward but
not under ``jax.grad``; a single flat manual region differentiates fine,
so 2-D-mesh training trains (``tests/test_batch2d.py`` grads test).

Gradients w.r.t. the replicated parameters are summed across 'data' and
'graph' by the flat shard_map transpose automatically — there is no
hand-written gradient reduction.

Net-new vs the reference (single-GPU, one window at a time —
``benchmarking/static-temporal-tgcn/seastar/train.py:124-131`` processes
``backprop_every`` windows strictly sequentially).
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
    the batch-mean gradient (the flat shard_map transpose psums the
    replicated-parameter cotangents over both axes).

    Padding rows (index >= ``dg.num_nodes``) are masked out of the loss:
    TGCN GRU biases make hidden nonzero even on zero-input rows, so an
    unmasked mean would add spurious padding-row error terms and count
    fake nodes in the denominator.
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
    ns = dg.nodes_per_shard
    n_real = dg.num_nodes

    def outer(p, norm_l, xs_l, ys_l):
        # Shard-local slice of the real-row mask (global row id < n_real).
        gid0 = jax.lax.axis_index("graph") * ns
        mask = (gid0 + jnp.arange(ns) < n_real)[:, None]

        def one_window(xs, ys):
            def step(hidden, xy):
                x_t, y_t = xy
                hidden = dist_tgcn_cell(mesh, dg, p, x_t, norm_l, hidden)
                err = jnp.where(mask, (hidden - y_t) ** 2, 0.0)
                loss_t = jax.lax.psum(err.sum(), "graph") / (
                    n_real * out_feats
                )
                return hidden, loss_t

            # The carry becomes axis-varying after the first cell call;
            # seed it as varying so scan's carry types are stable.
            h0 = jax.lax.pcast(
                jnp.zeros((ns, out_feats), xs.dtype),
                (data_axis, "graph"), to="varying",
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
        in_specs=(
            P(),
            P("graph", None),
            P(data_axis, None, "graph", None),
            P(data_axis, None, "graph", None),
        ),
        out_specs=P(),
        axes=(data_axis, "graph"),
    )
    return run(params, norm, xs_b, ys_b)
