"""Distributed SpMM: shard_map halo exchange + local aggregation.

The device-side half of the distribution layer (host half:
``parallel/partition.py``). Per BASELINE.json: "edge-partitioning the
graph, exchanging boundary vertex features all-to-all over ICI and
overlapping the exchange with local neighborhood aggregation".

Inside ``shard_map`` each shard:

  1. gathers its outgoing halo rows (``send_idx``) into a (P, K, F) buffer;
  2. ``jax.lax.all_to_all`` swaps buffers over the ``graph`` mesh axis —
     on hardware this rides ICI, and XLA's async collectives let the
     **interior** aggregation (edges whose sources are local) overlap the
     exchange: interior edges never touch the halo buffer, so their
     segment-sum has no data dependency on the collective;
  3. aggregates over the widened [local | halo] feature buffer.

Autodiff: shard_map is differentiable — ``all_to_all`` transposes to
``all_to_all``, the halo gather transposes to a scatter-add — so the
gradient halo reduction the reference would have needed to hand-write is
synthesized by JAX (SURVEY §5.8).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from stgraph_tpu.graph.csr import CSR
from stgraph_tpu.ops import message as M
from stgraph_tpu.parallel.partition import DistGraph

__all__ = ["dist_spmm", "shard_node_array", "replicate"]


def shard_node_array(mesh: Mesh, x: jnp.ndarray, dg: DistGraph) -> jnp.ndarray:
    """Pad a (N, ...) global node array to P·Ns rows and shard over 'graph'."""
    pad = dg.padded_nodes - x.shape[0]
    if pad:
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    spec = P("graph", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def _shard_blocked(blk_arrays, num_nodes: int, rows_padded: int, capacity: int):
    """Rebuild a per-shard BlockedCSR from shard-sliced stacked arrays."""
    from stgraph_tpu.graph.blocked import BlockedCSR

    zeros = jnp.zeros((capacity,), jnp.int32)  # perm/eids unused by the kernel
    return BlockedCSR(
        offsets=blk_arrays["offsets"][0],
        counts=blk_arrays["counts"][0],
        dst=blk_arrays["dst"][0],
        cols=blk_arrays["cols"][0],
        perm=zeros,
        eids=zeros,
        num_nodes=num_nodes,
        num_rows_padded=rows_padded,
        csr_capacity=capacity,
    )


def dist_spmm(
    mesh: Mesh,
    dg: DistGraph,
    h: jnp.ndarray,
    axis: str = "graph",
    overlap: bool = True,
    impl: str = "jnp",
    interpret: bool = False,
) -> jnp.ndarray:
    """out[d] = sum over in-edges of h[src], edge-partitioned over ``axis``.

    ``h`` is the (P·Ns, F) node-sharded feature array; returns the same
    sharding. Unweighted sum aggregation (GCN folds its normalization into
    node features; fused-weight variants follow the same pattern).

    ``overlap=True`` aggregates interior edges (local sources) as a
    separate reduction with no data dependency on the halo ``all_to_all``,
    so XLA's async collectives hide the exchange behind it; the frontier
    edges then reduce over the received halo buffer alone. ``False`` keeps
    the single-reduction formulation over the widened ``[local | halo]``
    buffer (used by the equivalence tests).

    ``impl='pallas'`` runs each shard's interior/frontier reduction on the
    blocked-CSR MXU kernel (layouts precomputed by the partitioner);
    requires ``overlap=True``. ``'jnp'`` uses the XLA segment reduction.
    """
    f = h.shape[-1]
    ns, k, p = dg.nodes_per_shard, dg.halo_size, dg.num_shards
    if impl == "pallas":
        if not overlap:
            raise ValueError("impl='pallas' requires overlap=True")
        if dg.interior_blocked is None:
            raise ValueError(
                "impl='pallas' requires blocked layouts; rebuild the "
                "DistGraph with partition_edges()"
            )
    use_pallas = impl == "pallas"

    def _unstack_csr(stacked) -> CSR:
        c = jax.tree_util.tree_map(lambda x: x[0], stacked)
        return CSR(
            indptr=c.indptr,
            rows=c.rows,
            cols=c.cols,
            eids=c.eids,
            num_nodes=ns,
            num_edges=c.num_edges,
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(axis),  # send_idx stacked over shards
            P(axis),  # local_csr pytree (prefix spec: dim0 of every leaf)
            P(axis),  # interior_csr
            P(axis),  # frontier_csr
            P(axis),  # interior_blocked dict ({} when unused)
            P(axis),  # frontier_blocked dict
            P(axis, None),  # h rows
        ),
        out_specs=P(axis, None),
        # pallas_call does not yet annotate varying-mesh-axes metadata.
        check_vma=not use_pallas,
    )
    def _fwd(send_idx, local_csr, interior_csr, frontier_csr, ib, fb, h_local):
        send_idx = send_idx[0]  # (P, K) — leading shard dim of size 1
        # 1. halo send buffer: rows other shards asked for.
        send = h_local[send_idx]  # (P, K, F)
        # 2. exchange over ICI. split/concat on the shard axis.
        recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
        if use_pallas:
            from stgraph_tpu.ops.spmm_pallas import segment_sum_blocked

            def reduce_blocked(blk_arrays, feats_src):
                blk = _shard_blocked(
                    blk_arrays,
                    ns,
                    dg.blocked_rows_padded,
                    blk_arrays["dst"].shape[-1],
                )
                ones = jnp.ones((blk.capacity,), jnp.float32)

                # Differentiable wrapper: pallas_call has no VJP of its own;
                # d(segment-sum)/d(gathered)[e] is just g[dst_e] (zero on
                # sentinels). The feats gather below transposes to a
                # scatter-add by JAX, and shard_map transposes the
                # all_to_all — so the whole distributed backward is
                # synthesized from this one rule.
                @jax.custom_vjp
                def seg(gathered):
                    return segment_sum_blocked(blk, ones, gathered, interpret)

                def seg_fwd(gathered):
                    return seg(gathered), ()

                def seg_bwd(_, g):
                    dgath = g[jnp.clip(blk.dst, 0, ns - 1)]
                    dgath = jnp.where((blk.dst < ns)[:, None], dgath, 0.0)
                    return (dgath,)

                seg.defvjp(seg_fwd, seg_bwd)
                # segment_sum_blocked already slices to (ns, F).
                return seg(feats_src[blk.cols])

            interior = reduce_blocked(ib, h_local)
            frontier = reduce_blocked(fb, recv.reshape(p * k, f))
            return interior + frontier
        if overlap:
            # 3a. interior reduction — independent of the collective, so it
            # executes between all_to_all-start and -done.
            interior = M.spmm(_unstack_csr(interior_csr), h_local, impl="jnp")
            # 3b. frontier reduction over the received halo buffer.
            frontier = M.spmm(
                _unstack_csr(frontier_csr), recv.reshape(p * k, f), impl="jnp"
            )
            return interior + frontier
        buf = jnp.concatenate([h_local, recv.reshape(p * k, f)], axis=0)
        return M.spmm(_unstack_csr(local_csr), buf, impl="jnp")

    ib = dg.interior_blocked if use_pallas else {}
    fb = dg.frontier_blocked if use_pallas else {}
    return _fwd(
        dg.send_idx, dg.local_csr, dg.interior_csr, dg.frontier_csr, ib, fb, h
    )
