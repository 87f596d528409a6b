"""Distributed SpMM / GAT attention: shard_map halo exchange + local ops.

The device-side half of the distribution layer (host half:
``parallel/partition.py``). Per BASELINE.json: "edge-partitioning the
graph, exchanging boundary vertex features all-to-all over ICI and
overlapping the exchange with local neighborhood aggregation".

Inside ``shard_map`` each shard:

  1. gathers its outgoing halo rows into per-ring-step send buffers
     (``send_idx_by_d``) and exchanges them with P-1 ``ppermute`` steps —
     each step is padded only to that displacement's max K_d, so comm
     volume is Σ_d K_d rows instead of a global-max all_to_all's
     (P-1)·K_max (on power-law graphs the difference is large); on
     hardware every step rides ICI and XLA's async collectives let the
     **interior** aggregation (edges whose sources are local) overlap the
     exchange: interior edges never touch the halo buffer, so their
     segment-sum has no data dependency on the collectives;
  2. aggregates over the widened [local | halo] feature buffer.

Weighted aggregation routes per-edge data (GCN edge weights, GAT attention
coefficients) into shard-local CSR order through the partitioner's global
edge-id maps (``*_gids``). GAT runs entirely shard-local after ONE fused
halo exchange carrying ``[feat_src | el]``: destination-range partitioning
means every node's full in-neighborhood lives on one shard, so the segment
softmax never crosses the mesh.

Autodiff: shard_map is differentiable — ``ppermute`` transposes to the
reverse permutation, the halo gather transposes to a scatter-add — so the
gradient halo reduction the reference would have needed to hand-write is
synthesized by JAX (SURVEY §5.8).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from stgraph_tpu.parallel.mesh import manual_shard_map

from stgraph_tpu.graph.csr import CSR
from stgraph_tpu.ops import message as M
from stgraph_tpu.ops import segment as seg
from stgraph_tpu.parallel.partition import DistGraph

__all__ = [
    "dist_spmm",
    "dist_gat_attention",
    "shard_node_array",
    "shard_edge_array",
    "replicate",
]


def shard_node_array(mesh: Mesh, x: jnp.ndarray, dg: DistGraph) -> jnp.ndarray:
    """Pad a (N, ...) global node array to P·Ns rows and shard over 'graph'."""
    pad = dg.padded_nodes - x.shape[0]
    if pad:
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    spec = P("graph", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_edge_array(
    mesh: Mesh, w: jnp.ndarray, dg: DistGraph, which: str = "local"
) -> jnp.ndarray:
    """Route global USER-order edge data into stacked shard-local order.

    Returns a (P, cap, ...) array sharded over 'graph': slice p holds shard
    p's per-edge values in its local CSR slot order (zero on padding).
    ``which`` ∈ {'local', 'interior', 'frontier'}.
    """
    gids = {
        "local": dg.local_gids,
        "interior": dg.interior_gids,
        "frontier": dg.frontier_gids,
    }[which]
    w = jnp.asarray(w)
    flat = w.reshape(w.shape[0], -1)
    valid = gids < dg.num_global_edges
    out = flat[np.minimum(gids, dg.num_global_edges - 1)]
    out = jnp.where(valid[..., None], out, 0.0)
    out = out.reshape(gids.shape + w.shape[1:])
    spec = P("graph", *([None] * (out.ndim - 1)))
    return jax.device_put(out, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def _halo_exchange(dg: DistGraph, axis: str, send_idx_by_d, x_local):
    """P-1 ppermute ring steps -> (halo_total, F) received buffer.

    ``send_idx_by_d`` are the shard_map-sliced (1, K_d) index arrays.
    Receiving shard p's step-d rows come from shard (p-d)%P and land at
    ``halo_offsets[d]`` — exactly where the partitioner pointed frontier
    cols.
    """
    p = dg.num_shards
    recvs = []
    for d in range(1, p):
        idx = send_idx_by_d[d - 1][0]  # (K_d,)
        send = x_local[idx]  # (K_d, F)
        recvs.append(
            jax.lax.ppermute(
                send, axis, perm=[(q, (q + d) % p) for q in range(p)]
            )
        )
    if not recvs:
        return jnp.zeros((dg.halo_total,) + x_local.shape[1:], x_local.dtype)
    buf = jnp.concatenate(recvs, axis=0)
    pad = dg.halo_total - buf.shape[0]
    if pad:
        buf = jnp.pad(buf, [(0, pad)] + [(0, 0)] * (buf.ndim - 1))
    return buf


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
    edge_weight: Optional[jnp.ndarray] = None,
    axis: str = "graph",
    overlap: bool = True,
    impl: str = "jnp",
    interpret: bool = False,
) -> jnp.ndarray:
    """out[d] = sum over in-edges of w_e · h[src], edge-partitioned.

    ``h`` is the (P·Ns, F) node-sharded feature array; returns the same
    sharding. ``edge_weight`` (optional) is per-edge data already routed to
    stacked shard order — (P, cap[, H]) from ``shard_edge_array(...,
    'local')``; the interior/frontier split is derived in-program via the
    shared eids. For multihead weights (trailing H) ``h`` must be
    (P·Ns, H, F) and the output matches.

    ``overlap=True`` aggregates interior edges (local sources) as a
    separate reduction with no data dependency on the halo ppermutes, so
    XLA's async collectives hide the exchange behind it; the frontier edges
    then reduce over the received halo buffer alone. ``False`` keeps the
    single-reduction formulation over the widened ``[local | halo]`` buffer
    (used by the equivalence tests, and by the weighted path).

    ``impl='pallas'`` runs each shard's interior/frontier reduction on the
    blocked-CSR MXU kernel (layouts precomputed by the partitioner);
    requires ``overlap=True`` and no edge weights (weighted Pallas
    per-shard reduction: ROADMAP). ``'jnp'`` uses the XLA segment
    reduction.
    """
    ns, p = dg.nodes_per_shard, dg.num_shards
    weighted = edge_weight is not None
    multihead = weighted and h.ndim == 3
    f = h.shape[-1]
    heads = h.shape[1] if multihead else 1
    if impl == "pallas":
        if not overlap:
            raise ValueError("impl='pallas' requires overlap=True")
        if dg.interior_rowmask is None:
            raise ValueError(
                "impl='pallas' requires rowmask layouts; rebuild the "
                "DistGraph with partition_edges()"
            )
        if multihead and (128 % f != 0 or (heads * f) % 128 != 0):
            raise ValueError(
                "multihead pallas dist_spmm needs 128 % F == 0 and "
                "heads*F % 128 == 0"
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

    if weighted:
        ew = jnp.asarray(edge_weight)
        if ew.ndim == 2:
            ew = ew[..., None] if not multihead else ew
    else:
        ew = jnp.zeros((p, 1), jnp.float32)  # placeholder pytree leaf

    @partial(
        manual_shard_map,
        mesh=mesh,
        in_specs=(
            tuple(P(axis) for _ in dg.send_idx_by_d),
            P(axis),  # local_csr pytree (prefix spec: dim0 of every leaf)
            P(axis),  # interior_csr
            P(axis),  # frontier_csr
            P(axis),  # interior_rowmask dict ({} when unused)
            P(axis),  # frontier_rowmask dict
            P(axis),  # interior_pos (or placeholder)
            P(axis),  # frontier_pos
            P(axis),  # edge weights (stacked shard-local) or placeholder
            P(axis, *([None] * (h.ndim - 1))),  # h rows
        ),
        out_specs=P(axis, *([None] * (h.ndim - 1))),
        axes=(axis,),
        # pallas_call does not yet annotate varying-mesh-axes metadata.
        check_vma=not use_pallas,
    )
    def _fwd(send_idx_by_d, local_csr, interior_csr, frontier_csr,
             irm, frm, int_pos, fro_pos, w_local, h_local):
        if multihead:
            h2 = h_local.reshape(h_local.shape[0], heads * f)
        else:
            h2 = h_local
        recv = _halo_exchange(dg, axis, send_idx_by_d, h2)
        if use_pallas:
            from stgraph_tpu.ops.segment_pallas import spmm_rowmask_traced

            f_flat = heads * f if multihead else h2.shape[-1]

            def reduce_rowmask(rm, csr_stacked, pos, cap_pad, feats_src):
                """Per-shard reduction on the position-masked rowmask
                kernel (CSR-direct reads, no blocked permutation).

                Differentiable wrapper: pallas_call has no VJP; for a
                weighted segment-sum the cotangents are
                ``d gathered[e] = w[e] * g[dst_e]`` and
                ``dw[e, k] = <gathered[e]|_k, g[dst_e]|_k>`` — gathers
                only. The feats gather below transposes to a scatter-add
                by JAX, and shard_map transposes the ppermutes, so the
                whole distributed backward is synthesized from this rule.
                """
                c = jax.tree_util.tree_map(lambda x: x[0], csr_stacked)
                cap = c.cols.shape[0]
                cols = jnp.pad(c.cols, (0, cap_pad - cap))
                rows = jnp.pad(
                    c.rows, (0, cap_pad - cap), constant_values=ns
                )
                rows_c = jnp.clip(rows, 0, ns - 1)
                emask = rows < ns
                if weighted:
                    wl = w_local[0].reshape(w_local[0].shape[0], -1)
                    pos_c = jnp.minimum(pos[0], wl.shape[0] - 1)
                    w_s = jnp.where(
                        (pos[0] < wl.shape[0])[:, None], wl[pos_c], 0.0
                    )  # (cap, heads) weights in THIS split's slot order
                    w_pad = jnp.pad(w_s, ((0, cap_pad - cap), (0, 0)))

                @jax.custom_vjp
                def sg(gathered, w_arg):
                    out, _ = spmm_rowmask_traced(
                        rm["astart"][0],
                        rm["nchunks"][0],
                        rm["bs"][0],
                        rm["be"][0],
                        w_arg if weighted else None,
                        gathered,
                        heads=heads if multihead else 1,
                        interpret=interpret,
                    )
                    return out[:ns, :f_flat]

                def sg_fwd(gathered, w_arg):
                    return sg(gathered, w_arg), (gathered, w_arg)

                def sg_bwd(res, g):
                    gathered, w_arg = res
                    gd = g[rows_c]  # (cap_pad?, ...) rows_c is (cap_pad,)
                    gd = jnp.where(emask[:, None], gd[: cap_pad], 0.0)
                    gd = jnp.pad(gd, ((0, cap_pad - gd.shape[0]), (0, 0)))
                    if weighted:
                        wk = jnp.repeat(
                            w_arg, f_flat // w_arg.shape[1], axis=1
                        )
                        dgath = gd * wk
                        dw = jnp.sum(
                            (gathered * gd).reshape(
                                cap_pad, w_arg.shape[1], -1
                            ),
                            axis=-1,
                        )
                    else:
                        dgath = gd
                        dw = jnp.zeros_like(w_arg)
                    return dgath.astype(gathered.dtype), dw

                sg.defvjp(sg_fwd, sg_bwd)
                src_c = jnp.minimum(cols, feats_src.shape[0] - 1)
                gathered = feats_src[src_c]
                w_in = (
                    w_pad if weighted else jnp.zeros((cap_pad, 1), jnp.float32)
                )
                return sg(gathered, w_in)

            interior = reduce_rowmask(
                irm, interior_csr, int_pos, dg.interior_cap_pad, h2
            )
            frontier = reduce_rowmask(
                frm, frontier_csr, fro_pos, dg.frontier_cap_pad, recv
            )
            out = interior + frontier
            if multihead:
                out = out.reshape(ns, heads, f)
            return out
        if weighted:
            # Single widened reduction with per-edge weights in local CSR
            # order; the ppermutes still overlap nothing here — acceptable:
            # the weighted path exists for correctness-parity (GCN edge
            # weights) and GAT, whose coefficients live per shard anyway.
            buf = jnp.concatenate([h2, recv], axis=0)
            csr = _unstack_csr(local_csr)
            w = w_local[0]
            msg = buf[csr.cols]
            if multihead:
                msg = msg.reshape(msg.shape[0], heads, f) * w[..., None]
                msg = msg.reshape(msg.shape[0], heads * f)
            else:
                msg = msg * w.reshape(-1, 1)
            out = seg.segment_sum(msg, csr.rows, ns, edge_mask=csr.edge_mask)
            if multihead:
                out = out.reshape(ns, heads, f)
            return out
        if overlap:
            # interior reduction — independent of the collectives, so it
            # executes between ppermute-start and -done.
            interior = M.spmm(_unstack_csr(interior_csr), h2, impl="jnp")
            frontier = M.spmm(_unstack_csr(frontier_csr), recv, impl="jnp")
            return interior + frontier
        buf = jnp.concatenate([h2, recv], axis=0)
        return M.spmm(_unstack_csr(local_csr), buf, impl="jnp")

    irm = dg.interior_rowmask if use_pallas else {}
    frm = dg.frontier_rowmask if use_pallas else {}
    zero = np.zeros((p, 1), np.int32)
    int_pos = dg.interior_pos if (use_pallas and weighted) else zero
    fro_pos = dg.frontier_pos if (use_pallas and weighted) else zero
    return _fwd(
        dg.send_idx_by_d, dg.local_csr, dg.interior_csr, dg.frontier_csr,
        irm, frm, int_pos, fro_pos, ew, h,
    )


def dist_gat_attention(
    mesh: Mesh,
    dg: DistGraph,
    el: jnp.ndarray,  # (P·Ns, H) source-side scores, node-sharded
    er: jnp.ndarray,  # (P·Ns, H) destination-side scores, node-sharded
    feat_src: jnp.ndarray,  # (P·Ns, H, F) node-sharded
    negative_slope: float = 0.2,
    axis: str = "graph",
    impl: str = "jnp",
    interpret: bool = False,
) -> jnp.ndarray:
    """Edge-partitioned GAT attention: one fused halo exchange, then a
    fully shard-local segment softmax + weighted aggregation.

    Because shards own DESTINATION ranges, every node's complete
    in-neighborhood lives on one shard: the stability max, the softmax
    normalizer, and the weighted sum are all local — the only
    communication is the ``[feat_src | el]`` halo (el rides the feature
    exchange as H extra columns, amortized into the same ppermute steps).
    The backward (through JAX autodiff of this shard_map) reverses the
    ppermutes for the gradient halo reduction. Net-new vs the reference
    (single-GPU only); north star: BASELINE "scaling efficiency >= 0.9".
    """
    ns, p = dg.nodes_per_shard, dg.num_shards
    h = el.shape[-1]
    f = feat_src.shape[-1]
    slope = negative_slope
    use_pallas = impl == "pallas"
    if use_pallas:
        if dg.local_rowmask is None:
            raise ValueError(
                "impl='pallas' requires rowmask layouts; rebuild the "
                "DistGraph with partition_edges()"
            )
        if h > 1 and (128 % f != 0 or (h * f) % 128 != 0):
            raise ValueError(
                "pallas dist GAT needs 128 % F == 0 and H*F % 128 == 0"
            )

    @partial(
        manual_shard_map,
        mesh=mesh,
        in_specs=(
            tuple(P(axis) for _ in dg.send_idx_by_d),
            P(axis),  # local_csr
            P(axis),  # local_rowmask dict ({} when unused)
            P(axis, None),  # el
            P(axis, None),  # er
            P(axis, None, None),  # feat_src
        ),
        out_specs=P(axis, None, None),
        axes=(axis,),
        check_vma=not use_pallas,
    )
    def _fwd(send_idx_by_d, local_csr, lrm, el_l, er_l, fs_l):
        c = jax.tree_util.tree_map(lambda x: x[0], local_csr)
        csr = CSR(
            indptr=c.indptr, rows=c.rows, cols=c.cols, eids=c.eids,
            num_nodes=ns, num_edges=c.num_edges,
        )
        fs2 = fs_l.reshape(ns, h * f)
        # ONE fused exchange: [features | el] per halo row.
        packed = jnp.concatenate([fs2, el_l], axis=1)
        recv = _halo_exchange(dg, axis, send_idx_by_d, packed)
        fs_wide = jnp.concatenate([fs2, recv[:, : h * f]], axis=0)
        el_wide = jnp.concatenate([el_l, recv[:, h * f :]], axis=0)

        rows_c = jnp.minimum(csr.rows, ns - 1)
        emask = (csr.rows < ns).astype(jnp.float32)
        s = el_wide[csr.cols] + er_l[rows_c]  # (cap, H); cols clamp via jnp
        s = jnp.where(s >= 0, s, slope * s)
        m = seg.segment_max(s, csr.rows, ns, edge_mask=csr.rows < ns)
        w = jnp.exp(s - m[rows_c]) * emask[:, None]
        denom = jnp.maximum(
            seg.segment_sum(w, csr.rows, ns, edge_mask=csr.rows < ns),
            jnp.finfo(jnp.float32).tiny,
        )
        if use_pallas:
            # The wide (E, H·F) aggregation — the expensive reduction —
            # runs on the per-shard rowmask kernel; the narrow score /
            # max / normalizer glue above stays jnp (differentiable, and
            # a small fraction of the per-shard bytes).
            from stgraph_tpu.ops.segment_pallas import spmm_rowmask_traced

            cap = csr.cols.shape[0]
            cap_pad = dg.local_cap_pad
            w_pad = jnp.pad(w, ((0, cap_pad - cap), (0, 0)))
            gathered = fs_wide[csr.cols].reshape(cap, h * f)
            gathered = jnp.pad(gathered, ((0, cap_pad - cap), (0, 0)))

            @jax.custom_vjp
            def sg(gath, w_arg):
                out, _ = spmm_rowmask_traced(
                    lrm["astart"][0], lrm["nchunks"][0],
                    lrm["bs"][0], lrm["be"][0],
                    w_arg, gath, heads=h, interpret=interpret,
                )
                return out[:ns, : h * f]

            def sg_fwd(gath, w_arg):
                return sg(gath, w_arg), (gath, w_arg)

            def sg_bwd(res, g):
                gath, w_arg = res
                rows_pad = jnp.pad(csr.rows, (0, cap_pad - cap),
                                   constant_values=ns)
                gd = g[jnp.clip(rows_pad, 0, ns - 1)]
                gd = jnp.where((rows_pad < ns)[:, None], gd, 0.0)
                wk = jnp.repeat(w_arg, f, axis=1)
                dgath = gd * wk
                dw = jnp.sum(
                    (gath * gd).reshape(cap_pad, h, f), axis=-1
                )
                return dgath.astype(gath.dtype), dw

            sg.defvjp(sg_fwd, sg_bwd)
            u = sg(gathered, w_pad).reshape(ns, h, f)
            return u / denom[:, :, None]
        msg = fs_wide[csr.cols].reshape(-1, h, f) * w[..., None]
        u = seg.segment_sum(
            msg.reshape(-1, h * f), csr.rows, ns, edge_mask=csr.rows < ns
        ).reshape(ns, h, f)
        return u / denom[:, :, None]

    lrm = dg.local_rowmask if use_pallas else {}
    return _fwd(dg.send_idx_by_d, dg.local_csr, lrm, el, er, feat_src)
