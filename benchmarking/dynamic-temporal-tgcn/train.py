"""Dynamic-temporal TGCN benchmark: link prediction over evolving graphs.

Mirrors the reference ``benchmarking/dynamic-temporal-tgcn/seastar/train.py``:
England-COVID (or synthetic DTDG) link prediction with a dot-product
decoder (reference ``model.py:18-21``), graph-type switch
``--type {naive, delta}`` standing in for the reference's
``{naive, pcsr, gpma}``, and per-epoch graph-update time reporting
(reference ``train.py:240-251``).

TPU-native: all snapshots are uniformly padded, so the whole sequence runs
as one ``lax.scan`` over stacked CSRs — the per-timestep structure
"updates" are free pointer-equivalent array selects, and backward replay is
JAX's scan transpose.
"""

from __future__ import annotations

import os
import sys

try:  # installed package (pip install -e .) or raw-checkout fallback
    import stgraph_tpu  # noqa: F401
except ImportError:
    sys.path.insert(
        0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    )

import argparse
import time

import numpy as np


class _SyntheticDTDG:
    """Adapter over DTDG JSON: lags-windowed degree features.

    Understands both on-disk schemas:

      * snapshot lists (``dataset_builder.py``): ``edge_index[t]`` is the
        full edge list of timestamp t;
      * SNAP update streams (``preprocessing.py``, the reference's
        ``preprocess_temporal_data.py`` schema): ``edge_index[t]`` is
        ``{"add": [...], "delete": [...], "neg": [...]}`` — replayed here
        into per-timestamp snapshots (the reference replays the same deltas
        inside its DynamicGraph ABC).
    """

    def __init__(self, path: str, lags: int) -> None:
        import json

        with open(path) as fh:
            data = json.load(fh)
        t_count = int(data["time_periods"])
        em = data["edge_mapping"]
        first = em["edge_index"][str(0)]
        if isinstance(first, dict):  # add/delete update stream
            self._edges = []
            current: set = set()
            for t in range(t_count):
                upd = em["edge_index"][str(t)]
                current |= {tuple(e) for e in upd["add"]}
                current -= {tuple(e) for e in upd.get("delete", [])}
                self._edges.append(sorted(current))
        else:
            self._edges = [
                [tuple(e) for e in em["edge_index"][str(t)]]
                for t in range(t_count)
            ]
        ws = em.get("edge_weight", {})
        self._weights = [
            ws.get(str(t), [1.0] * len(self._edges[t])) for t in range(t_count)
        ]
        n = 1 + max(
            (max(max(e) for e in edges) for edges in self._edges if edges),
            default=0,
        )
        # Feature: lags window of per-node out-degree (a stand-in target the
        # reference also synthesizes for custom datasets).
        deg = np.zeros((t_count, n), np.float32)
        for t, edges in enumerate(self._edges):
            for s, d_ in edges:
                deg[t, s] += 1.0
        deg /= max(deg.max(), 1.0)
        self._feats = [
            deg[t : t + lags].T for t in range(t_count - lags)
        ]  # (N, lags) per step
        self._targets = [deg[t + lags] for t in range(t_count - lags)]
        self.gdata = {"num_nodes": n}

    def get_edges(self):
        return self._edges

    def get_edge_weights(self):
        return self._weights

    def get_all_features(self):
        return self._feats

    def get_all_targets(self):
        return self._targets


def main() -> None:
    ap = argparse.ArgumentParser("dynamic-temporal TGCN benchmark")
    ap.add_argument("--dataset", default="england_covid")
    ap.add_argument(
        "--type", default="naive",
        choices=["naive", "delta", "delta-scan", "pma-scan", "lazy-scan"],
    )
    ap.add_argument("--num_epochs", type=int, default=5)
    ap.add_argument("--num_hidden", type=int, default=32)
    ap.add_argument("--feat_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from stgraph_tpu.utils.cache import setup_compilation_cache
    from stgraph_tpu.utils.fetch import fetch_float

    setup_compilation_cache()
    import flax.linen as fnn
    import jax.numpy as jnp
    import optax

    from stgraph_tpu.dataset import EnglandCovidDataLoader
    from stgraph_tpu.graph import DeltaGraph, NaiveGraph
    from stgraph_tpu.nn import TGCN
    from stgraph_tpu.utils import DataTable

    lags = args.feat_size
    if args.dataset.endswith(".json"):
        # Synthetic DTDG from benchmarking/dataset/dataset_builder.py —
        # the reference's custom-dataset path (dynamic-bench.sh --slide-size
        # sweeps over such files).
        d = _SyntheticDTDG(args.dataset, lags)
    else:
        d = EnglandCovidDataLoader(lags=lags)
    edge_lists = d.get_edges()
    weight_lists = d.get_edge_weights()

    t0 = time.perf_counter()
    if args.type == "naive":
        G = NaiveGraph(edge_lists, weight_lists)
    else:
        G = DeltaGraph(edge_lists, weight_lists)
    scan_types = ("delta-scan", "pma-scan", "lazy-scan")
    build_time = time.perf_counter() - t0
    n = G.get_num_nodes()
    t_total = len(d.get_all_features())

    feats = jnp.asarray(np.stack(d.get_all_features()), jnp.float32)  # (T', N, lags)
    if args.type in scan_types:
        # In-step structure mutation: the scan carries the edge store and
        # replays each timestamp's delta INSIDE the compiled epoch — the
        # reference's per-step PCSR/GPMA updates (§3.5 of SURVEY.md), fused
        # into one XLA program. Memory: O(capacity + T x delta) instead of
        # the stacked snapshots' O(T x capacity).
        staged_add, staged_del = G.staged_deltas()
        staged_add = staged_add[lags : lags + t_total]
        staged_del = staged_del[lags : lags + t_total]
        staged_add_w = G.staged_add_weights()
        if staged_add_w is not None:
            staged_add_w = staged_add_w[lags : lags + t_total]
        init_store = G.snapshot_store(lags - 1)
        if args.type == "pma-scan":
            # PMA chunked layout: O(delta) in-place updates with slack
            # (graph/pma_store.py), maintained in BOTH edge orders so the
            # row-id Pallas kernels serve forward and backward aggregation
            # (ops/dyn_spmm.py). Host-build from the flat snapshot.
            from stgraph_tpu.ops.dyn_spmm import pma_pair_from_edges

            rows0 = np.asarray(init_store.rows)
            cols0 = np.asarray(init_store.cols)
            w0 = (
                None
                if init_store.weights is None
                else np.asarray(init_store.weights)
            )
            live = rows0 < G.get_num_nodes()
            S = 256
            C = max((G._capacity + S - 1) // S * 2, 2)
            init_pma = pma_pair_from_edges(
                cols0[live], rows0[live], G.get_num_nodes(),
                num_chunks=C, chunk_size=S,
                weights=None if w0 is None else w0[live],
            )
        elif args.type == "lazy-scan":
            # Lazy tombstone+tail-log layout: O(delta) per-step updates
            # with cond-amortized compaction (graph/lazy_store.py),
            # maintained in both edge orders for fwd/bwd kernel
            # aggregation — the flagship DTDG update path.
            from stgraph_tpu.ops.dyn_spmm import lazy_pair_from_edges

            rows0 = np.asarray(init_store.rows)
            cols0 = np.asarray(init_store.cols)
            w0 = (
                None
                if init_store.weights is None
                else np.asarray(init_store.weights)
            )
            live = rows0 < G.get_num_nodes()
            # The staged arrays are padded to the LARGEST batch across
            # ALL timestamps — which includes t=0's establish-the-graph
            # batch (the whole edge set). The scanned window starts at
            # `lags`, where real deltas are small; sizing the tail logs
            # from the padded width inflates tail_capacity to edge-set
            # scale and the scan's residuals with it (measured: a
            # 31.7 GB program at a 200k-edge graph). Trim the (front-
            # packed) batches to the window's real maximum instead.
            n_sent = G.get_num_nodes()
            # Count on device, read back ONE scalar (pulling the bool
            # plane host-side would ride the pathological d2h tunnel).
            w_real = int(
                jnp.maximum(
                    (staged_add[:, :, 0] < n_sent).sum(axis=1).max(),
                    (staged_del[:, :, 0] < n_sent).sum(axis=1).max(),
                )
            )
            w_real = min(max(w_real, 16), staged_add.shape[1])
            staged_add = staged_add[:, :w_real]
            staged_del = staged_del[:, :w_real]
            if staged_add_w is not None:
                staged_add_w = staged_add_w[:, :w_real]
            tcap = max(8 * w_real, 128)
            init_lazy = lazy_pair_from_edges(
                cols0[live], rows0[live], G.get_num_nodes(),
                capacity=G._capacity + tcap,
                tail_capacity=tcap,
                weights=None if w0 is None else w0[live],
            )
        stacked = None
        weights = None
    else:
        stacked = (
            G.stacked()
            if args.type == "delta"
            else NaiveGraph(edge_lists, weight_lists).stacked()
        )
        # Align snapshot t+lags with feature window t (reference uses graphs
        # starting at lag offset).
        stacked = jax.tree_util.tree_map(lambda x: x[lags : lags + t_total], stacked)
        # Both naive and delta paths carry per-snapshot CSR-order weights.
        weights = G.stacked_weights()
        if weights is not None:
            weights = weights[lags : lags + t_total]

    # Positive edges per snapshot for the link-prediction loss: reuse the
    # stacked CSR's own (padded) edges; negatives are uniform random.
    model = TGCN(lags, args.num_hidden)
    init_csr = (
        G.get_graph(lags)
        if args.type in scan_types
        else jax.tree_util.tree_map(lambda a: a[0], stacked)
    )
    params = jax.jit(lambda k, x: model.init(k, init_csr, x))(
        jax.random.key(0), feats[0]
    )
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def decode(h, srcs, dsts):
        return jnp.sum(h[srcs] * h[dsts], axis=-1)

    def step_loss(params, hidden, key, csr_t, x_t, w_t):
        hidden = model.apply(
            params, csr_t, x_t,
            edge_weight=None if w_t is None else w_t,
            hidden=hidden,
        )
        key, k1, k2 = jax.random.split(key, 3)
        pos = decode(hidden, csr_t.cols, csr_t.rows)
        neg_s = jax.random.randint(k1, csr_t.cols.shape, 0, n)
        neg_d = jax.random.randint(k2, csr_t.cols.shape, 0, n)
        neg = decode(hidden, neg_s, neg_d)
        mask = csr_t.edge_mask
        pos_loss = optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos))
        neg_loss = optax.sigmoid_binary_cross_entropy(neg, jnp.zeros_like(neg))
        loss = jnp.sum(jnp.where(mask, pos_loss + neg_loss, 0.0)) / jnp.maximum(
            mask.sum(), 1
        )
        return hidden, key, loss

    def flat_link_loss(hidden, key, rows_f, cols_f, mask):
        """Link-prediction BCE over a flat sentinel-padded edge view."""
        key, k1, k2 = jax.random.split(key, 3)
        pos = decode(
            hidden, jnp.minimum(cols_f, n - 1), jnp.minimum(rows_f, n - 1)
        )
        neg_s = jax.random.randint(k1, cols_f.shape, 0, n)
        neg_d = jax.random.randint(k2, cols_f.shape, 0, n)
        neg = decode(hidden, neg_s, neg_d)
        pos_l = optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos))
        neg_l = optax.sigmoid_binary_cross_entropy(neg, jnp.zeros_like(neg))
        loss = jnp.sum(jnp.where(mask, pos_l + neg_l, 0.0)) / jnp.maximum(
            mask.sum(), 1
        )
        return key, loss

    @jax.jit
    def epoch_step(params, opt_state, key):
        def loss_fn(params):
            if args.type == "lazy-scan":
                from stgraph_tpu.ops.dyn_spmm import apply_delta_lazy_pair

                def body(carry, xs):
                    hidden, key, pair = carry
                    add, dele, add_w, x_t = xs
                    pair = apply_delta_lazy_pair(
                        pair,
                        add[:, 0], add[:, 1],
                        dele[:, 0], dele[:, 1],
                        add_weights=add_w,
                    )
                    hidden = model.apply(params, pair, x_t, hidden=hidden)
                    # Positive edges: the fwd store's main slots (w > 0 ==
                    # live) plus the tail log — static shapes throughout.
                    # Unweighted caveat: a tail edge deleted via the ANTI
                    # log (lazy_store.py) stays in this view until the
                    # next compaction — the loss samples a slightly stale
                    # positive set, which is harmless for link-prediction
                    # training (weighted sets like England-COVID use the
                    # in-place kill path and have no staleness).
                    st = pair.fwd
                    rows_f = jnp.concatenate([st.rows, st.tail_rows])
                    cols_f = jnp.concatenate([st.cols, st.tail_cols])
                    mask = jnp.concatenate([st.w, st.tail_w]) > 0
                    key, loss = flat_link_loss(
                        hidden, key, rows_f, cols_f, mask
                    )
                    return (hidden, key, pair), loss

                init = (jnp.zeros((n, args.num_hidden)), key, init_lazy)
                xs = (staged_add, staged_del, staged_add_w, feats)
            elif args.type == "pma-scan":
                from stgraph_tpu.ops.dyn_spmm import apply_delta_pair

                def body(carry, xs):
                    hidden, key, pair = carry
                    add, dele, add_w, x_t = xs
                    pair = apply_delta_pair(
                        pair,
                        add[:, 0], add[:, 1],
                        dele[:, 0], dele[:, 1],
                        add_weights=add_w,
                    )
                    # The model consumes the pair directly: GCNConv routes
                    # to the row-id-masked kernels (ops/dyn_spmm.py) —
                    # weights ride the store. Link-prediction edges come
                    # from the fwd store's flat view (sentinels masked).
                    hidden = model.apply(params, pair, x_t, hidden=hidden)
                    rows_f, cols_f, _ = pair.fwd.flatten()
                    key, k1, k2 = jax.random.split(key, 3)
                    pos = decode(
                        hidden,
                        jnp.minimum(cols_f, n - 1),
                        jnp.minimum(rows_f, n - 1),
                    )
                    neg_s = jax.random.randint(k1, cols_f.shape, 0, n)
                    neg_d = jax.random.randint(k2, cols_f.shape, 0, n)
                    neg = decode(hidden, neg_s, neg_d)
                    mask = rows_f < n
                    pos_l = optax.sigmoid_binary_cross_entropy(
                        pos, jnp.ones_like(pos)
                    )
                    neg_l = optax.sigmoid_binary_cross_entropy(
                        neg, jnp.zeros_like(neg)
                    )
                    loss = jnp.sum(
                        jnp.where(mask, pos_l + neg_l, 0.0)
                    ) / jnp.maximum(mask.sum(), 1)
                    return (hidden, key, pair), loss

                init = (jnp.zeros((n, args.num_hidden)), key, init_pma)
                xs = (staged_add, staged_del, staged_add_w, feats)
            elif args.type == "delta-scan":
                from stgraph_tpu.graph.delta_graph import (
                    EdgeStore,
                    apply_delta,
                    edge_store_to_csr,
                )

                weighted = staged_add_w is not None

                def body(carry, xs):
                    hidden, key, rows, cols, ws, ne = carry
                    add, dele, add_w, x_t = xs
                    store = apply_delta(
                        EdgeStore(rows, cols, ne, n, ws),
                        add[:, 1], add[:, 0],  # row = dst
                        dele[:, 1], dele[:, 0],
                        add_weights=add_w,
                    )
                    csr_t = edge_store_to_csr(store)
                    w_t = (
                        store.weights.reshape(-1, 1) if weighted else None
                    )
                    hidden, key, loss = step_loss(
                        params, hidden, key, csr_t, x_t, w_t
                    )
                    return (
                        hidden, key, store.rows, store.cols,
                        store.weights, store.num_edges,
                    ), loss

                init_w = (
                    jnp.asarray(init_store.weights)
                    if weighted
                    else None
                )
                init = (
                    jnp.zeros((n, args.num_hidden)),
                    key,
                    jnp.asarray(init_store.rows),
                    jnp.asarray(init_store.cols),
                    init_w,
                    jnp.asarray(init_store.num_edges),
                )
                xs = (staged_add, staged_del, staged_add_w, feats)
            else:
                def body(carry, xs):
                    hidden, key = carry
                    csr_t, x_t, w_t = xs
                    hidden, key, loss = step_loss(
                        params, hidden, key, csr_t, x_t, w_t
                    )
                    return (hidden, key), loss

                init = (jnp.zeros((n, args.num_hidden)), key)
                xs = (stacked, feats, weights)
            _, losses = jax.lax.scan(body, init, xs)
            return losses.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    table = DataTable(
        f"DTDG link-pred ({args.type})", ["epoch", "bce", "time (s)"]
    )
    times = []
    key = jax.random.key(7)
    for epoch in range(args.num_epochs):
        key, sub = jax.random.split(key)
        t1 = time.perf_counter()
        params, opt_state, loss = epoch_step(params, opt_state, sub)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t1
        if epoch >= 1:
            times.append(dt)
        table.add_row([epoch, f"{fetch_float(loss):.5f}", f"{dt:.4f}"])
    table.display()
    avg = float(np.mean(times)) if times else 0.0
    print(
        f"graph build time: {build_time:.4f}s  "
        f"(fwd update counters: {G.get_fwd_graph_time():.4f}s, "
        f"bwd: {G.get_bwd_graph_time():.4f}s)"
    )
    print(f"avg epoch time (>=1): {avg:.5f}s")
    print(f"^^^0^^^{avg:.6f}")


if __name__ == "__main__":
    main()
