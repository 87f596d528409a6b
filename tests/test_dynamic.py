"""Dynamic graphs: delta preprocessing, NaiveGraph, DeltaGraph equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stgraph_tpu.graph import DeltaGraph, NaiveGraph
from stgraph_tpu.graph.dynamic_graph import preprocess_deltas
from stgraph_tpu.ops import message as M


def _random_snapshots(rng, n=20, t=5, base=40, churn=8):
    """Random evolving edge sets with adds and deletes per step."""
    current = set()
    while len(current) < base:
        current.add((int(rng.integers(0, n)), int(rng.integers(0, n))))
    snaps = [sorted(current)]
    for _ in range(t - 1):
        cur = set(current)
        for _ in range(churn):
            if cur and rng.random() < 0.5:
                cur.remove(sorted(cur)[int(rng.integers(0, len(cur)))])
            cur.add((int(rng.integers(0, n)), int(rng.integers(0, n))))
        snaps.append(sorted(cur))
        current = cur
    return snaps


def test_preprocess_deltas_roundtrip(rng):
    snaps = _random_snapshots(rng)
    deltas = preprocess_deltas(snaps)
    cur = set()
    for t, d in enumerate(deltas):
        cur |= {tuple(e) for e in d["add"]}
        cur -= {tuple(e) for e in d["delete"]}
        assert cur == {tuple(e) for e in np.asarray(snaps[t])}


def test_naive_graph_snapshots(rng):
    snaps = _random_snapshots(rng)
    g = NaiveGraph(snaps)
    assert g.num_timestamps == len(snaps)
    for t, edges in enumerate(snaps):
        csr = g.get_graph(t)
        assert int(csr.num_edges) == len(edges)
        pairs = set(
            zip(
                np.asarray(csr.cols)[: len(edges)].tolist(),
                np.asarray(csr.rows)[: len(edges)].tolist(),
            )
        )
        assert pairs == {tuple(e) for e in edges}


def test_delta_graph_matches_naive(rng):
    snaps = _random_snapshots(rng)
    ng = NaiveGraph(snaps)
    dg = DeltaGraph(snaps)
    for t in range(len(snaps)):
        nc, dc = ng.get_graph(t), dg.get_graph(t)
        e = int(nc.num_edges)
        assert int(dc.num_edges) == e
        np_pairs = set(
            zip(np.asarray(nc.rows)[:e].tolist(), np.asarray(nc.cols)[:e].tolist())
        )
        dg_rows = np.asarray(dc.rows)
        dg_cols = np.asarray(dc.cols)
        valid = dg_rows < dc.num_nodes
        dg_pairs = set(zip(dg_rows[valid].tolist(), dg_cols[valid].tolist()))
        assert np_pairs == dg_pairs


def test_delta_graph_spmm_matches_naive(rng):
    snaps = _random_snapshots(rng)
    ng = NaiveGraph(snaps)
    dg = DeltaGraph(snaps)
    n = ng.get_num_nodes()
    h = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    for t in range(len(snaps)):
        a = np.asarray(M.spmm(ng.get_graph(t), h, impl="jnp"))
        b = np.asarray(M.spmm(dg.get_graph(t), h, impl="jnp"))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_stacked_scan_over_snapshots(rng):
    """lax.scan over stacked snapshots == python loop over snapshots."""
    snaps = _random_snapshots(rng)
    ng = NaiveGraph(snaps)
    n = ng.get_num_nodes()
    h = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    stacked = ng.stacked()

    def body(carry, csr_t):
        out = M.spmm(csr_t, carry, impl="jnp")
        return carry, out

    _, outs = jax.lax.scan(body, h, stacked)
    for t in range(len(snaps)):
        ref = np.asarray(M.spmm(ng.get_graph(t), h, impl="jnp"))
        np.testing.assert_allclose(np.asarray(outs[t]), ref, rtol=1e-5, atol=1e-5)


def test_transpose_of_snapshot(rng):
    snaps = _random_snapshots(rng)
    dg = DeltaGraph(snaps)
    t = len(snaps) - 1
    fwd, bwd = dg.get_graph(t), dg.get_backward_graph(t)
    e = int(fwd.num_edges)
    f_pairs = set(
        zip(np.asarray(fwd.rows)[:e].tolist(), np.asarray(fwd.cols)[:e].tolist())
    )
    b_rows = np.asarray(bwd.rows)
    valid = b_rows < bwd.num_nodes
    b_pairs = set(
        zip(np.asarray(bwd.cols)[valid].tolist(), b_rows[valid].tolist())
    )
    assert f_pairs == b_pairs


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_apply_delta_randomized_vs_set_oracle(seed):
    """Random add/delete batches replay to exactly the per-step edge sets."""
    rng = np.random.default_rng(seed)
    n, t = 25, 8
    snaps = _random_snapshots(rng, n=n, t=t, base=30, churn=12)
    dg = DeltaGraph(snaps)
    for ti in range(t):
        csr = dg.get_graph(ti)
        rows = np.asarray(csr.rows)
        cols = np.asarray(csr.cols)
        mask = rows < n
        got = set(zip(cols[mask].tolist(), rows[mask].tolist()))  # (src, dst)
        expect = set(snaps[ti])
        assert got == expect, f"t={ti}: {got ^ expect}"
        assert int(np.asarray(csr.num_edges)) == len(expect)


def test_delta_replay_inside_scan_matches_snapshots(rng):
    """apply_delta carried through lax.scan reproduces every host snapshot —
    the in-step structure-mutation path (--type delta-scan)."""
    import jax
    import jax.numpy as jnp

    from stgraph_tpu.graph.delta_graph import (
        DeltaGraph,
        EdgeStore,
        apply_delta,
    )

    n, t_steps = 40, 6
    edge_lists = []
    edges = set()
    for _ in range(t_steps):
        for _ in range(15):
            edges.add((int(rng.integers(0, n)), int(rng.integers(0, n))))
        drop = [e for e in list(edges) if rng.random() < 0.2]
        for e in drop:
            edges.discard(e)
        edge_lists.append(sorted(edges))

    G = DeltaGraph(edge_lists)
    add, dele = G.staged_deltas()
    init = G.snapshot_store(-1)

    @jax.jit
    def replay(rows, cols, ne):
        def body(carry, xs):
            r, c, k = carry
            a, d = xs
            s = apply_delta(EdgeStore(r, c, k, n), a[:, 1], a[:, 0], d[:, 1], d[:, 0])
            return (s.rows, s.cols, s.num_edges), (s.rows, s.cols, s.num_edges)

        _, outs = jax.lax.scan(body, (rows, cols, ne), (add, dele))
        return outs

    rows_t, cols_t, ne_t = replay(
        jnp.asarray(init.rows), jnp.asarray(init.cols), jnp.asarray(init.num_edges)
    )
    for t in range(t_steps):
        snap = G.snapshot_store(t)
        np.testing.assert_array_equal(np.asarray(rows_t[t]), snap.rows)
        np.testing.assert_array_equal(np.asarray(cols_t[t]), snap.cols)
        assert int(ne_t[t]) == int(snap.num_edges) == len(edge_lists[t])


def _random_weighted_snapshots(rng, n=20, t=6, base=30, churn=8):
    """Random evolving weighted edge dicts: adds, deletes AND weight changes."""
    cur = {}
    while len(cur) < base:
        k = (int(rng.integers(0, n)), int(rng.integers(0, n)))
        cur[k] = float(np.float32(rng.random() + 0.1))
    snaps = [dict(cur)]
    for _ in range(t - 1):
        nxt = dict(cur)
        keys = list(nxt)
        for _ in range(churn):
            r = rng.random()
            if r < 0.3 and keys:
                nxt.pop(keys[int(rng.integers(0, len(keys)))], None)
                keys = list(nxt)
            elif r < 0.6 and keys:
                # weight change on a persisting edge
                k = keys[int(rng.integers(0, len(keys)))]
                if k in nxt:
                    nxt[k] = float(np.float32(rng.random() + 0.1))
            else:
                k = (int(rng.integers(0, n)), int(rng.integers(0, n)))
                nxt[k] = float(np.float32(rng.random() + 0.1))
        snaps.append(nxt)
        cur = nxt
    edge_lists = [sorted(s) for s in snaps]
    weight_lists = [[s[k] for k in sorted(s)] for s in snaps]
    return edge_lists, weight_lists, snaps


def test_weighted_delta_snapshots_match_oracle(rng):
    """DeltaGraph snapshot (edges, weights) == per-step dict oracle,
    including weight changes on persisting edges (VERDICT missing #1)."""
    edge_lists, weight_lists, snaps = _random_weighted_snapshots(rng)
    dg = DeltaGraph(edge_lists, weight_lists)
    for t, oracle in enumerate(snaps):
        s = dg.snapshot_store(t)
        e = int(s.num_edges)
        got = {
            (int(s.cols[i]), int(s.rows[i])): float(s.weights[i])
            for i in range(e)
        }
        assert got == oracle, f"t={t}"


def test_weighted_delta_spmm_matches_naive(rng):
    """Weighted SpMM over delta snapshots == naive snapshots (same weights)."""
    edge_lists, weight_lists, _ = _random_weighted_snapshots(rng)
    ng = NaiveGraph(edge_lists, weight_lists)
    dg = DeltaGraph(edge_lists, weight_lists)
    n = ng.get_num_nodes()
    h = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    for t in range(len(edge_lists)):
        nc = ng.get_graph(t)
        # NaiveGraph weights are USER order; kernels take CSR order.
        w_n = M.edge_data_to_csr_order(nc, jnp.asarray(ng.get_edge_weights(t)))
        a = np.asarray(M.spmm(nc, h, w_n, impl="jnp"))
        b = np.asarray(
            M.spmm(dg.get_graph(t), h, dg.get_edge_weights(t), impl="jnp")
        )
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_weighted_delta_replay_inside_scan(rng):
    """Device apply_delta with weights carried through lax.scan reproduces
    every host snapshot (rows, cols, weights, count)."""
    from stgraph_tpu.graph.delta_graph import EdgeStore, apply_delta

    edge_lists, weight_lists, _ = _random_weighted_snapshots(rng, t=5)
    G = DeltaGraph(edge_lists, weight_lists)
    n = G.get_num_nodes()
    add, dele = G.staged_deltas()
    add_w = G.staged_add_weights()
    init = G.snapshot_store(-1)

    @jax.jit
    def replay(rows, cols, ws, ne):
        def body(carry, xs):
            r, c, w, k = carry
            a, d, aw = xs
            s = apply_delta(
                EdgeStore(r, c, k, n, w),
                a[:, 1], a[:, 0], d[:, 1], d[:, 0],
                add_weights=aw,
            )
            return (s.rows, s.cols, s.weights, s.num_edges), (
                s.rows, s.cols, s.weights, s.num_edges,
            )

        _, outs = jax.lax.scan(body, (rows, cols, ws, ne), (add, dele, add_w))
        return outs

    rows_t, cols_t, w_t, ne_t = replay(
        jnp.asarray(init.rows),
        jnp.asarray(init.cols),
        jnp.asarray(init.weights),
        jnp.asarray(init.num_edges),
    )
    for t in range(len(edge_lists)):
        snap = G.snapshot_store(t)
        np.testing.assert_array_equal(np.asarray(rows_t[t]), snap.rows)
        np.testing.assert_array_equal(np.asarray(cols_t[t]), snap.cols)
        np.testing.assert_array_equal(np.asarray(w_t[t]), snap.weights)
        assert int(ne_t[t]) == int(snap.num_edges)
