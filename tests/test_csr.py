"""CSR construction, transpose, padding, and degree invariants."""

import numpy as np
import jax.numpy as jnp

from stgraph_tpu.graph.csr import CSR, build_csr, round_up
from stgraph_tpu.graph.static_graph import StaticGraph


def _random_graph(rng, n=50, e=180):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    return src, dst


def test_build_sorted_by_dst_then_src(rng):
    src, dst = _random_graph(rng)
    csr = build_csr(src, dst, 50)
    rows = np.asarray(csr.rows)[: csr.num_edges]
    cols = np.asarray(csr.cols)[: csr.num_edges]
    key = rows.astype(np.int64) * 1000 + cols
    assert (np.diff(key) >= 0).all()


def test_padding_sentinels(rng):
    src, dst = _random_graph(rng, e=30)
    csr = build_csr(src, dst, 50, capacity=64)
    assert csr.capacity == 64
    rows = np.asarray(csr.rows)
    assert (rows[30:] == 50).all()
    assert np.asarray(csr.edge_mask).sum() == 30


def test_indptr_consistent(rng):
    src, dst = _random_graph(rng)
    csr = build_csr(src, dst, 50)
    indptr = np.asarray(csr.indptr)
    counts = np.bincount(dst, minlength=50)
    assert (np.diff(indptr) == counts).all()
    assert indptr[-1] == len(src)


def test_eids_map_to_user_order(rng):
    src, dst = _random_graph(rng)
    csr = build_csr(src, dst, 50)
    eids = np.asarray(csr.eids)[: csr.num_edges]
    # edge i in CSR order is user edge eids[i]
    assert (src[eids] == np.asarray(csr.cols)[: csr.num_edges]).all()
    assert (dst[eids] == np.asarray(csr.rows)[: csr.num_edges]).all()


def test_transpose_roundtrip(rng):
    src, dst = _random_graph(rng)
    csr = build_csr(src, dst, 50, capacity=256)
    t = csr.transpose()
    # Transpose swaps roles: t's rows are srcs.
    pairs = set(zip(np.asarray(csr.rows)[:180].tolist(), np.asarray(csr.cols)[:180].tolist()))
    tpairs = set(zip(np.asarray(t.cols)[:180].tolist(), np.asarray(t.rows)[:180].tolist()))
    assert pairs == tpairs
    # eids still identify the same user edge.
    te = np.asarray(t.eids)[:180]
    assert (src[te] == np.asarray(t.rows)[:180]).all()
    tt = t.transpose()
    assert pairs == set(
        zip(np.asarray(tt.rows)[:180].tolist(), np.asarray(tt.cols)[:180].tolist())
    )


def test_degrees(rng):
    src, dst = _random_graph(rng)
    csr = build_csr(src, dst, 50)
    assert (np.asarray(csr.degrees()) == np.bincount(dst, minlength=50)).all()
    assert (np.asarray(csr.col_degrees()) == np.bincount(src, minlength=50)).all()


def test_static_graph_api(rng):
    src, dst = _random_graph(rng, e=60)
    edges = [(int(s), int(d)) for s, d in zip(src, dst)]
    g = StaticGraph(edges, list(np.ones(60, np.float32)), 50)
    assert g.get_num_nodes() == 50
    assert g.get_num_edges() == 60
    assert g.in_degrees().sum() == 60
    assert g.out_degrees().sum() == 60
    assert np.allclose(g.weighted_in_degrees(), g.in_degrees())
    g.set_ndata("x", np.ones((50, 3)))
    assert g.get_ndata("x").shape == (50, 3)
    assert g.get_ndata("missing") is None
    assert g.graph_type() == "csr"


def test_round_up():
    assert round_up(5, 8) == 8
    assert round_up(8, 8) == 8
    assert round_up(9, 8) == 16


def test_graph_constants_are_host_arrays(rng):
    """Remote-TPU rule: graph constants must be numpy (docs/PERF.md) —
    device-array constants cost a device->host pull at every jit lowering."""
    from stgraph_tpu import StaticGraph
    from stgraph_tpu.graph import DeltaGraph
    from stgraph_tpu.graph.blocked import build_blocked
    from stgraph_tpu.utils import symmetric_norm

    n, e = 40, 160
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)], 1)
    g = StaticGraph(edges, None, n)
    for arr in (g.fwd_csr.indptr, g.fwd_csr.rows, g.fwd_csr.cols,
                g.fwd_csr.eids, g.bwd_csr.rows):
        assert isinstance(arr, np.ndarray), type(arr)
    b = build_blocked(g.fwd_csr)
    for arr in (b.offsets, b.counts, b.dst, b.cols, b.perm, b.eids):
        assert isinstance(arr, np.ndarray), type(arr)
    assert isinstance(symmetric_norm(g), np.ndarray)
    dg = DeltaGraph([[(0, 1), (1, 2)], [(0, 1), (2, 3)]])
    csr0 = dg.get_graph(1)
    assert isinstance(csr0.rows, np.ndarray)
