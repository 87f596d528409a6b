"""Gather-locality reordering: permutation validity, graph isomorphism,
and measured working-set shrinkage on a community-structured graph."""

import numpy as np
import pytest

from stgraph_tpu.graph import build_csr
from stgraph_tpu.graph.reorder import (
    _lp_order_numpy,
    gather_working_set,
    inverse_permutation,
    locality_order,
    relabel_edges,
)


def _community_graph(rng, n=4096, e=40_000, k=32, p_intra=0.85):
    """Shuffled-id SBM: communities exist but ids don't encode them."""
    comm = rng.integers(0, k, n)
    by_comm = [np.where(comm == c)[0] for c in range(k)]
    n_intra = int(e * p_intra)
    cs = rng.integers(0, k, n_intra)
    src_i = np.concatenate(
        [rng.choice(by_comm[c], size=np.sum(cs == c)) for c in range(k)]
    )
    dst_i = np.concatenate(
        [rng.choice(by_comm[c], size=np.sum(cs == c)) for c in range(k)]
    )
    n_inter = e - len(src_i)
    src = np.concatenate([src_i, rng.integers(0, n, n_inter)])
    dst = np.concatenate([dst_i, rng.integers(0, n, n_inter)])
    return src.astype(np.int64), dst.astype(np.int64)


@pytest.fixture
def comm_edges():
    rng = np.random.default_rng(0)
    return _community_graph(rng)


def test_order_is_permutation(comm_edges):
    src, dst = comm_edges
    n = 4096
    order = locality_order(src, dst, n)
    assert order.shape == (n,)
    assert np.array_equal(np.sort(order), np.arange(n))
    inv = inverse_permutation(order)
    assert np.array_equal(inv[order], np.arange(n))


def test_numpy_fallback_is_permutation(comm_edges):
    src, dst = comm_edges
    n = 4096
    order = _lp_order_numpy(
        np.asarray(src, np.int32), np.asarray(dst, np.int32), n
    )
    assert np.array_equal(np.sort(order), np.arange(n))


def test_relabeled_graph_is_isomorphic(comm_edges):
    """SpMM on the relabeled graph == permuted SpMM on the original."""
    import jax.numpy as jnp

    from stgraph_tpu.ops import message as M

    src, dst = comm_edges
    n = 4096
    order = locality_order(src, dst, n)
    new_id = inverse_permutation(order)
    src2, dst2 = relabel_edges(src, dst, order)

    h = np.random.default_rng(1).standard_normal((n, 16)).astype(np.float32)
    csr = build_csr(src, dst, n)
    csr2 = build_csr(src2, dst2, n)
    out = np.asarray(M.spmm(csr, jnp.asarray(h), impl="jnp"))
    out2 = np.asarray(M.spmm(csr2, jnp.asarray(h[order]), impl="jnp"))
    # out2[new_id[v]] must equal out[v]
    np.testing.assert_allclose(out2[new_id], out, rtol=1e-5, atol=1e-5)


def test_working_set_shrinks(comm_edges):
    """On a community graph, LP relabeling shrinks the per-region distinct
    source working set by at least 2x (the locality the pass exists for)."""
    src, dst = comm_edges
    n = 4096
    before = gather_working_set(dst, src, n, region_edges=2048)
    order = locality_order(src, dst, n)
    src2, dst2 = relabel_edges(src, dst, order)
    after = gather_working_set(dst2, src2, n, region_edges=2048)
    assert after < before / 2, (before, after)


def test_native_and_numpy_agree(comm_edges):
    """Native C++ and numpy label propagation implement the same
    deterministic algorithm: identical orders, bit for bit."""
    src, dst = comm_edges
    n = 4096
    from stgraph_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native builder unavailable")
    got = native.reorder_locality(
        np.asarray(src, np.int32), np.asarray(dst, np.int32), n
    )
    ref = _lp_order_numpy(
        np.asarray(src, np.int32), np.asarray(dst, np.int32), n
    )
    assert np.array_equal(got, ref)


def test_numpy_fallback_working_set_shrinks(comm_edges):
    src, dst = comm_edges
    n = 4096
    before = gather_working_set(dst, src, n, region_edges=2048)
    order = _lp_order_numpy(
        np.asarray(src, np.int32), np.asarray(dst, np.int32), n
    )
    src2, dst2 = relabel_edges(src, dst, order)
    after = gather_working_set(dst2, src2, n, region_edges=2048)
    assert after < before / 2, (before, after)


def test_ogb_loader_reorder_consistency():
    """reorder=True permutes edges/features/labels consistently."""
    from stgraph_tpu.dataset import OgbNodeDataLoader

    base = OgbNodeDataLoader("ogbn-arxiv", scale=0.002, seed=3)
    re = OgbNodeDataLoader("ogbn-arxiv", scale=0.002, seed=3, reorder=True)
    assert re.node_order is not None
    order = re.node_order
    n = base.gdata["num_nodes"]
    assert np.array_equal(np.sort(order), np.arange(n))
    # features/labels permuted by order
    np.testing.assert_array_equal(
        re.get_all_features(), base.get_all_features()[order]
    )
    np.testing.assert_array_equal(
        re.get_all_targets(), base.get_all_targets()[order]
    )
    # edges relabeled: new edge endpoints map back to the originals
    ei_b = base.get_edge_index()
    ei_r = re.get_edge_index()
    np.testing.assert_array_equal(order[ei_r], ei_b)


def test_synthetic_has_community_structure():
    """The synthetic ogbn fallback must be reorderable: locality recovered
    by the LP pass should be large (this is what the bench measures)."""
    from stgraph_tpu.dataset import OgbNodeDataLoader

    d = OgbNodeDataLoader("ogbn-products", scale=0.01, seed=0)
    ei = d.get_edge_index()
    n = d.gdata["num_nodes"]
    before = gather_working_set(ei[1], ei[0], n, region_edges=4096)
    order = locality_order(ei[0], ei[1], n)
    s2, d2 = relabel_edges(ei[0], ei[1], order)
    after = gather_working_set(d2, s2, n, region_edges=4096)
    assert after < before / 1.5, (before, after)
