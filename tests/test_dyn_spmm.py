"""Traced dynamic-store SpMM: row-id kernel vs jnp oracle, grads, in-scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stgraph_tpu.graph.pma_store import pma_from_edges
from stgraph_tpu.ops.dyn_spmm import (
    PMAGraphPair,
    apply_delta_pair,
    dyn_degree,
    pma_norm,
    pma_pair_from_edges,
    pma_spmm,
    _jnp_spmm,
    _store_flat,
    _flat_cap_pad,
)
from stgraph_tpu.ops.segment_pallas import (
    spmm_rowid_traced,
    traced_block_meta,
)


def _rand_graph(rng, n=300, e=2500, weighted=True):
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    # dedupe (PMA stores are keyed sets)
    keys = dst * n + src
    _, idx = np.unique(keys, return_index=True)
    src, dst = src[idx], dst[idx]
    w = rng.standard_normal(len(src)).astype(np.float32) if weighted else None
    return src, dst, w


def _oracle(src, dst, w, h, n):
    out = np.zeros((n, h.shape[1]), np.float32)
    ww = np.ones(len(src), np.float32) if w is None else w
    np.add.at(out, dst, ww[:, None] * h[src])
    return out


def test_traced_block_meta_covers_all_live():
    """Every live position must fall inside its block's chunk span."""
    rng = np.random.default_rng(0)
    src, dst, w = _rand_graph(rng, n=500, e=4000)
    store = pma_from_edges(src, dst, 500, num_chunks=64, chunk_size=128)
    rows_f, _, _ = _store_flat(store, _flat_cap_pad(store))
    astart, nchunks = jax.jit(
        lambda r: traced_block_meta(r, 500)
    )(rows_f)
    astart, nchunks = np.asarray(astart), np.asarray(nchunks)
    rows_np = np.asarray(rows_f)
    live = np.where(rows_np < 500)[0]
    blk = rows_np[live] // 128
    for p, b in zip(live, blk):
        lo = astart[b]
        hi = astart[b] + nchunks[b] * 1024
        assert lo <= p < hi, (p, b, lo, hi)


@pytest.mark.parametrize("weighted", [True, False])
def test_rowid_kernel_matches_oracle(weighted):
    rng = np.random.default_rng(1)
    n = 400
    src, dst, w = _rand_graph(rng, n=n, e=3000, weighted=weighted)
    store = pma_from_edges(
        src, dst, n, num_chunks=48, chunk_size=128, weights=w
    )
    cap_pad = _flat_cap_pad(store)
    rows_f, cols_f, w_f = _store_flat(store, cap_pad)
    h = rng.standard_normal((n, 48)).astype(np.float32)
    gathered = jnp.asarray(h)[jnp.minimum(cols_f, n - 1)]
    out, _ = spmm_rowid_traced(
        rows_f, w_f, gathered, n, heads=1, interpret=True
    )
    ref = _oracle(src, dst, w, h, n)
    np.testing.assert_allclose(
        np.asarray(out)[:n, :48], ref, rtol=2e-5, atol=2e-5
    )


def test_rowid_kernel_under_jit_traced():
    """The whole path (meta + kernel) works with fully traced inputs."""
    rng = np.random.default_rng(2)
    n = 256
    src, dst, w = _rand_graph(rng, n=n, e=2000)
    store = pma_from_edges(
        src, dst, n, num_chunks=32, chunk_size=128, weights=w
    )
    cap_pad = _flat_cap_pad(store)
    rows_f, cols_f, w_f = _store_flat(store, cap_pad)
    h = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))

    @jax.jit
    def f(rows, cols, wf, h):
        gathered = h[jnp.minimum(cols, n - 1)]
        out, _ = spmm_rowid_traced(
            rows, wf, gathered, n, heads=1, interpret=True
        )
        return out[:n, :32]

    out = f(rows_f, cols_f, w_f, h)
    ref = _oracle(src, dst, w, np.asarray(h), n)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("weighted", [True, False])
def test_pma_spmm_matches_jnp_and_grads(weighted):
    rng = np.random.default_rng(3)
    n = 300
    src, dst, w = _rand_graph(rng, n=n, e=2200, weighted=weighted)
    pair = pma_pair_from_edges(
        src, dst, n, num_chunks=40, chunk_size=128, weights=w
    )
    h = jnp.asarray(rng.standard_normal((n, 24)).astype(np.float32))

    out_k = pma_spmm(pair, h, interpret=True)
    ref = _oracle(src, dst, w, np.asarray(h), n)
    np.testing.assert_allclose(np.asarray(out_k), ref, rtol=2e-5, atol=2e-5)

    # Gradients: kernel path vs the jnp autodiff of the same formula.
    def loss_k(h):
        return jnp.sum(pma_spmm(pair, h, interpret=True) ** 2)

    cap_pad = _flat_cap_pad(pair.fwd)
    rows_f, cols_f, w_f = _store_flat(pair.fwd, cap_pad)
    if w_f is None:
        w_f = jnp.ones((cap_pad,), jnp.float32)

    def loss_j(h):
        return jnp.sum(_jnp_spmm(rows_f, cols_f, w_f, h, n) ** 2)

    g_k = jax.grad(loss_k)(h)
    g_j = jax.grad(loss_j)(h)
    np.testing.assert_allclose(
        np.asarray(g_k), np.asarray(g_j), rtol=2e-4, atol=2e-4
    )


def test_dyn_degree_and_norm():
    rng = np.random.default_rng(4)
    n = 200
    src, dst, w = _rand_graph(rng, n=n, e=1500)
    pair = pma_pair_from_edges(
        src, dst, n, num_chunks=24, chunk_size=128, weights=w
    )
    cap_pad = _flat_cap_pad(pair.fwd)
    rows_f, _, w_f = _store_flat(pair.fwd, cap_pad)
    deg = dyn_degree(rows_f, None, n, interpret=True)
    ref = np.bincount(dst, minlength=n).astype(np.float32)
    np.testing.assert_allclose(np.asarray(deg), ref, rtol=1e-6, atol=1e-6)
    wsum = dyn_degree(rows_f, w_f, n, interpret=True)
    refw = np.zeros(n, np.float32)
    np.add.at(refw, dst, w)
    np.testing.assert_allclose(np.asarray(wsum), refw, rtol=1e-5, atol=1e-5)
    norm = pma_norm(pair, interpret=True)
    refn = np.where(ref > 0, 1.0 / np.sqrt(np.maximum(ref, 1.0)), 1.0)
    np.testing.assert_allclose(
        np.asarray(norm)[:, 0], refn, rtol=1e-6, atol=1e-6
    )


def test_gcnconv_pma_pair_matches_static_csr():
    """GCNConv over a PMAGraphPair == GCNConv over the equivalent static
    graph (same params), including gradients."""
    import flax.linen as fnn

    from stgraph_tpu import StaticGraph
    from stgraph_tpu.nn import GCNConv

    rng = np.random.default_rng(7)
    n = 200
    src, dst, w = _rand_graph(rng, n=n, e=1600, weighted=True)
    pair = pma_pair_from_edges(
        src, dst, n, num_chunks=24, chunk_size=128, weights=w
    )
    g = StaticGraph(np.stack([src, dst], 1), w, n)
    x = jnp.asarray(rng.standard_normal((n, 12)).astype(np.float32))
    conv = GCNConv(12, 8)
    params = conv.init(jax.random.key(0), g, x, edge_weight=jnp.asarray(w))

    out_static = conv.apply(params, g, x, edge_weight=jnp.asarray(w))
    out_pair = conv.apply(params, pair, x)
    np.testing.assert_allclose(
        np.asarray(out_pair), np.asarray(out_static), rtol=2e-4, atol=2e-4
    )

    g_static = jax.grad(
        lambda xx: jnp.sum(
            conv.apply(params, g, xx, edge_weight=jnp.asarray(w)) ** 2
        )
    )(x)
    g_pair = jax.grad(
        lambda xx: jnp.sum(conv.apply(params, pair, xx) ** 2)
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_pair), np.asarray(g_static), rtol=2e-3, atol=2e-3
    )


def test_pair_delta_replay_in_scan_matches_snapshots():
    """apply_delta_pair inside lax.scan + pma_spmm == per-snapshot oracle."""
    rng = np.random.default_rng(5)
    n = 128
    edges = set()
    snapshots = []
    deltas = []
    cur = set()
    for t in range(4):
        adds = set()
        while len(adds) < 40:
            adds.add((int(rng.integers(0, n)), int(rng.integers(0, n))))
        adds -= cur
        dels = set(
            list(cur)[: min(len(cur), 15)]
        )
        cur = (cur | adds) - dels
        deltas.append((sorted(adds), sorted(dels)))
        snapshots.append(sorted(cur))

    pad_a = max(len(a) for a, _ in deltas)
    pad_d = max(max(len(d) for _, d in deltas), 1)

    def pad(lst, k):
        arr = np.full((k, 2), n, np.int32)
        for i, (s, d_) in enumerate(lst):
            arr[i] = (s, d_)
        return arr

    add_arr = np.stack([pad(a, pad_a) for a, _ in deltas])
    del_arr = np.stack([pad(d, pad_d) for _, d in deltas])
    pair0 = pma_pair_from_edges(
        np.zeros(0, np.int64), np.zeros(0, np.int64), n,
        num_chunks=16, chunk_size=128,
    )
    h = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))

    def body(pair, xs):
        add, dele = xs
        pair = apply_delta_pair(
            pair, add[:, 0], add[:, 1], dele[:, 0], dele[:, 1]
        )
        out = pma_spmm(pair, h, interpret=True)
        return pair, out

    _, outs = jax.lax.scan(
        body, pair0, (jnp.asarray(add_arr), jnp.asarray(del_arr))
    )
    for t, snap in enumerate(snapshots):
        if snap:
            s = np.array([e[0] for e in snap])
            d_ = np.array([e[1] for e in snap])
        else:
            s = d_ = np.zeros(0, np.int64)
        ref = _oracle(s, d_, None, np.asarray(h), n)
        np.testing.assert_allclose(
            np.asarray(outs[t]), ref, rtol=2e-5, atol=2e-5,
            err_msg=f"t={t}",
        )


def test_gcnconv_lazy_pair_matches_static_csr():
    """GCNConv over a LazyPair == GCNConv over the equivalent static graph
    (same params), including gradients — the lazy-scan DTDG driver path."""
    from stgraph_tpu import StaticGraph
    from stgraph_tpu.nn import GCNConv
    from stgraph_tpu.ops.dyn_spmm import lazy_pair_from_edges

    rng = np.random.default_rng(7)
    n = 200
    src, dst, w = _rand_graph(rng, n=n, e=1600, weighted=True)
    w = np.abs(w) + 0.1  # lazy stores require strictly positive weights
    pair = lazy_pair_from_edges(
        src, dst, n, capacity=2048, tail_capacity=128, weights=w
    )
    g = StaticGraph(np.stack([src, dst], 1), w, n)
    x = jnp.asarray(rng.standard_normal((n, 12)).astype(np.float32))
    conv = GCNConv(12, 8)
    params = conv.init(jax.random.key(0), g, x, edge_weight=jnp.asarray(w))

    out_static = conv.apply(params, g, x, edge_weight=jnp.asarray(w))
    out_pair = conv.apply(params, pair, x)
    np.testing.assert_allclose(
        np.asarray(out_pair), np.asarray(out_static), rtol=2e-4, atol=2e-4
    )

    g_static = jax.grad(
        lambda xx: jnp.sum(
            conv.apply(params, g, xx, edge_weight=jnp.asarray(w)) ** 2
        )
    )(x)
    g_pair = jax.grad(
        lambda xx: jnp.sum(conv.apply(params, pair, xx) ** 2)
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_pair), np.asarray(g_static), rtol=2e-3, atol=2e-3
    )
