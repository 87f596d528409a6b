"""Narrow-K position-masked segment kernels (interpret mode) vs jnp oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stgraph_tpu.graph.blocked import EDGE_CHUNK, ROW_BLOCK
from stgraph_tpu.graph.csr import build_csr
from stgraph_tpu.ops import segment as seg
from stgraph_tpu.ops import segment_pallas as NSP


@pytest.fixture
def graph(rng):
    n, e = 300, 5000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    # leave some rows empty deliberately
    dst[dst > n - 20] = 0
    return build_csr(src, dst, n)


def test_row_block_meta_invariants(graph):
    meta = NSP.row_block_meta(graph)
    indptr = np.asarray(graph.indptr).astype(np.int64)
    n = graph.num_nodes
    assert (meta.astart % 128 == 0).all()
    assert meta.num_rows_padded % ROW_BLOCK == 0
    for b in range(meta.num_blocks):
        lo, hi = b * ROW_BLOCK, min((b + 1) * ROW_BLOCK, n)
        if lo >= n:
            assert (meta.be[b, 0] == meta.bs[b, 0]).all()
            continue
        for r in range(lo, hi):
            assert meta.bs[b, 0, r - lo] == indptr[r] - meta.astart[b]
            assert meta.be[b, 0, r - lo] == indptr[r + 1] - meta.astart[b]
        # every row's range fits inside the streamed chunks
        assert meta.be[b, 0].max(initial=0) <= meta.nchunks[b] * EDGE_CHUNK
    assert meta.cap_pad >= graph.capacity


@pytest.mark.parametrize("k", [1, 3, 8])
def test_narrow_sum_matches_oracle(graph, rng, k):
    vals = rng.standard_normal((graph.capacity, k)).astype(np.float32)
    out = NSP.segment_sum_narrow(graph, jnp.asarray(vals), interpret=True)
    ref = seg.segment_sum(
        jnp.asarray(vals), graph.rows, graph.num_nodes, edge_mask=graph.edge_mask
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_narrow_sum_trailing_shape(graph, rng):
    vals = rng.standard_normal((graph.capacity, 4, 2)).astype(np.float32)
    out = NSP.segment_sum_narrow(graph, jnp.asarray(vals), interpret=True)
    assert out.shape == (graph.num_nodes, 4, 2)
    ref = seg.segment_sum(
        jnp.asarray(vals), graph.rows, graph.num_nodes, edge_mask=graph.edge_mask
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [1, 8])
def test_narrow_max_matches_oracle(graph, rng, k):
    vals = rng.standard_normal((graph.capacity, k)).astype(np.float32)
    out = NSP.segment_max_narrow(graph, jnp.asarray(vals), interpret=True)
    ref = seg.segment_max(
        jnp.asarray(vals), graph.rows, graph.num_nodes, edge_mask=graph.edge_mask
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_narrow_sum_grad(graph, rng):
    vals = rng.standard_normal((graph.capacity, 8)).astype(np.float32)
    g = rng.standard_normal((graph.num_nodes, 8)).astype(np.float32)

    def loss(v):
        return jnp.sum(NSP.segment_sum_narrow(graph, v, interpret=True) * g)

    def loss_ref(v):
        return jnp.sum(
            seg.segment_sum(v, graph.rows, graph.num_nodes, edge_mask=graph.edge_mask)
            * g
        )

    dv = jax.grad(loss)(jnp.asarray(vals))
    dv_ref = jax.grad(loss_ref)(jnp.asarray(vals))
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=1e-5, atol=1e-5)


def test_narrow_max_grad_tie_free(graph, rng):
    # distinct values => tie-free argmax; gradients must match the oracle
    vals = rng.permutation(graph.capacity * 2).astype(np.float32)[
        : graph.capacity
    ].reshape(graph.capacity, 1)
    g = rng.standard_normal((graph.num_nodes, 1)).astype(np.float32)

    def loss(v):
        return jnp.sum(NSP.segment_max_narrow(graph, v, interpret=True) * g)

    def loss_ref(v):
        return jnp.sum(
            seg.segment_max(v, graph.rows, graph.num_nodes, edge_mask=graph.edge_mask)
            * g
        )

    dv = jax.grad(loss)(jnp.asarray(vals))
    dv_ref = jax.grad(loss_ref)(jnp.asarray(vals))
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=1e-5, atol=1e-5)


def test_narrow_sum_large_random_block_spans(rng):
    # A graph big enough that blocks span multiple chunks and starts are
    # misaligned relative to EDGE_CHUNK.
    n, e = 1000, 30_000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    csr = build_csr(src, dst, n)
    vals = rng.standard_normal((csr.capacity, 2)).astype(np.float32)
    out = NSP.segment_sum_narrow(csr, jnp.asarray(vals), interpret=True)
    ref = seg.segment_sum(jnp.asarray(vals), csr.rows, n, edge_mask=csr.edge_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("heads,f", [(1, 7), (1, 130), (4, 32), (8, 16)])
def test_spmm_rowmask_matches_oracle(graph, rng, heads, f):
    n = graph.num_nodes
    w = rng.random((graph.capacity, heads)).astype(np.float32)
    x = rng.standard_normal((n, heads * f)).astype(np.float32)
    out, den = NSP.spmm_rowmask(
        graph, jnp.asarray(w), jnp.asarray(x), heads=heads,
        with_denom=True, interpret=True,
    )
    rows = np.asarray(graph.rows)
    cols = np.asarray(graph.cols)
    valid = rows < n
    ref = np.zeros((n, heads * f), np.float32)
    ref_den = np.zeros((n, heads), np.float32)
    x3 = x.reshape(n, heads, f)
    for e in np.flatnonzero(valid):
        d, s_ = rows[e], cols[e]
        for h in range(heads):
            ref[d, h * f : (h + 1) * f] += w[e, h] * x3[s_, h]
            ref_den[d, h] += w[e, h]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(den), ref_den, rtol=1e-4, atol=1e-4)


def test_spmm_rowmask_single_head_unweighted_equals_adjacency(graph, rng):
    n = graph.num_nodes
    x = rng.standard_normal((n, 130)).astype(np.float32)
    ones = jnp.ones((graph.capacity, 1), jnp.float32)
    out, _ = NSP.spmm_rowmask(graph, ones, jnp.asarray(x), heads=1, interpret=True)
    rows, cols = np.asarray(graph.rows), np.asarray(graph.cols)
    a = np.zeros((n, n), np.float32)
    valid = rows < n
    np.add.at(a, (rows[valid], cols[valid]), 1.0)
    np.testing.assert_allclose(np.asarray(out), a @ x, rtol=1e-4, atol=1e-4)


def test_spmm_rowmask_bf16(graph, rng):
    n = graph.num_nodes
    w = rng.random((graph.capacity, 1)).astype(np.float32)
    x = rng.standard_normal((n, 128)).astype(np.float32)
    out32, _ = NSP.spmm_rowmask(graph, jnp.asarray(w), jnp.asarray(x), interpret=True)
    out16, _ = NSP.spmm_rowmask(
        graph, jnp.asarray(w), jnp.asarray(x, jnp.bfloat16), interpret=True
    )
    # bf16 stream: ~0.5% relative tolerance vs the f32 path
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), rtol=2e-2, atol=2e-1
    )


def test_spmm_rowmask_segmented(rng, monkeypatch):
    """Forcing a tiny segment budget must not change results."""
    n, e = 1000, 30_000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    csr = build_csr(src, dst, n)
    w = rng.random((csr.capacity, 1)).astype(np.float32)
    x = rng.standard_normal((n, 128)).astype(np.float32)
    ref, ref_den = NSP.spmm_rowmask(
        csr, jnp.asarray(w), jnp.asarray(x), with_denom=True, interpret=True
    )
    monkeypatch.setattr(NSP, "_SEGMENT_BYTES", 64 * 1024)
    meta = NSP.row_block_meta(csr)
    assert len(NSP._rowmask_segments(meta, 128, 4)) > 1
    out, den = NSP.spmm_rowmask(
        csr, jnp.asarray(w), jnp.asarray(x), with_denom=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(den), np.asarray(ref_den), rtol=1e-5, atol=1e-5)
