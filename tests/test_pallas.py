"""Pallas blocked-CSR SpMM (interpret mode) vs dense oracle.

Real-TPU execution of the same kernels is exercised by ``bench.py``; these
tests validate numerics and the custom VJP on CPU via the interpreter.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stgraph_tpu.graph.blocked import EDGE_CHUNK, ROW_BLOCK, build_blocked
from stgraph_tpu.graph.csr import build_csr
from stgraph_tpu.ops import message as M
from stgraph_tpu.ops import spmm_pallas as SP


@pytest.fixture
def setup(rng):
    n, e, f = 300, 2000, 130
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    csr = build_csr(src, dst, n)
    h = rng.standard_normal((n, f)).astype(np.float32)
    a = np.zeros((n, n), np.float32)
    for s, d in zip(src, dst):
        a[d, s] += 1.0
    return csr, h, a, src, dst


def test_blocked_layout_invariants(setup):
    csr, *_ = setup
    b = build_blocked(csr)
    offsets = np.asarray(b.offsets)
    counts = np.asarray(b.counts)
    assert (offsets % EDGE_CHUNK == 0).all()
    assert (counts % EDGE_CHUNK == 0).all()
    assert b.num_rows_padded % ROW_BLOCK == 0
    # Every real edge appears exactly once with consistent dst/cols.
    dst_b = np.asarray(b.dst)
    perm = np.asarray(b.perm)
    real = perm < csr.capacity
    assert real.sum() == csr.num_edges
    np.testing.assert_array_equal(dst_b[real], np.asarray(csr.rows)[perm[real]])
    # Edges of block rb have dst within the block's row range.
    for rb in range(b.num_blocks):
        o, c = offsets[rb], counts[rb]
        seg = dst_b[o : o + c]
        seg = seg[seg < b.num_nodes]
        if len(seg):
            assert (seg >= rb * ROW_BLOCK).all() and (seg < (rb + 1) * ROW_BLOCK).all()


def test_pallas_spmm_unweighted(setup):
    csr, h, a, *_ = setup
    out = SP.spmm(csr, jnp.asarray(h), interpret=True)
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)


def test_pallas_spmm_weighted(setup, rng):
    csr, h, a, src, dst = setup
    e = len(src)
    w_user = rng.standard_normal(e).astype(np.float32)
    w_csr = np.zeros(csr.capacity, np.float32)
    w_csr[:e] = w_user[np.asarray(csr.eids)[:e]]
    aw = np.zeros_like(a)
    for i, (s, d) in enumerate(zip(src, dst)):
        aw[d, s] += w_user[i]
    out = SP.spmm(csr, jnp.asarray(h), edge_weight=jnp.asarray(w_csr), interpret=True)
    np.testing.assert_allclose(np.asarray(out), aw @ h, rtol=1e-4, atol=1e-4)


def test_pallas_vjp_matches_dense(setup, rng):
    csr, h, a, *_ = setup
    w_csr = rng.random(csr.capacity).astype(np.float32)

    def f_pallas(h, w):
        return (SP.spmm(csr, h, edge_weight=w, interpret=True) ** 2).sum()

    def f_dense(h, w):
        return ((M.csr_to_dense(csr, w) @ h) ** 2).sum()

    gh, gw = jax.grad(f_pallas, argnums=(0, 1))(jnp.asarray(h), jnp.asarray(w_csr))
    gh_d, gw_d = jax.grad(f_dense, argnums=(0, 1))(jnp.asarray(h), jnp.asarray(w_csr))
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_d), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_d), rtol=1e-3, atol=1e-3)


def test_pallas_under_jit_with_closure_graph(setup):
    csr, h, a, *_ = setup
    out = jax.jit(lambda x: SP.spmm(csr, x, interpret=True))(jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)


def test_pallas_empty_rows(rng):
    # Graph where many row blocks have zero edges.
    n = 600
    src = rng.integers(0, 10, 50)
    dst = rng.integers(0, 10, 50)  # edges only among first 10 nodes
    csr = build_csr(src, dst, n)
    h = rng.standard_normal((n, 8)).astype(np.float32)
    out = np.asarray(SP.spmm(csr, jnp.asarray(h), interpret=True))
    a = np.zeros((n, n), np.float32)
    for s, d in zip(src, dst):
        a[d, s] += 1.0
    np.testing.assert_allclose(out, a @ h, rtol=1e-4, atol=1e-4)


def test_pallas_spmm_multihead(setup, rng):
    """(N, H, F) feats with per-(edge, head) weights vs the jnp oracle."""
    csr, _, a, src, dst = setup
    n = csr.num_nodes
    heads, f = 4, 16
    h = jnp.asarray(rng.standard_normal((n, heads, f)).astype(np.float32))
    w = jnp.asarray(rng.random((csr.capacity, heads)).astype(np.float32))
    out = SP.spmm(csr, h, edge_weight=w, interpret=True)
    oracle = M.spmm(csr, h, edge_weight=w, impl="jnp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), rtol=1e-4, atol=1e-4)


def test_pallas_spmm_multihead_grads(setup, rng):
    csr, _, a, src, dst = setup
    n = csr.num_nodes
    heads, f = 2, 8
    h = jnp.asarray(rng.standard_normal((n, heads, f)).astype(np.float32))
    w = jnp.asarray(rng.random((csr.capacity, heads)).astype(np.float32))

    def loss_p(h, w):
        return (SP.spmm(csr, h, edge_weight=w, interpret=True) ** 2).sum()

    def loss_j(h, w):
        return (M.spmm(csr, h, edge_weight=w, impl="jnp") ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1))(h, w)
    gj = jax.grad(loss_j, argnums=(0, 1))(h, w)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gj[0]), rtol=1e-3, atol=1e-3)
    # Weight grads only matter on real edges (padding has no effect).
    mask = np.asarray(csr.edge_mask)
    np.testing.assert_allclose(
        np.asarray(gp[1])[mask], np.asarray(gj[1])[mask], rtol=1e-3, atol=1e-3
    )


def test_pallas_spmm_bf16(setup):
    """bf16 feats: accumulate f32, tolerances loosened to bf16 precision."""
    csr, h, a, *_ = setup
    hb = jnp.asarray(h).astype(jnp.bfloat16)
    out = SP.spmm(csr, hb, interpret=True)
    oracle = a @ h
    np.testing.assert_allclose(
        np.asarray(out, np.float32), oracle, rtol=2e-2, atol=2e-1
    )


def test_blocked_cache_not_traced(setup):
    """Lazy blocked layouts first touched inside jit must stay concrete."""
    from stgraph_tpu import StaticGraph

    csr, h, a, src, dst = setup
    g = StaticGraph(np.stack([src, dst], 1), None, csr.num_nodes)

    @jax.jit
    def touch(x):
        _ = g.blocked_fwd, g.blocked_bwd
        return x * 1.0

    touch(jnp.ones(3))
    # Using the cache outside the trace must not raise UnexpectedTracerError.
    assert int(np.asarray(g.blocked_fwd.offsets)[0]) == 0
    out = SP.spmm(csr, jnp.asarray(h), blocked=g.blocked_fwd,
                  blocked_t=g.blocked_bwd, interpret=True)
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)


def test_segmented_spmm_matches(setup, rng, monkeypatch):
    """Streaming (segmented) execution must match the single-shot path."""
    csr, h, a, *_ = setup
    # Force tiny segments: every row block becomes its own segment.
    monkeypatch.setattr(SP, "_SEGMENT_BYTES", 1)
    out = SP.spmm(csr, jnp.asarray(h), interpret=True)
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)
    # weighted + grads
    w = jnp.asarray(rng.random(csr.capacity).astype(np.float32))

    def loss(h_, w_):
        return (SP.spmm(csr, h_, edge_weight=w_, interpret=True) ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1))(jnp.asarray(h), w)
    monkeypatch.setattr(SP, "_SEGMENT_BYTES", 512 * 1024 * 1024)
    g2 = jax.grad(loss, argnums=(0, 1))(jnp.asarray(h), w)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g2[0]), rtol=1e-3, atol=1e-3)
    mask = np.asarray(csr.edge_mask)
    np.testing.assert_allclose(
        np.asarray(g[1])[mask], np.asarray(g2[1])[mask], rtol=1e-3, atol=1e-3
    )


def test_segment_sum_edges_matches_oracle(setup, rng):
    """Scatter-free edge segment-sum (fwd + bwd) vs jax.ops.segment_sum."""
    csr, h, a, *_ = setup
    for shape in [(csr.capacity,), (csr.capacity, 4), (csr.capacity, 3, 2)]:
        v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        out = SP.segment_sum_edges(csr, v, interpret=True)
        oracle = jax.ops.segment_sum(
            jnp.where(
                csr.edge_mask.reshape((-1,) + (1,) * (v.ndim - 1)), v, 0.0
            ),
            jnp.asarray(csr.rows),
            num_segments=csr.num_nodes,
            indices_are_sorted=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(oracle), rtol=1e-4, atol=1e-4
        )

    v = jnp.asarray(rng.standard_normal((csr.capacity, 4)).astype(np.float32))

    def loss_p(v):
        return (SP.segment_sum_edges(csr, v, interpret=True) ** 2).sum()

    def loss_o(v):
        m = jnp.where(csr.edge_mask[:, None], v, 0.0)
        return (
            jax.ops.segment_sum(
                m, jnp.asarray(csr.rows), num_segments=csr.num_nodes,
                indices_are_sorted=True,
            )
            ** 2
        ).sum()

    gp = jax.grad(loss_p)(v)
    go = jax.grad(loss_o)(v)
    mask = np.asarray(csr.edge_mask)
    np.testing.assert_allclose(
        np.asarray(gp)[mask], np.asarray(go)[mask], rtol=1e-4, atol=1e-4
    )
