"""SpMM / SDDMM across execution paths vs dense numpy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stgraph_tpu.graph.csr import build_csr
from stgraph_tpu.ops import message as M


@pytest.fixture
def setup(rng):
    n, e, f = 40, 150, 16
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    csr = build_csr(src, dst, n)
    h = rng.standard_normal((n, f)).astype(np.float32)
    a = np.zeros((n, n), np.float32)
    for s, d in zip(src, dst):
        a[d, s] += 1.0
    return csr, h, a, src, dst


@pytest.mark.parametrize("impl", ["jnp", "dense"])
def test_spmm_sum(setup, impl):
    csr, h, a, *_ = setup
    out = M.spmm(csr, jnp.asarray(h), impl=impl)
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["jnp", "dense"])
def test_spmm_weighted(setup, impl, rng):
    csr, h, a, src, dst = setup
    e = len(src)
    w_user = rng.standard_normal(e).astype(np.float32)
    w_csr = np.zeros(csr.capacity, np.float32)
    w_csr[:e] = w_user[np.asarray(csr.eids)[:e]]
    aw = np.zeros_like(a)
    for i, (s, d) in enumerate(zip(src, dst)):
        aw[d, s] += w_user[i]
    out = M.spmm(csr, jnp.asarray(h), edge_weight=jnp.asarray(w_csr), impl=impl)
    np.testing.assert_allclose(np.asarray(out), aw @ h, rtol=1e-4, atol=1e-4)


def test_spmm_mean_max(setup):
    csr, h, a, src, dst = setup
    n = csr.num_nodes
    outm = np.asarray(M.spmm(csr, jnp.asarray(h), reduce="mean", impl="jnp"))
    outx = np.asarray(M.spmm(csr, jnp.asarray(h), reduce="max", impl="jnp"))
    for d in range(n):
        srcs = [s for s, dd in zip(src, dst) if dd == d]
        if srcs:
            np.testing.assert_allclose(outm[d], h[srcs].mean(0), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(outx[d], h[srcs].max(0), rtol=1e-5, atol=1e-5)
        else:
            np.testing.assert_allclose(outm[d], 0)
            np.testing.assert_allclose(outx[d], 0)


def test_spmm_vjp_matches_dense(setup):
    csr, h, a, *_ = setup

    def f_sparse(x):
        return (M.spmm(csr, x, impl="jnp") ** 2).sum()

    def f_dense(x):
        return ((jnp.asarray(a) @ x) ** 2).sum()

    gs = jax.grad(f_sparse)(jnp.asarray(h))
    gd = jax.grad(f_dense)(jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), rtol=1e-4, atol=1e-4)


def test_sddmm_dot(setup, rng):
    csr, h, a, src, dst = setup
    g = rng.standard_normal(h.shape).astype(np.float32)
    out = np.asarray(M.sddmm(csr, jnp.asarray(h), jnp.asarray(g), op="dot"))
    e = csr.num_edges
    rows = np.asarray(csr.rows)[:e]
    cols = np.asarray(csr.cols)[:e]
    ref = np.sum(h[cols] * g[rows], axis=-1)
    np.testing.assert_allclose(out[:e], ref, rtol=1e-4, atol=1e-4)


def test_csr_to_dense_roundtrip(setup):
    csr, h, a, *_ = setup
    dense = np.asarray(M.csr_to_dense(csr))
    np.testing.assert_allclose(dense, a)


def test_multihead_weighted_spmm(setup, rng):
    csr, h, a, src, dst = setup
    n = csr.num_nodes
    heads, f = 4, 8
    feat = rng.standard_normal((n, heads, f)).astype(np.float32)
    w = rng.random((csr.capacity, heads, 1)).astype(np.float32)
    out = np.asarray(M.spmm(csr, jnp.asarray(feat), edge_weight=jnp.asarray(w), impl="jnp"))
    e = csr.num_edges
    rows = np.asarray(csr.rows)[:e]
    cols = np.asarray(csr.cols)[:e]
    ref = np.zeros((n, heads, f), np.float32)
    for i in range(e):
        ref[rows[i]] += w[i] * feat[cols[i]]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
