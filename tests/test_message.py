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


def test_spmm_rowmask_bwd_fused_sddmm(rng):
    """The fused transpose-pass kernel returns both dh and the per-edge
    SDDMM dw, matching dense oracles (single- and multi-head, interpret)."""
    import jax.numpy as jnp
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops import segment_pallas as nsp

    for n, e, heads, f in [(300, 4000, 1, 128), (300, 4000, 8, 16), (97, 511, 4, 32)]:
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        csr_t = build_csr(src, dst, n).transpose()
        cap = csr_t.capacity
        w_t = jnp.asarray(rng.standard_normal((cap, heads)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((n, heads * f)).astype(np.float32))
        fs = jnp.asarray(rng.standard_normal((n, heads * f)).astype(np.float32))
        dh, dw = nsp.spmm_rowmask_bwd(csr_t, w_t, g, fs, heads=heads, interpret=True)
        rows_t = np.asarray(csr_t.rows)
        cols_t = np.asarray(csr_t.cols)
        mask = rows_t < n
        dh_ref = np.zeros((n, heads * f), np.float32)
        dw_ref = np.zeros((cap, heads), np.float32)
        wt_np, g_np, fs_np = np.asarray(w_t), np.asarray(g), np.asarray(fs)
        for i in np.where(mask)[0]:
            s, d = rows_t[i], cols_t[i]
            for h in range(heads):
                sl = slice(h * f, (h + 1) * f)
                dh_ref[s, sl] += wt_np[i, h] * g_np[d, sl]
                dw_ref[i, h] = np.dot(fs_np[s, sl], g_np[d, sl])
        np.testing.assert_allclose(np.asarray(dh), dh_ref, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(dw) * mask[:, None], dw_ref, rtol=2e-4, atol=2e-4
        )


def test_weighted_spmm_grad_fused_matches_jnp(rng):
    """grad of weighted pallas spmm (fused bwd kernel) == grad of jnp path."""
    import jax
    import jax.numpy as jnp
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops import message as M
    from stgraph_tpu.ops import spmm_pallas

    n, e = 200, 3000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    csr = build_csr(src, dst, n)
    h = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((csr.capacity,)).astype(np.float32))
    gref = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))

    def loss_pallas(h, w):
        return jnp.sum(spmm_pallas.spmm(csr, h, w, interpret=True) * gref)

    def loss_jnp(h, w):
        return jnp.sum(M.spmm(csr, h, w, impl="jnp") * gref)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(h, w)
    gj = jax.grad(loss_jnp, argnums=(0, 1))(h, w)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gj[0]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gj[1]), rtol=2e-4, atol=2e-4)


def test_wide_segment_reductions_vs_oracle(rng):
    """segment_max_wide / segment_sum_wide (K > MAX_NARROW_K) match the jnp
    oracle, values and grads (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops import segment as seg
    from stgraph_tpu.ops import segment_pallas as nsp

    for n, e, k in [(200, 3000, 64), (97, 511, 130), (50, 120, 32)]:
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        csr = build_csr(src, dst, n)
        v = jnp.asarray(
            rng.standard_normal((csr.capacity, k)).astype(np.float32)
        )
        gref = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))

        got = nsp.segment_max_wide(csr, v, interpret=True)
        want = seg.segment_max(v, csr.rows, n, edge_mask=csr.edge_mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )
        gs = nsp.segment_sum_wide(csr, v, interpret=True)
        ws = seg.segment_sum(v, csr.rows, n, edge_mask=csr.edge_mask)
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(ws), rtol=1e-4, atol=1e-4
        )
        # gradients
        gk = jax.grad(
            lambda x: jnp.sum(nsp.segment_sum_wide(csr, x, interpret=True) * gref)
        )(v)
        gj = jax.grad(
            lambda x: jnp.sum(
                seg.segment_sum(x, csr.rows, n, edge_mask=csr.edge_mask) * gref
            )
        )(v)
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gj), rtol=1e-4, atol=1e-4
        )


def test_spmm_dynidx_matches_constant_path(rng):
    """src_ids-as-argument routing (ogbn-scale module-size workaround)
    matches the embedded-constant path, values and grads."""
    import jax
    import jax.numpy as jnp
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops import spmm_pallas

    n, e = 200, 3000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    csr = build_csr(src, dst, n)
    csr_t = csr.transpose()
    _, _, cols_np, _ = csr.host_arrays()
    _, _, cols_t_np, _ = csr_t.host_arrays()
    sids = jnp.asarray(np.minimum(cols_np, n - 1))
    sids_t = jnp.asarray(np.minimum(cols_t_np, n - 1))
    h = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((csr.capacity,)).astype(np.float32))
    gref = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))

    for weights in (None, w):
        ref = spmm_pallas.spmm(csr, h, weights, csr_t=csr_t, interpret=True)
        got = spmm_pallas.spmm(
            csr, h, weights, csr_t=csr_t, interpret=True,
            src_ids=sids, src_ids_t=sids_t,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def loss_dyn(h, w):
        return jnp.sum(
            spmm_pallas.spmm(
                csr, h, w, csr_t=csr_t, interpret=True,
                src_ids=sids, src_ids_t=sids_t,
            ) * gref
        )

    def loss_const(h, w):
        return jnp.sum(
            spmm_pallas.spmm(csr, h, w, csr_t=csr_t, interpret=True) * gref
        )

    gd = jax.grad(loss_dyn, argnums=(0, 1))(h, w)
    gc = jax.grad(loss_const, argnums=(0, 1))(h, w)
    for a, b in zip(gd, gc):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )
