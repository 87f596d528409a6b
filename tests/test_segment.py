"""Segment reductions and segment softmax vs numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from stgraph_tpu.graph.csr import build_csr
from stgraph_tpu.ops import (
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
)


@pytest.fixture
def setup(rng):
    n, e = 30, 100
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    csr = build_csr(src, dst, n, capacity=128)
    data = rng.standard_normal((128, 4)).astype(np.float32)
    return n, e, csr, data


def _per_segment(csr, data, n, e, fn, empty=0.0):
    rows = np.asarray(csr.rows)[:e]
    out = np.full((n,) + data.shape[1:], empty, np.float32)
    for d in range(n):
        sel = data[:e][rows == d]
        if len(sel):
            out[d] = fn(sel)
    return out


def test_segment_sum(setup):
    n, e, csr, data = setup
    out = segment_sum(jnp.asarray(data), csr.rows, n, edge_mask=csr.edge_mask)
    ref = _per_segment(csr, data, n, e, lambda s: s.sum(0))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_segment_sum_ignores_padding_garbage(setup):
    n, e, csr, data = setup
    data = data.copy()
    data[e:] = np.inf  # garbage on padding must not leak
    out = segment_sum(jnp.asarray(data), csr.rows, n, edge_mask=csr.edge_mask)
    assert np.isfinite(np.asarray(out)).all()


def test_segment_max(setup):
    n, e, csr, data = setup
    out = segment_max(jnp.asarray(data), csr.rows, n, edge_mask=csr.edge_mask)
    ref = _per_segment(csr, data, n, e, lambda s: s.max(0))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_segment_min(setup):
    n, e, csr, data = setup
    out = segment_min(jnp.asarray(data), csr.rows, n, edge_mask=csr.edge_mask)
    ref = _per_segment(csr, data, n, e, lambda s: s.min(0))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_segment_mean(setup):
    n, e, csr, data = setup
    out = segment_mean(jnp.asarray(data), csr.rows, n, edge_mask=csr.edge_mask)
    ref = _per_segment(csr, data, n, e, lambda s: s.mean(0))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_segment_softmax_sums_to_one(setup):
    n, e, csr, data = setup
    scores = data[:, :1]
    sm = segment_softmax(jnp.asarray(scores), csr.rows, n, edge_mask=csr.edge_mask)
    sums = segment_sum(sm, csr.rows, n, edge_mask=csr.edge_mask)
    rows = np.asarray(csr.rows)[:e]
    nonempty = np.isin(np.arange(n), rows)
    np.testing.assert_allclose(np.asarray(sums)[nonempty, 0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sums)[~nonempty, 0], 0.0, atol=1e-6)


def test_segment_softmax_stability(setup):
    n, e, csr, data = setup
    # Huge scores would overflow exp without the max shift.
    scores = (data[:, :1] * 0 + 1) * 10000.0
    sm = segment_softmax(jnp.asarray(scores), csr.rows, n, edge_mask=csr.edge_mask)
    assert np.isfinite(np.asarray(sm)[:e]).all()


def test_segment_softmax_matches_numpy(setup):
    n, e, csr, data = setup
    scores = data[:, 0]
    sm = np.asarray(
        segment_softmax(jnp.asarray(scores), csr.rows, n, edge_mask=csr.edge_mask)
    )[:e]
    rows = np.asarray(csr.rows)[:e]
    for d in range(n):
        sel = rows == d
        if sel.sum():
            s = scores[:e][sel]
            ref = np.exp(s - s.max())
            ref /= ref.sum()
            np.testing.assert_allclose(sm[sel], ref, rtol=1e-5, atol=1e-6)
