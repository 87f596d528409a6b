"""Vertex-centric compiler: tracing, IR passes, lowering, autodiff."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stgraph_tpu import STGraph, StaticGraph
from stgraph_tpu.compiler import dsl, trace
from stgraph_tpu.compiler.ir import ValType


@pytest.fixture
def setup(rng):
    n, e, f = 40, 160, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = StaticGraph([(int(s), int(d)) for s, d in zip(src, dst)], None, n)
    h = rng.standard_normal((n, f)).astype(np.float32)
    norm = (rng.random((n, 1)) + 0.5).astype(np.float32)
    a = np.zeros((n, n), np.float32)
    for s, d in zip(src, dst):
        a[d, s] += 1.0
    return g, h, norm, a, src, dst


def test_trace_builds_program():
    tr = trace(
        lambda v: sum([nb.h * nb.norm for nb in v.innbs]) * v.norm,
        {"h": ((8,), np.float32), "norm": ((1,), np.float32)},
        {},
    )
    ops = [s.op for s in tr.program.stmts]
    assert ops == ["Mul", "AggSum", "Mul"]
    assert tr.output.val_type == ValType.DEST


def test_cse_dedups_repeated_subexpr():
    def f(v):
        a = [nb.h * nb.norm for nb in v.innbs][0]
        b = [nb.h * nb.norm for nb in v.innbs][0]
        return dsl.agg_sum([a + b])

    tr = trace(f, {"h": ((8,), np.float32), "norm": ((1,), np.float32)}, {})
    muls = [s for s in tr.program.stmts if s.op == "Mul"]
    assert len(muls) == 1  # second identical Mul CSE'd away


def test_dce_removes_unused():
    def f(v):
        unused = v.h * 3.0
        return dsl.agg_sum([nb.h for nb in v.innbs])

    tr = trace(f, {"h": ((8,), np.float32)}, {})
    assert all(s.op != "Mul" for s in tr.program.stmts)


@pytest.mark.parametrize("impl", ["jnp", "dense"])
def test_gcn_formula(setup, impl):
    g, h, norm, a, *_ = setup
    stg = STGraph()

    @stg.compile(impl=impl)
    def nb_compute(v):
        return sum([nb.h * nb.norm for nb in v.innbs]) * v.norm

    out = nb_compute(g, n_feats={"h": jnp.asarray(h), "norm": jnp.asarray(norm)})
    ref = (a @ (h * norm)) * norm
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_weighted_gcn_formula(setup, rng):
    g, h, norm, a, src, dst = setup
    e = len(src)
    w = rng.random(e).astype(np.float32)
    stg = STGraph()

    @stg.compile()
    def nb_compute(v):
        return (
            sum([eg.src.norm * eg.src.h * eg.edge_weight for eg in v.inedges]) * v.norm
        )

    out = nb_compute(
        g,
        n_feats={"h": jnp.asarray(h), "norm": jnp.asarray(norm)},
        e_feats={"edge_weight": jnp.asarray(w[:, None])},
    )
    aw = np.zeros_like(a)
    for i, (s, d) in enumerate(zip(src, dst)):
        aw[d, s] += w[i]
    ref = (aw @ (h * norm)) * norm
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_gat_formula_stable_softmax(setup, rng):
    g, h, norm, a, src, dst = setup
    n = g.get_num_nodes()
    heads, f = 4, 8
    feat = rng.standard_normal((n, heads, f)).astype(np.float32)
    el = rng.standard_normal((n, heads, 1)).astype(np.float32)
    er = rng.standard_normal((n, heads, 1)).astype(np.float32)
    stg = STGraph()

    @stg.compile()
    def nb_forward(v):
        embs = [dsl.leaky_relu(nb.el + v.er, negative_slope=0.2) for nb in v.innbs]
        m = dsl.agg_max(embs)
        coeff = [dsl.exp(emb - m) for emb in embs]
        s = dsl.agg_sum(coeff)
        alpha = [c / s for c in coeff]
        fs = [nb.feat_src for nb in v.innbs]
        return sum([alpha[i] * fs[i] for i in range(len(fs))])

    out = np.asarray(
        nb_forward(
            g,
            n_feats={
                "el": jnp.asarray(el),
                "er": jnp.asarray(er),
                "feat_src": jnp.asarray(feat),
            },
        )
    )

    def lrelu(x):
        return np.where(x >= 0, x, 0.2 * x)

    ref = np.zeros((n, heads, f), np.float32)
    for d in range(n):
        srcs = [s for s, dd in zip(src, dst) if dd == d]
        if not srcs:
            continue
        scores = lrelu(np.stack([el[s, :, 0] + er[d, :, 0] for s in srcs]))
        c = np.exp(scores - scores.max(0, keepdims=True))
        al = c / c.sum(0, keepdims=True)
        ref[d] = np.einsum("eh,ehf->hf", al, np.stack([feat[s] for s in srcs]))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_agg_mean_formula(setup):
    g, h, norm, a, src, dst = setup
    stg = STGraph()

    @stg.compile()
    def f(v):
        return dsl.agg_mean([nb.h for nb in v.innbs])

    out = np.asarray(f(g, n_feats={"h": jnp.asarray(h)}))
    n = g.get_num_nodes()
    for d in range(n):
        srcs = [s for s, dd in zip(src, dst) if dd == d]
        ref = h[srcs].mean(0) if srcs else np.zeros(h.shape[1])
        np.testing.assert_allclose(out[d], ref, rtol=1e-4, atol=1e-4)


def test_grad_through_compiled_program(setup):
    g, h, norm, a, *_ = setup
    stg = STGraph()

    @stg.compile()
    def nb_compute(v):
        return sum([nb.h * nb.norm for nb in v.innbs]) * v.norm

    def loss(hh):
        return (
            nb_compute(g, n_feats={"h": hh, "norm": jnp.asarray(norm)}) ** 2
        ).sum()

    def loss_dense(hh):
        return (((jnp.asarray(a) @ (hh * norm)) * norm) ** 2).sum()

    gs = jax.grad(loss)(jnp.asarray(h))
    gd = jax.grad(loss_dense)(jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), rtol=1e-4, atol=1e-4)


def test_captured_scalar_becomes_param(setup):
    g, h, norm, a, *_ = setup
    scale = 2.5
    stg = STGraph()

    @stg.compile()
    def f(v):
        return sum([nb.h * scale for nb in v.innbs])

    out = np.asarray(f(g, n_feats={"h": jnp.asarray(h)}))
    np.testing.assert_allclose(out, a @ (h * scale), rtol=1e-4, atol=1e-4)


def test_vertex_program_not_iterable_guard():
    with pytest.raises(TypeError):
        trace(lambda v: [x for x in v.h][0], {"h": ((8,), np.float32)}, {})


def test_out_direction_aggregation(rng):
    """sum over v.outnbs == transpose aggregation (A^T @ h)."""
    import jax.numpy as jnp

    from stgraph_tpu import StaticGraph, STGraph

    n, e = 40, 160
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = StaticGraph(np.stack([src, dst], 1), None, n)
    h = jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32))

    sg = STGraph()

    @sg.compile()
    def out_sum(v):
        return sum([nb.h for nb in v.outnbs])

    out = out_sum(g, n_feats={"h": h})
    a = np.zeros((n, n), np.float32)
    for s, d in zip(src, dst):
        a[d, s] += 1.0
    np.testing.assert_allclose(np.asarray(out), a.T @ np.asarray(h), rtol=1e-4, atol=1e-4)


def test_mixed_direction_rejected(rng):
    import jax.numpy as jnp
    import pytest

    from stgraph_tpu import StaticGraph, STGraph

    n = 10
    g = StaticGraph([(0, 1), (1, 2)], None, n)
    h = jnp.ones((n, 3), jnp.float32)
    sg = STGraph()

    @sg.compile()
    def mixed(v):
        return sum([nb.h for nb in v.innbs]) + sum([nb.h for nb in v.outnbs])

    with pytest.raises(NotImplementedError):
        mixed(g, n_feats={"h": h})
