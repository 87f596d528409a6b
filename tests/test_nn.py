"""NN layers: shapes, numerics vs torch oracles, gradient flow.

The torch oracles implement the textbook math (DGL-style) — this is the
"per-layer allclose vs reference PyTorch" requirement from BASELINE.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from stgraph_tpu import StaticGraph
from stgraph_tpu.nn import GATConv, GCNConv, TGCN


@pytest.fixture
def setup(rng):
    n, e, f = 30, 120, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = StaticGraph([(int(s), int(d)) for s, d in zip(src, dst)], None, n)
    x = rng.standard_normal((n, f)).astype(np.float32)
    return g, x, src, dst, n, f


def _torch_gcn(x, w, b, src, dst, n, norm):
    """Reference GCN math in torch: (N·A·N)(xW) + b with N = diag(norm)."""
    xt = torch.tensor(x) @ torch.tensor(w)
    xt = xt * torch.tensor(norm)
    out = torch.zeros_like(xt)
    out.index_add_(0, torch.tensor(dst, dtype=torch.long), xt[torch.tensor(src, dtype=torch.long)])
    out = out * torch.tensor(norm)
    if b is not None:
        out = out + torch.tensor(b)
    return out.numpy()


def test_gcn_allclose_vs_torch(setup):
    g, x, src, dst, n, f = setup
    layer = GCNConv(f, 16)
    params = layer.init(jax.random.key(0), g, jnp.asarray(x))
    out = np.asarray(layer.apply(params, g, jnp.asarray(x)))
    w = np.asarray(params["params"]["weight"])
    b = np.asarray(params["params"]["bias"])
    deg = np.bincount(dst, minlength=n).astype(np.float32)
    norm = np.where(deg > 0, np.maximum(deg, 1.0) ** -0.5, 1.0)[:, None]
    ref = _torch_gcn(x, w, b, src, dst, n, norm)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_gcn_weighted_allclose_vs_torch(setup, rng):
    g, x, src, dst, n, f = setup
    e = len(src)
    ew = rng.random(e).astype(np.float32)
    layer = GCNConv(f, 16, use_bias=False)
    params = layer.init(jax.random.key(0), g, jnp.asarray(x), edge_weight=jnp.asarray(ew))
    out = np.asarray(layer.apply(params, g, jnp.asarray(x), edge_weight=jnp.asarray(ew)))
    w = np.asarray(params["params"]["weight"])
    deg = np.bincount(dst, minlength=n).astype(np.float32)
    norm = np.where(deg > 0, np.maximum(deg, 1.0) ** -0.5, 1.0)[:, None]
    xt = torch.tensor(x) @ torch.tensor(w)
    xt = xt * torch.tensor(norm)
    msg = xt[torch.tensor(src, dtype=torch.long)] * torch.tensor(ew)[:, None]
    ref = torch.zeros_like(xt)
    ref.index_add_(0, torch.tensor(dst, dtype=torch.long), msg)
    ref = (ref * torch.tensor(norm)).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_gat_allclose_vs_torch(setup):
    g, x, src, dst, n, f = setup
    heads, fo = 4, 8
    layer = GATConv(f, fo, num_heads=heads, negative_slope=0.2)
    params = layer.init(jax.random.key(0), g, jnp.asarray(x))
    out = np.asarray(layer.apply(params, g, jnp.asarray(x)))

    fc_w = np.asarray(params["params"]["fc"]["kernel"])  # (f, heads*fo)
    attn_l = np.asarray(params["params"]["attn_l"])  # (1, heads, fo)
    attn_r = np.asarray(params["params"]["attn_r"])

    feat = (torch.tensor(x) @ torch.tensor(fc_w)).reshape(n, heads, fo)
    el = (feat * torch.tensor(attn_l)).sum(-1, keepdim=True)  # (n, heads, 1)
    er = (feat * torch.tensor(attn_r)).sum(-1, keepdim=True)
    scores = el[src][:, :, 0] + er[dst][:, :, 0]  # (e, heads)
    scores = torch.nn.functional.leaky_relu(scores, 0.2)
    ref = torch.zeros(n, heads, fo)
    for d in range(n):
        sel = np.where(dst == d)[0]
        if len(sel) == 0:
            continue
        sc = scores[sel]
        al = torch.softmax(sc, dim=0)
        ref[d] = (al[:, :, None] * feat[src[sel]]).sum(0)
    np.testing.assert_allclose(out, ref.numpy(), rtol=1e-4, atol=1e-4)


def test_tgcn_shapes_and_state(setup):
    g, x, src, dst, n, f = setup
    layer = TGCN(f, 16)
    params = layer.init(jax.random.key(0), g, jnp.asarray(x))
    h1 = layer.apply(params, g, jnp.asarray(x))
    assert h1.shape == (n, 16)
    h2 = layer.apply(params, g, jnp.asarray(x), hidden=h1)
    assert h2.shape == (n, 16)
    assert not np.allclose(np.asarray(h1), np.asarray(h2))
    # GRU property: values bounded by tanh/sigmoid mixing
    assert np.isfinite(np.asarray(h2)).all()


def test_gcn_impl_paths_agree(setup):
    g, x, src, dst, n, f = setup
    outs = {}
    for impl in ["jnp", "dense"]:
        layer = GCNConv(f, 16, impl=impl)
        params = layer.init(jax.random.key(0), g, jnp.asarray(x))
        outs[impl] = np.asarray(layer.apply(params, g, jnp.asarray(x)))
    np.testing.assert_allclose(outs["jnp"], outs["dense"], rtol=1e-4, atol=1e-4)


def test_training_reduces_loss(setup):
    """Two GCN layers + optax adam actually learn on a toy task."""
    import optax

    import flax.linen as fnn

    g, x, src, dst, n, f = setup
    labels = jnp.asarray(np.arange(n) % 3)

    class GCN(fnn.Module):
        @fnn.compact
        def __call__(self, graph, h):
            h = GCNConv(f, 16, activation=jax.nn.relu)(graph, h)
            return GCNConv(16, 3)(graph, h)

    model = GCN()
    params = model.init(jax.random.key(0), g, jnp.asarray(x))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, g, jnp.asarray(x))
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(80):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8


def test_gcn_conv_bf16_dtype(rng):
    """dtype=bfloat16 computes in bf16 with f32 params."""
    import jax
    import jax.numpy as jnp

    from stgraph_tpu import StaticGraph
    from stgraph_tpu.nn import GCNConv

    n, e = 50, 200
    g = StaticGraph(
        np.stack([rng.integers(0, n, e), rng.integers(0, n, e)], 1), None, n
    )
    x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    conv = GCNConv(16, 8, dtype=jnp.bfloat16)
    params = conv.init(jax.random.key(0), g, x)
    assert params["params"]["weight"].dtype == jnp.float32
    out = conv.apply(params, g, x)
    assert out.dtype == jnp.bfloat16
    ref = GCNConv(16, 8).apply(params, g, x)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=5e-2, atol=5e-1
    )


def test_gat_dense_path_agrees(setup, rng):
    """Dense-mask attention fast path == vertex-program path."""
    import jax
    import jax.numpy as jnp

    from stgraph_tpu.nn import GATConv

    g, x, *_ = setup
    conv_d = GATConv(x.shape[-1], 8, num_heads=4, impl="dense")
    conv_j = GATConv(x.shape[-1], 8, num_heads=4, impl="jnp")
    params = conv_d.init(jax.random.key(0), g, x)
    out_d = conv_d.apply(params, g, x)
    out_j = conv_j.apply(params, g, x)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_j), rtol=1e-4, atol=1e-4
    )


def test_gat_dense_isolated_nodes_finite(rng):
    """Zero-in-degree nodes and out-of-neighborhood score spikes must not
    produce NaN in the dense attention path (code-review regression)."""
    import jax
    import jax.numpy as jnp

    from stgraph_tpu import StaticGraph
    from stgraph_tpu.nn import GATConv

    # Node 3 has no in-edges; scores are scaled up to stress exp overflow.
    g = StaticGraph([(0, 1), (1, 2), (2, 0)], None, 4)
    x = jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32)) * 40.0
    conv = GATConv(6, 4, num_heads=2, impl="dense")
    params = conv.init(jax.random.key(0), g, x)
    out = conv.apply(params, g, x)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out)[3], 0.0, atol=1e-6)


def test_gat_sparse_path_agrees(setup, rng):
    """Fused sparse attention (ones-column normalizer) == vertex program,
    values and gradients."""
    import jax
    import jax.numpy as jnp

    from stgraph_tpu.nn import GATConv

    g, x, *_ = setup
    conv_s = GATConv(x.shape[-1], 8, num_heads=4, impl="sparse")
    conv_j = GATConv(x.shape[-1], 8, num_heads=4, impl="jnp")
    params = conv_s.init(jax.random.key(0), g, x)
    out_s = conv_s.apply(params, g, x)
    out_j = conv_j.apply(params, g, x)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_j), rtol=1e-4, atol=1e-4
    )

    def loss(c):
        return lambda p, xx: jnp.sum(c.apply(p, g, xx) ** 2)

    gs_p, gs_x = jax.grad(loss(conv_s), argnums=(0, 1))(params, x)
    gj_p, gj_x = jax.grad(loss(conv_j), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gs_x), np.asarray(gj_x), rtol=1e-3, atol=1e-3)
    for a, b in zip(jax.tree.leaves(gs_p), jax.tree.leaves(gj_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_gat_sparse_isolated_nodes_finite(rng):
    import jax
    import jax.numpy as jnp

    from stgraph_tpu import StaticGraph
    from stgraph_tpu.nn import GATConv

    g = StaticGraph([(0, 1), (1, 2), (2, 0)], None, 4)
    x = jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32)) * 40.0
    conv = GATConv(6, 4, num_heads=2, impl="sparse")
    params = conv.init(jax.random.key(0), g, x)
    out = conv.apply(params, g, x)
    assert bool(jnp.isfinite(out).all())
    assert np.allclose(np.asarray(out)[3], 0.0)


def test_sparse_attention_rowmask_interpret_agrees(setup, rng):
    """ops.sparse_gat_attention with the fused rowmask kernel (interpret)
    == jnp segment-softmax oracle, values and gradients."""
    import jax
    import jax.numpy as jnp

    from stgraph_tpu.ops import segment as seg
    from stgraph_tpu.ops.attention import sparse_gat_attention

    g, x, *_ = setup
    csr = g.fwd_csr
    n = csr.num_nodes
    h, f = 2, 64  # 128 % 64 == 0, 2*64 % 128 == 0 -> rowmask eligible
    el = jnp.asarray(rng.standard_normal((n, h, 1)).astype(np.float32))
    er = jnp.asarray(rng.standard_normal((n, h, 1)).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))

    def oracle(el, er, fs):
        s = el[..., 0][csr.cols] + er[..., 0][csr.rows]
        s = jnp.where(s >= 0, s, 0.2 * s)
        alpha = seg.segment_softmax(s, csr.rows, n, edge_mask=csr.edge_mask)
        msg = fs[jnp.minimum(csr.cols, n - 1)] * alpha[:, :, None]
        return seg.segment_sum(msg, csr.rows, n, edge_mask=csr.edge_mask)

    out = sparse_gat_attention(csr, el, er, fs, interpret=True)
    ref = oracle(el, er, fs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    gref = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))
    grads = jax.grad(
        lambda *a: jnp.sum(sparse_gat_attention(csr, *a, interpret=True) * gref),
        argnums=(0, 1, 2),
    )(el, er, fs)
    grads_ref = jax.grad(
        lambda *a: jnp.sum(oracle(*a) * gref), argnums=(0, 1, 2)
    )(el, er, fs)
    for a, b in zip(grads, grads_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3
        )


def test_gat_attn_drop_applied(rng):
    """attn_drop now actually applies (DGL semantics): deterministic mode
    matches no-dropout; train mode perturbs the output and keeps its
    expectation close; grads stay finite. Covers the dense path and the
    large-graph edge-domain path."""
    import jax
    import jax.numpy as jnp

    from stgraph_tpu import StaticGraph
    from stgraph_tpu.nn import GATConv

    n = 60
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    g = StaticGraph(np.stack([src, dst], 1), None, n)
    x = jnp.asarray(rng.standard_normal((n, 12)).astype(np.float32))

    for impl in ("dense", "sparse"):
        conv = GATConv(12, 8, num_heads=2, attn_drop=0.5, impl=impl)
        params = conv.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            g, x,
        )
        base = conv.apply(params, g, x, deterministic=True)
        ref = GATConv(12, 8, num_heads=2, impl=impl).apply(params, g, x)
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
        outs = [
            conv.apply(
                params, g, x, deterministic=False,
                rngs={"dropout": jax.random.key(i)},
            )
            for i in range(20)
        ]
        # Dropout changes individual draws...
        assert not np.allclose(np.asarray(outs[0]), np.asarray(base))
        # ...but is unbiased: the mean over draws approaches the
        # deterministic output.
        mean = np.mean([np.asarray(o) for o in outs], axis=0)
        err = np.abs(mean - np.asarray(base)).mean()
        scale = np.abs(np.asarray(base)).mean()
        assert err < 0.35 * scale

        gr = jax.grad(
            lambda p: jnp.sum(
                conv.apply(
                    p, g, x, deterministic=False,
                    rngs={"dropout": jax.random.key(7)},
                )
                ** 2
            )
        )(params)
        for leaf in jax.tree_util.tree_leaves(gr):
            assert bool(jnp.isfinite(leaf).all())
