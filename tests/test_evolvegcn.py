"""EvolveGCN-O/-H: shapes, weight evolution, scan-ability."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stgraph_tpu import StaticGraph
from stgraph_tpu.nn import EvolveGCNH, EvolveGCNO


@pytest.fixture
def setup(rng):
    n, e, f = 40, 160, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = StaticGraph([(int(s), int(d)) for s, d in zip(src, dst)], None, n)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    return g, x, n, f


@pytest.mark.parametrize("cls", [EvolveGCNO, EvolveGCNH])
def test_forward_and_weight_evolution(setup, cls):
    g, x, n, f = setup
    layer = cls(f, 16)
    params = layer.init(jax.random.key(0), g, x)
    out1, w1 = layer.apply(params, g, x)
    assert out1.shape == (n, 16)
    assert w1.shape == (f, 16)
    out2, w2 = layer.apply(params, g, x, weight=w1)
    # weights actually evolve across steps
    assert not np.allclose(np.asarray(w1), np.asarray(w2))
    assert np.isfinite(np.asarray(out2)).all()


def test_grad_flows_through_evolution(setup):
    g, x, n, f = setup
    layer = EvolveGCNO(f, 16)
    params = layer.init(jax.random.key(0), g, x)

    def loss(p):
        out, w = layer.apply(p, g, x)
        out2, _ = layer.apply(p, g, x, weight=w)
        return (out2**2).sum()

    grads = jax.jit(jax.grad(loss))(params)
    total = jax.tree_util.tree_reduce(lambda a, b: a + jnp.abs(b).sum(), grads, 0.0)
    assert float(total) > 0
