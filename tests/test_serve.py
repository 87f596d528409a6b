"""Serving-path tests: AOT compile, checkpoint restore, output parity."""

import jax
import jax.numpy as jnp
import numpy as np

from stgraph_tpu import StaticGraph
from stgraph_tpu.nn import GCNConv
from stgraph_tpu.serve import Predictor
from stgraph_tpu.utils import Checkpointer


def _setup(rng):
    n, e = 60, 240
    g = StaticGraph(
        np.stack([rng.integers(0, n, e), rng.integers(0, n, e)], 1), None, n
    )
    x = jnp.asarray(rng.standard_normal((n, 12)).astype(np.float32))
    conv = GCNConv(12, 4)
    params = jax.jit(lambda k, x: conv.init(k, g, x))(jax.random.key(0), x)
    return g, x, conv, params


def test_predictor_matches_apply(rng):
    g, x, conv, params = _setup(rng)
    pred = Predictor.build(lambda p, x: conv.apply(p, g, x), params, (x,))
    np.testing.assert_allclose(
        np.asarray(pred(x)), np.asarray(conv.apply(params, g, x)), rtol=1e-6
    )
    assert pred.cost_analysis is None or isinstance(pred.cost_analysis, dict)


def test_predictor_from_checkpoint(tmp_path, rng):
    g, x, conv, params = _setup(rng)
    Checkpointer(str(tmp_path)).save(5, params)
    pred = Predictor.from_checkpoint(
        str(tmp_path), lambda p, x: conv.apply(p, g, x), like=params,
        example_inputs=(x,),
    )
    np.testing.assert_allclose(
        np.asarray(pred(x)), np.asarray(conv.apply(params, g, x)), rtol=1e-5,
        atol=1e-6,
    )


def test_predictor_missing_checkpoint(tmp_path, rng):
    import pytest

    g, x, conv, params = _setup(rng)
    with pytest.raises(FileNotFoundError):
        Predictor.from_checkpoint(
            str(tmp_path / "empty"), lambda p, x: conv.apply(p, g, x),
            like=params, example_inputs=(x,),
        )
