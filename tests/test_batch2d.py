"""2-D ('data', 'graph') mesh: window-parallel TGCN mini-batching.

Batched loss/grads over the 2x4 mesh must match the strictly sequential
per-window computation on the 1-D graph mesh (same params, same windows).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stgraph_tpu.parallel import partition_edges, shard_node_array
from stgraph_tpu.parallel.batch import (
    dist_tgcn_batched_loss,
    shard_window_batch,
)
from stgraph_tpu.parallel.layers import dist_tgcn_cell, dist_tgcn_params


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _setup(rng, p=4):
    n, e, fin, fout, b, t = 64, 256, 6, 5, 4, 3
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, p)
    params = dist_tgcn_params(jax.random.key(0), fin, fout)
    norm = jnp.asarray((rng.random((n, 1)) + 0.5).astype(np.float32))
    xs = rng.standard_normal((b, t, n, fin)).astype(np.float32)
    ys = rng.standard_normal((b, t, n, fout)).astype(np.float32)
    return dg, params, norm, jnp.asarray(xs), jnp.asarray(ys), fout


def _sequential_oracle(mesh1d, dg, params, norm, xs, ys, fout):
    """Strictly sequential per-window loss on the 1-D graph mesh."""
    norms1 = shard_node_array(mesh1d, norm, dg)

    def seq(p):
        total = 0.0
        for b in range(xs.shape[0]):
            hidden = jnp.zeros((dg.padded_nodes, fout), jnp.float32)
            w_losses = []
            for t in range(xs.shape[1]):
                x_t = shard_node_array(mesh1d, xs[b, t], dg)
                y_t = shard_node_array(mesh1d, ys[b, t], dg)
                hidden = dist_tgcn_cell(mesh1d, dg, p, x_t, norms1, hidden)
                w_losses.append(jnp.mean((hidden - y_t) ** 2))
            total = total + jnp.stack(w_losses).mean()
        return total / xs.shape[0]

    return seq


def test_batched_tgcn_matches_sequential(rng):
    dg, params, norm, xs, ys, fout = _setup(rng)
    mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                  ("data", "graph"))
    mesh1d = Mesh(np.asarray(jax.devices()[:4]), ("graph",))

    norms2 = shard_node_array(mesh2d, norm, dg)
    xs_b = shard_window_batch(mesh2d, xs, dg)
    ys_b = shard_window_batch(mesh2d, ys, dg)

    loss2 = jax.jit(
        lambda p: dist_tgcn_batched_loss(mesh2d, dg, p, norms2, xs_b, ys_b)
    )(params)

    seq = _sequential_oracle(mesh1d, dg, params, norm, xs, ys, fout)
    loss1 = seq(params)
    np.testing.assert_allclose(
        float(loss2), float(loss1), rtol=1e-5, atol=1e-6
    )


def test_batched_tgcn_grads_match_sequential(rng):
    """2-D-mesh training trains: the flat manual region over both axes
    (manual_shard_map bypass mode) sidesteps the jax 0.9 sdy
    nested-transpose bug, so jax.grad works end to end."""
    dg, params, norm, xs, ys, fout = _setup(rng)
    mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                  ("data", "graph"))
    mesh1d = Mesh(np.asarray(jax.devices()[:4]), ("graph",))
    norms2 = shard_node_array(mesh2d, norm, dg)
    xs_b = shard_window_batch(mesh2d, xs, dg)
    ys_b = shard_window_batch(mesh2d, ys, dg)

    loss2, grads2 = jax.jit(jax.value_and_grad(
        lambda p: dist_tgcn_batched_loss(mesh2d, dg, p, norms2, xs_b, ys_b)
    ))(params)

    seq = _sequential_oracle(mesh1d, dg, params, norm, xs, ys, fout)
    loss1, grads1 = jax.value_and_grad(seq)(params)
    np.testing.assert_allclose(
        float(loss2), float(loss1), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(jax.tree_util.tree_leaves(grads2),
                    jax.tree_util.tree_leaves(grads1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_batched_rejects_indivisible(rng):
    dg, params, norm, xs, ys, _ = _setup(rng)
    mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                  ("data", "graph"))
    norms2 = shard_node_array(mesh2d, norm, dg)
    xs_b3 = jnp.zeros((3,) + (xs.shape[1], dg.padded_nodes, xs.shape[3]))
    ys_b3 = jnp.zeros((3,) + (ys.shape[1], dg.padded_nodes, ys.shape[3]))
    with pytest.raises(ValueError, match="not divisible"):
        dist_tgcn_batched_loss(mesh2d, dg, params, norms2, xs_b3, ys_b3)
