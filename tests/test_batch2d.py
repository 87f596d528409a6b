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


def test_batched_tgcn_masks_padding_rows(rng):
    """num_nodes % graph_axis != 0: the loss must ignore padding rows.

    n=61 on P=4 shards pads to 64 rows. The padded target rows are filled
    with GARBAGE (7.0) — if the real-row mask in dist_tgcn_batched_loss
    were removed, the (hidden - 7)^2 terms on the 3 padding rows would
    shift the loss far outside tolerance (round-3 advisor scenario)."""
    n, e, fin, fout, b, t = 61, 256, 6, 5, 2, 3
    p = 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, p)
    assert dg.padded_nodes > n  # the scenario under test
    params = dist_tgcn_params(jax.random.key(0), fin, fout)
    norm = jnp.asarray((rng.random((n, 1)) + 0.5).astype(np.float32))
    xs = jnp.asarray(rng.standard_normal((b, t, n, fin)).astype(np.float32))
    ys = jnp.asarray(rng.standard_normal((b, t, n, fout)).astype(np.float32))

    mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                  ("data", "graph"))
    mesh1d = Mesh(np.asarray(jax.devices()[:4]), ("graph",))
    norms2 = shard_node_array(mesh2d, norm, dg)
    xs_b = shard_window_batch(mesh2d, xs, dg)
    # Pad targets with garbage instead of zeros: padding rows are
    # contractually ignored whatever they hold.
    pad = dg.padded_nodes - n
    ys_pad = jnp.concatenate(
        [ys, jnp.full((b, t, pad, fout), 7.0, jnp.float32)], axis=2
    )
    ys_b = jax.device_put(
        ys_pad, NamedSharding(mesh2d, P("data", None, "graph", None))
    )

    loss2 = jax.jit(
        lambda pp: dist_tgcn_batched_loss(mesh2d, dg, pp, norms2, xs_b, ys_b)
    )(params)

    # Oracle: strictly sequential windows, loss over REAL rows only.
    norms1 = shard_node_array(mesh1d, norm, dg)

    def seq(pp):
        total = 0.0
        for bb in range(b):
            hidden = jnp.zeros((dg.padded_nodes, fout), jnp.float32)
            w_losses = []
            for tt in range(t):
                x_t = shard_node_array(mesh1d, xs[bb, tt], dg)
                hidden = dist_tgcn_cell(mesh1d, dg, pp, x_t, norms1, hidden)
                err = (hidden[:n] - ys[bb, tt]) ** 2
                w_losses.append(err.sum() / (n * fout))
            total = total + jnp.stack(w_losses).mean()
        return total / b

    loss1 = seq(params)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5,
                               atol=1e-6)
    # Sanity: garbage on padding rows WOULD move the loss if unmasked.
    unmasked_extra = (7.0**2) * pad * b * t
    assert unmasked_extra > 100 * float(loss1)
