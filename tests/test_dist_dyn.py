"""Distributed dynamic graphs: shard-local delta replay + aggregation on
the virtual 8-device CPU mesh, vs single-store snapshot oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stgraph_tpu.graph.delta_graph import EdgeStore
from stgraph_tpu.parallel.dyn import (
    dist_dyn_apply_delta,
    dist_dyn_degree,
    dist_dyn_spmm,
    partition_dynamic,
    shard_dyn_arrays,
)


@pytest.fixture
def mesh():
    return Mesh(np.asarray(jax.devices()[:4]), ("graph",))


def _stage(deltas, n):
    """Pad per-timestep (adds, dels) python lists into staged arrays."""
    pad_a = max(max(len(a) for a, _ in deltas), 1)
    pad_d = max(max(len(d) for _, d in deltas), 1)

    def pad(lst, k):
        arr = np.full((k, 2), n, np.int32)
        for i, sd in enumerate(lst):
            arr[i] = sd
        return arr

    add = np.stack([pad(a, pad_a) for a, _ in deltas])
    dele = np.stack([pad(d, pad_d) for _, d in deltas])
    return add, dele


def _random_dtdg(rng, n, t_steps=4, adds_per_t=60, dels_per_t=20):
    cur = set()
    deltas, snapshots = [], []
    for _ in range(t_steps):
        adds = set()
        while len(adds) < adds_per_t:
            adds.add((int(rng.integers(0, n)), int(rng.integers(0, n))))
        adds -= cur
        dels = set(list(cur)[:dels_per_t])
        cur = (cur | adds) - dels
        deltas.append((sorted(adds), sorted(dels)))
        snapshots.append(sorted(cur))
    return deltas, snapshots


def _oracle(snap, h, n):
    out = np.zeros((n, h.shape[1]), np.float32)
    for s, d in snap:
        out[d] += h[s]
    return out


def test_dist_dyn_scan_matches_snapshots(mesh):
    rng = np.random.default_rng(0)
    n = 4 * 50  # divisible by shards for a clean ns
    deltas, snapshots = _random_dtdg(rng, n)
    staged_add, staged_del = _stage(deltas, n)
    empty = EdgeStore(
        rows=np.full(8, n, np.int32),
        cols=np.full(8, n, np.int32),
        num_edges=np.int32(0),
        num_nodes=n,
    )
    ddg = partition_dynamic(empty, staged_add, staged_del, None, 4)
    carry0, xs = shard_dyn_arrays(mesh, ddg)
    h = jax.device_put(
        jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32)),
        NamedSharding(mesh, P("graph")),
    )

    @jax.jit
    def run(carry0, add_steps, del_steps, h):
        def body(carry, xs_t):
            rows, cols, ne = carry
            add, dele = xs_t
            rows, cols, _, ne = dist_dyn_apply_delta(
                mesh, ddg, rows, cols, None, ne, add, dele, None
            )
            out = dist_dyn_spmm(mesh, ddg, rows, cols, None, h)
            deg = dist_dyn_degree(mesh, ddg, rows)
            return (rows, cols, ne), (out, deg)

        (rows, cols, _, ne) = carry0
        _, (outs, degs) = jax.lax.scan(
            body, (rows, cols, ne), (add_steps, del_steps)
        )
        return outs, degs

    outs, degs = run(carry0, xs[0], xs[1], h)
    h_np = np.asarray(h)
    for t, snap in enumerate(snapshots):
        ref = _oracle(snap, h_np, n)
        np.testing.assert_allclose(
            np.asarray(outs[t])[:n], ref, rtol=2e-5, atol=2e-5,
            err_msg=f"t={t}",
        )
        ref_deg = np.zeros(n, np.float32)
        for _, d in snap:
            ref_deg[d] += 1
        np.testing.assert_allclose(
            np.asarray(degs[t])[:n, 0], ref_deg, rtol=1e-6, atol=1e-6
        )


def test_dist_dyn_gradients_flow(mesh):
    """d loss / d features through the dynamic scan is finite and matches
    the single-device jnp formulation."""
    rng = np.random.default_rng(1)
    n = 4 * 32
    deltas, snapshots = _random_dtdg(rng, n, t_steps=3, adds_per_t=40)
    staged_add, staged_del = _stage(deltas, n)
    empty = EdgeStore(
        rows=np.full(8, n, np.int32),
        cols=np.full(8, n, np.int32),
        num_edges=np.int32(0),
        num_nodes=n,
    )
    ddg = partition_dynamic(empty, staged_add, staged_del, None, 4)
    carry0, xs = shard_dyn_arrays(mesh, ddg)
    h0 = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

    def loss_dist(h):
        def body(carry, xs_t):
            rows, cols, ne = carry
            add, dele = xs_t
            rows, cols, _, ne = dist_dyn_apply_delta(
                mesh, ddg, rows, cols, None, ne, add, dele, None
            )
            out = dist_dyn_spmm(mesh, ddg, rows, cols, None, h)
            return (rows, cols, ne), jnp.sum(out**2)

        (rows, cols, _, ne) = carry0
        _, losses = jax.lax.scan(
            body, (rows, cols, ne), (xs[0], xs[1])
        )
        return losses.sum()

    g = jax.jit(jax.grad(loss_dist))(
        jax.device_put(h0, NamedSharding(mesh, P("graph")))
    )

    # Oracle gradient from the snapshot formulation.
    def loss_ref(h):
        total = 0.0
        for snap in snapshots:
            if snap:
                s = jnp.asarray([e[0] for e in snap])
                d = jnp.asarray([e[1] for e in snap])
                out = jax.ops.segment_sum(h[s], d, num_segments=n)
            else:
                out = jnp.zeros_like(h)
            total = total + jnp.sum(out**2)
        return total

    g_ref = jax.grad(loss_ref)(h0)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=2e-4, atol=2e-4
    )


def test_partition_dynamic_weighted(mesh):
    """Weighted stores route and aggregate correctly."""
    rng = np.random.default_rng(2)
    n = 4 * 20
    src = rng.integers(0, n, 100)
    dst = rng.integers(0, n, 100)
    keys = dst.astype(np.int64) * n + src
    _, idx = np.unique(keys, return_index=True)
    src, dst = src[idx], dst[idx]
    w = rng.random(len(src)).astype(np.float32) + 0.5
    order = np.lexsort((src, dst))
    cap = 128
    rows0 = np.full(cap, n, np.int32)
    cols0 = np.full(cap, n, np.int32)
    w0 = np.zeros(cap, np.float32)
    rows0[: len(src)] = dst[order]
    cols0[: len(src)] = src[order]
    w0[: len(src)] = w[order]
    store = EdgeStore(
        rows=rows0, cols=cols0, num_edges=np.int32(len(src)),
        num_nodes=n, weights=w0,
    )
    staged_add = np.full((1, 1, 2), n, np.int32)
    staged_del = np.full((1, 1, 2), n, np.int32)
    ddg = partition_dynamic(
        store, staged_add, staged_del, np.zeros((1, 1), np.float32), 4
    )
    carry0, _ = shard_dyn_arrays(mesh, ddg)
    rows, cols, ws, ne = carry0
    h = jax.device_put(
        jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32)),
        NamedSharding(mesh, P("graph")),
    )
    out = jax.jit(
        lambda r, c, w_, h: dist_dyn_spmm(mesh, ddg, r, c, w_, h)
    )(rows, cols, ws, h)
    ref = np.zeros((n, 8), np.float32)
    np.add.at(ref, dst, w[:, None] * np.asarray(h)[src])
    np.testing.assert_allclose(
        np.asarray(out)[:n], ref, rtol=2e-5, atol=2e-5
    )


def test_dist_dyn_kernel_path_interpret(mesh):
    """The per-shard row-id Pallas kernel (use_kernel=True, interpreter)
    matches the jnp path and its VJP, inside the same scan."""
    rng = np.random.default_rng(3)
    n = 4 * 32
    deltas, snapshots = _random_dtdg(rng, n, t_steps=3, adds_per_t=40)
    staged_add, staged_del = _stage(deltas, n)
    empty = EdgeStore(
        rows=np.full(8, n, np.int32),
        cols=np.full(8, n, np.int32),
        num_edges=np.int32(0),
        num_nodes=n,
    )
    ddg = partition_dynamic(empty, staged_add, staged_del, None, 4)
    carry0, xs = shard_dyn_arrays(mesh, ddg)
    h0 = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    h = jax.device_put(h0, NamedSharding(mesh, P("graph")))

    def run(h, use_kernel):
        def body(carry, xs_t):
            rows, cols, ne = carry
            add, dele = xs_t
            rows, cols, _, ne = dist_dyn_apply_delta(
                mesh, ddg, rows, cols, None, ne, add, dele, None
            )
            out = dist_dyn_spmm(
                mesh, ddg, rows, cols, None, h,
                use_kernel=use_kernel, interpret=use_kernel,
            )
            deg = dist_dyn_degree(
                mesh, ddg, rows, use_kernel=use_kernel, interpret=use_kernel
            )
            return (rows, cols, ne), (out, deg, jnp.sum(out**2))

        (rows, cols, _, ne) = carry0
        _, (outs, degs, losses) = jax.lax.scan(
            body, (rows, cols, ne), (xs[0], xs[1])
        )
        return outs, degs, losses.sum()

    outs_k, degs_k, _ = jax.jit(lambda h: run(h, True))(h)
    outs_j, degs_j, _ = jax.jit(lambda h: run(h, False))(h)
    np.testing.assert_allclose(
        np.asarray(outs_k), np.asarray(outs_j), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(degs_k), np.asarray(degs_j), rtol=1e-6, atol=1e-6
    )

    g_k = jax.jit(jax.grad(lambda h: run(h, True)[2]))(h)
    g_j = jax.jit(jax.grad(lambda h: run(h, False)[2]))(h)
    np.testing.assert_allclose(
        np.asarray(g_k), np.asarray(g_j), rtol=2e-4, atol=2e-4
    )
