"""Lazy dynamic store: randomized delta-replay oracles.

The store's contract mirrors ``delta_graph.apply_delta`` (sentinel-padded
batches, deletes name live edges, adds are new or paired with a same-key
delete). The oracle is a Python dict of live edges; aggregation is
checked against a dense numpy SpMM after every step, across multiple
compaction boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stgraph_tpu.graph.lazy_store import (
    LazyStore,
    apply_delta_lazy,
    compact,
    lazy_from_edges,
)
from stgraph_tpu.ops.dyn_spmm import (
    apply_delta_lazy_pair,
    lazy_norm,
    lazy_pair_from_edges,
    lazy_spmm,
)


N = 40
CAP = 256
TCAP = 64
D = 8  # per-step adds and deletes


def _random_graph(rng, e=120):
    keys = rng.choice(N * N, size=e, replace=False)
    src, dst = keys // N, keys % N
    return src.astype(np.int64), dst.astype(np.int64)


def _steps(rng, live, n_steps):
    """Generate (adds, dels) batches; mutates the live-set oracle copy."""
    batches = []
    for _ in range(n_steps):
        live_list = sorted(live)
        k_del = min(D, len(live_list))
        del_keys = [
            live_list[i]
            for i in rng.choice(len(live_list), k_del, replace=False)
        ]
        for k in del_keys:
            live.discard(k)
        adds = []
        while len(adds) < D:
            k = int(rng.integers(0, N * N))
            if k not in live and k not in adds:
                adds.append(k)
        for k in adds:
            live.add(k)
        a = np.full((D, 2), N, np.int64)
        dl = np.full((D, 2), N, np.int64)
        for i, k in enumerate(adds):
            a[i] = (k // N, k % N)
        for i, k in enumerate(del_keys):
            dl[i] = (k // N, k % N)
        batches.append((a, dl))
    return batches


def _dense(live):
    m = np.zeros((N, N), np.float32)  # m[dst, src]
    for k in live:
        m[k % N, k // N] = 1.0
    return m


def test_lazy_updates_match_oracle(rng):
    src, dst = _random_graph(rng)
    live = {int(s) * N + int(d) for s, d in zip(src, dst)}
    store = lazy_from_edges(src, dst, N, CAP, TCAP)
    x = rng.standard_normal((N, 8)).astype(np.float32)

    oracle_live = set(live)
    batches = _steps(rng, oracle_live, n_steps=12)  # crosses compaction
    # Replay while checking after each step.
    check_live = set(live)
    for a, dl in batches:
        for i in range(D):
            if dl[i, 0] < N:
                check_live.discard(int(dl[i, 0]) * N + int(dl[i, 1]))
        store = apply_delta_lazy(
            store,
            jnp.asarray(a[:, 1]), jnp.asarray(a[:, 0]),  # row = dst
            jnp.asarray(dl[:, 1]), jnp.asarray(dl[:, 0]),
        )
        for i in range(D):
            if a[i, 0] < N:
                check_live.add(int(a[i, 0]) * N + int(a[i, 1]))
        assert int(store.num_edges) == len(check_live)
        pair = type("P", (), {})()  # check aggregation via dense oracle
        m = np.zeros((N, N), np.float32)
        for k in check_live:
            m[k % N, k // N] = 1.0
        # main + tail aggregation by hand
        from stgraph_tpu.ops.dyn_spmm import _lazy_one_side

        out = np.asarray(
            _lazy_one_side(store, jnp.asarray(x), N, False)
        )
        np.testing.assert_allclose(out, m @ x, rtol=1e-5, atol=1e-5)


def test_compact_preserves_graph(rng):
    src, dst = _random_graph(rng)
    store = lazy_from_edges(src, dst, N, CAP, TCAP)
    live = {int(s) * N + int(d) for s, d in zip(src, dst)}
    batches = _steps(rng, set(live), n_steps=3)
    check = set(live)
    for a, dl in batches:
        for i in range(D):
            if dl[i, 0] < N:
                check.discard(int(dl[i, 0]) * N + int(dl[i, 1]))
            if a[i, 0] < N:
                check.add(int(a[i, 0]) * N + int(a[i, 1]))
        store = apply_delta_lazy(
            store,
            jnp.asarray(a[:, 1]), jnp.asarray(a[:, 0]),
            jnp.asarray(dl[:, 1]), jnp.asarray(dl[:, 0]),
        )
    c = compact(store)
    assert int(c.tail_count) == 0 and int(c.anti_count) == 0
    assert int(c.num_edges) == len(check)
    rows = np.asarray(c.rows)
    cols = np.asarray(c.cols)
    w = np.asarray(c.w)
    got = {
        int(cols[i]) * N + int(rows[i])
        for i in range(CAP)
        if rows[i] < N and w[i] > 0
    }
    assert got == check


def test_lazy_pair_spmm_grads_in_scan(rng):
    """The DTDG shape: mutate the pair inside lax.scan, aggregate each
    step, differentiate w.r.t. features; oracle recomputes densely."""
    src, dst = _random_graph(rng)
    pair = lazy_pair_from_edges(src, dst, N, CAP, TCAP)
    live0 = {int(s) * N + int(d) for s, d in zip(src, dst)}
    batches = _steps(rng, set(live0), n_steps=6)
    adds = jnp.asarray(np.stack([a for a, _ in batches]))
    dels = jnp.asarray(np.stack([d for _, d in batches]))
    x = jnp.asarray(rng.standard_normal((N, 8)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((N, 8)).astype(np.float32))

    @jax.jit
    def loss(x):
        def body(pair, xs):
            a, dl = xs
            pair = apply_delta_lazy_pair(
                pair, a[:, 0], a[:, 1], dl[:, 0], dl[:, 1]
            )
            out = lazy_spmm(pair, x)
            return pair, jnp.vdot(out, r)

        _, vals = jax.lax.scan(body, pair, (adds, dels))
        return vals.sum()

    got, grad = jax.value_and_grad(lambda x: loss(x))(x)

    # Dense oracle.
    live = set(live0)
    want = 0.0
    grad_want = np.zeros((N, 8), np.float32)
    for a, dl in batches:
        for i in range(D):
            if dl[i][0] < N:
                live.discard(int(dl[i][0]) * N + int(dl[i][1]))
            if a[i][0] < N:
                live.add(int(a[i][0]) * N + int(a[i][1]))
        m = _dense(live)
        want += float(np.vdot(m @ np.asarray(x), np.asarray(r)))
        grad_want += m.T @ np.asarray(r)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(grad), grad_want, rtol=1e-4,
                               atol=1e-4)


def test_lazy_norm_matches_degree(rng):
    src, dst = _random_graph(rng)
    pair = lazy_pair_from_edges(src, dst, N, CAP, TCAP)
    live = {int(s) * N + int(d) for s, d in zip(src, dst)}
    batches = _steps(rng, set(live), n_steps=4)
    check = set(live)
    for a, dl in batches:
        for i in range(D):
            if dl[i, 0] < N:
                check.discard(int(dl[i, 0]) * N + int(dl[i, 1]))
            if a[i, 0] < N:
                check.add(int(a[i, 0]) * N + int(a[i, 1]))
        pair = apply_delta_lazy_pair(
            pair,
            jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]),
            jnp.asarray(dl[:, 0]), jnp.asarray(dl[:, 1]),
        )
    deg = np.zeros(N)
    for k in check:
        deg[k % N] += 1.0
    want = np.where(deg > 0, np.maximum(deg, 1.0) ** -0.5, 1.0)
    got = np.asarray(lazy_norm(pair))[:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_weight_update_via_del_add(rng):
    src = np.array([0, 1, 2], np.int64)
    dst = np.array([1, 2, 0], np.int64)
    store = lazy_from_edges(
        src, dst, N, CAP, TCAP, weights=np.array([1.0, 2.0, 3.0])
    )
    # weight update on (0 -> 1): delete + re-add with the new weight
    store = apply_delta_lazy(
        store,
        jnp.asarray([1]), jnp.asarray([0]),  # add row=1 col=0
        jnp.asarray([1]), jnp.asarray([0]),  # del row=1 col=0
        add_weights=jnp.asarray([5.0]),
    )
    assert int(store.num_edges) == 3
    x = np.eye(N, 8, dtype=np.float32)
    from stgraph_tpu.ops.dyn_spmm import _lazy_one_side

    out = np.asarray(_lazy_one_side(store, jnp.asarray(x), N, False))
    assert out[1, 0] == pytest.approx(5.0)  # new weight in effect


def test_weighted_tail_resident_delete(rng):
    """Weighted stores keep the in-place tail-kill path (a delete's
    cancelled weight is unknowable without the lookup): add a weighted
    edge, delete it before compaction, verify aggregation and counts."""
    src = np.array([0, 1], np.int64)
    dst = np.array([1, 2], np.int64)
    store = lazy_from_edges(
        src, dst, N, CAP, TCAP, weights=np.array([1.0, 2.0])
    )
    # Add (5 -> 6) w=7, then delete it while still tail-resident.
    store = apply_delta_lazy(
        store, jnp.asarray([6]), jnp.asarray([5]),
        jnp.full((1,), N), jnp.full((1,), N),
        add_weights=jnp.asarray([7.0]),
    )
    assert int(store.num_edges) == 3
    store = apply_delta_lazy(
        store, jnp.full((1,), N), jnp.full((1,), N),
        jnp.asarray([6]), jnp.asarray([5]),
        add_weights=jnp.asarray([1.0]),
    )
    assert int(store.num_edges) == 2
    from stgraph_tpu.ops.dyn_spmm import _lazy_one_side

    x = np.eye(N, 8, dtype=np.float32)
    out = np.asarray(_lazy_one_side(store, jnp.asarray(x), N, False))
    assert out[6].sum() == pytest.approx(0.0)  # killed in the tail
    assert out[1, 0] == pytest.approx(1.0)
    c = compact(store)
    assert int(c.num_edges) == 2


def test_anti_entry_depth(rng):
    """Unweighted add/delete/re-add churn on ONE key inside the log
    window: tail holds (+1, -1, +1, -1, ...) for the same key; both the
    running aggregation and the compaction net must stay exact."""
    src, dst = _random_graph(rng, e=16)
    store = lazy_from_edges(src, dst, N, CAP, TCAP)
    key_r, key_c = 7, 9  # not in the random graph with overwhelming odds
    live = {int(s) * N + int(d) for s, d in zip(src, dst)}
    assert 9 * N + 7 not in live
    x = np.eye(N, dtype=np.float32)
    from stgraph_tpu.ops.dyn_spmm import _lazy_one_side

    e1 = jnp.full((1,), N, jnp.int32)
    for i in range(4):  # add, del, add, del
        if i % 2 == 0:
            store = apply_delta_lazy(
                store, jnp.asarray([key_r]), jnp.asarray([key_c]), e1, e1
            )
            expect = 17
        else:
            store = apply_delta_lazy(
                store, e1, e1, jnp.asarray([key_r]), jnp.asarray([key_c])
            )
            expect = 16
        assert int(store.num_edges) == expect
        out = np.asarray(_lazy_one_side(store, jnp.asarray(x), N, False))
        assert out[key_r, key_c] == pytest.approx(float(i % 2 == 0))
    c = compact(store)
    assert int(c.num_edges) == 16
    rows, cols, w = np.asarray(c.rows), np.asarray(c.cols), np.asarray(c.w)
    present = any(
        rows[i] == key_r and cols[i] == key_c and w[i] > 0
        for i in range(CAP)
    )
    assert not present


def test_oversized_batch_raises(rng):
    """Batches larger than tail_capacity must fail loudly at trace time
    (advisor round 4: silent truncation of pending deletes)."""
    src, dst = _random_graph(rng)
    store = lazy_from_edges(src, dst, N, CAP, TCAP)
    big = jnp.full((TCAP + 1,), N, jnp.int32)
    small = jnp.full((1,), N, jnp.int32)
    with pytest.raises(ValueError, match="tail_capacity"):
        apply_delta_lazy(store, big, big, small, small)
    with pytest.raises(ValueError, match="tail_capacity"):
        apply_delta_lazy(store, small, small, big, big)


def test_pair_deletes_actually_hit(rng):
    """Deletes through the PAIR API must reduce num_edges on BOTH stores —
    the round-4 advisor found a bench passing reversed (dst, src) keys so
    every delete silently missed; this pins the src/dst argument order."""
    src, dst = _random_graph(rng, e=64)
    pair = lazy_pair_from_edges(src, dst, N, CAP, TCAP)
    k = 8
    del_src = jnp.asarray(src[:k], jnp.int32)
    del_dst = jnp.asarray(dst[:k], jnp.int32)
    empty = jnp.full((k,), N, jnp.int32)
    out = apply_delta_lazy_pair(pair, empty, empty, del_src, del_dst)
    assert int(out.fwd.num_edges) == 64 - k
    assert int(out.bwd.num_edges) == 64 - k
    # Correct keys tombstone the MAIN store (exact-key match) and survive
    # compaction; reversed keys (the bug shape) name absent edges — an
    # out-of-contract input the anti-entry design absorbs into the anti
    # log, which compaction drops (net < 0 runs) while recomputing
    # num_edges from the real live slots. Order sensitivity is pinned by
    # the POST-COMPACTION counts: correct keys stay deleted, reversed
    # keys heal back.
    assert int(compact(out.fwd).num_edges) == 64 - k
    rev = apply_delta_lazy_pair(pair, empty, empty, del_dst, del_src)
    fwd_hits = 64 - int(compact(rev.fwd).num_edges)
    assert fwd_hits <= 2  # only accidental symmetric edges may hit
