"""PMA chunked store (graph/pma_store.py) vs a python set/dict oracle.

Randomized add/delete/weight-update replay, overflow-triggered rebuilds
(tiny chunks), and lax.scan compatibility.
"""

import numpy as np
import pytest


def _oracle_apply(state, adds, dels, weights=None):
    """state: dict (row, col) -> weight."""
    for i, (r, c) in enumerate(dels):
        state.pop((r, c), None)
    for i, (r, c) in enumerate(adds):
        state[(r, c)] = 1.0 if weights is None else float(weights[i])
    return state


def _store_dict(store):
    import jax.numpy as jnp

    rows, cols, w = store.flatten()
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    w = None if w is None else np.asarray(w)
    n = store.num_nodes
    out = {}
    for i in range(len(rows)):
        if rows[i] < n:
            key = (int(rows[i]), int(cols[i]))
            assert key not in out, f"duplicate live key {key}"
            out[key] = 1.0 if w is None else float(w[i])
    return out


def _check_sorted(store):
    rows, cols, _ = store.flatten()
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    n = store.num_nodes
    keys = rows.astype(np.int64) << 32 | cols.astype(np.int64)
    live = keys[rows < n]
    # Live keys in flat order must be strictly increasing (global order
    # across chunks, sorted within chunks, no duplicates).
    assert np.all(np.diff(live) > 0)


def _pad(pairs, cap, n):
    out = np.full((cap, 2), n, np.int32)
    for i, rc in enumerate(pairs):
        out[i] = rc
    return out


@pytest.mark.parametrize("weighted", [False, True])
def test_pma_random_replay_matches_oracle(rng, weighted):
    import jax.numpy as jnp

    from stgraph_tpu.graph.pma_store import apply_delta_pma, pma_init

    n = 64
    C, S = 16, 32
    store = pma_init(n, C, S, weighted=weighted)
    oracle = {}
    live = set()
    max_d = 12

    for step in range(30):
        n_add = int(rng.integers(0, max_d))
        n_del = int(rng.integers(0, min(max_d, max(len(live), 1))))
        dels = [
            live.pop() for _ in range(min(n_del, len(live)))
        ]
        adds = []
        attempts = 0
        while len(adds) < n_add and attempts < 100:
            cand = (int(rng.integers(0, n)), int(rng.integers(0, n)))
            attempts += 1
            if cand not in live and cand not in adds:
                adds.append(cand)
        # Occasionally re-add a deleted key in the same batch (weight
        # update path).
        if dels and rng.random() < 0.5:
            adds.append(dels[0])
        live.update(adds)
        aw = rng.standard_normal(len(adds)).astype(np.float32) if weighted else None

        ap = _pad(adds, max(len(adds), 1) + 2, n)
        dp = _pad(dels, max(len(dels), 1) + 2, n)
        aw_p = None
        if weighted:
            aw_p = np.zeros(ap.shape[0], np.float32)
            aw_p[: len(adds)] = aw
        store = apply_delta_pma(
            store,
            jnp.asarray(ap[:, 0]),
            jnp.asarray(ap[:, 1]),
            jnp.asarray(dp[:, 0]),
            jnp.asarray(dp[:, 1]),
            add_weights=None if aw_p is None else jnp.asarray(aw_p),
        )
        oracle = _oracle_apply(oracle, adds, dels, aw)
        got = _store_dict(store)
        assert set(got) == set(oracle), f"step {step}"
        if weighted:
            for k in oracle:
                assert got[k] == pytest.approx(oracle[k]), (step, k)
        assert int(store.num_edges) == len(oracle)
        _check_sorted(store)


def test_pma_overflow_rebuild(rng):
    """Tiny chunks force the redistribute branch repeatedly."""
    import jax.numpy as jnp

    from stgraph_tpu.graph.pma_store import apply_delta_pma, pma_init

    n = 32
    store = pma_init(n, num_chunks=4, chunk_size=8, weighted=False)
    oracle = {}
    edges = [(r, c) for r in range(5) for c in range(5)]
    rng.shuffle(edges)
    for i in range(0, len(edges), 4):
        batch = edges[i : i + 4]
        ap = _pad(batch, 4, n)
        dp = _pad([], 1, n)
        store = apply_delta_pma(
            store,
            jnp.asarray(ap[:, 0]),
            jnp.asarray(ap[:, 1]),
            jnp.asarray(dp[:, 0]),
            jnp.asarray(dp[:, 1]),
        )
        oracle = _oracle_apply(oracle, batch, [])
    assert _store_dict(store).keys() == oracle.keys()
    _check_sorted(store)


def test_pma_from_edges_and_scan(rng):
    """Host build + jitted scan replay; flat masked views stay consistent."""
    import jax
    import jax.numpy as jnp

    from stgraph_tpu.graph.pma_store import (
        apply_delta_pma,
        pma_from_edges,
    )

    n = 50
    base = [(int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(40)]
    base = list(dict.fromkeys(base))
    src = np.array([c for _, c in base])
    dst = np.array([r for r, _ in base])
    store = pma_from_edges(src, dst, n, num_chunks=8, chunk_size=16)
    oracle = {k: 1.0 for k in base}

    T, D = 5, 4
    adds = np.full((T, D, 2), n, np.int32)
    dels = np.full((T, D, 2), n, np.int32)
    live = set(base)
    per_step = []
    for t in range(T):
        a, d = [], []
        for _ in range(2):
            cand = (int(rng.integers(0, n)), int(rng.integers(0, n)))
            if cand not in live:
                a.append(cand)
                live.add(cand)
        if live:
            victim = live.pop()
            d.append(victim)
        adds[t, : len(a)] = a
        dels[t, : len(d)] = d
        per_step.append((a, d))

    @jax.jit
    def replay(store):
        def body(st, ad):
            a, dl = ad
            st = apply_delta_pma(st, a[:, 0], a[:, 1], dl[:, 0], dl[:, 1])
            rows_f, _, _ = st.flatten()
            deg = jax.ops.segment_sum(
                jnp.where(rows_f < n, 1, 0),
                jnp.minimum(rows_f, n - 1),
                num_segments=n,
            )
            return st, deg

        return jax.lax.scan(body, store, (jnp.asarray(adds), jnp.asarray(dels)))

    final, degs = replay(store)
    for a, d in per_step:
        oracle = _oracle_apply(oracle, a, d)
    got = _store_dict(final)
    assert got.keys() == oracle.keys()
    # The last scan step's degree histogram matches the oracle.
    deg_oracle = np.zeros(n, np.int64)
    for r, _ in oracle:
        deg_oracle[r] += 1
    np.testing.assert_array_equal(np.asarray(degs[-1]), deg_oracle)
