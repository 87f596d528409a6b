"""Dynamic-graph update cost at wiki-talk scale (2M-edge capacity).

The reference's DTDG sweeps run PCSR/GPMA on sx-mathoverflow and
wiki-talk-temporal (~2M edges) with slide-size variations
(``benchmarking/dynamic-bench.sh``). This microbench mirrors that regime
for the TPU-native ``apply_delta``: a 2M-edge-capacity store replaying
per-timestep deltas of ``--slide`` edges inside a jitted ``lax.scan``,
against the round-1 algorithm (three full-capacity stable argsorts) as the
baseline. Prints per-timestep structure-update cost for both.

Usage: python benchmarking/micro/delta_scale_bench.py [--cap 2000000]
"""

from __future__ import annotations

import argparse
import sys
import time

try:  # installed package (pip install -e .) or raw-checkout fallback
    import stgraph_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, __file__.rsplit("/", 3)[0])

import numpy as np


def _legacy_apply_delta(store, add_rows, add_cols, del_rows, del_cols):
    """Round-1 algorithm: three full-capacity lexicographic sorts."""
    import jax.numpy as jnp

    from stgraph_tpu.graph.delta_graph import EdgeStore

    n = store.num_nodes

    def lexsort_rc(rows, cols):
        o1 = jnp.argsort(cols, stable=True)
        return o1[jnp.argsort(rows[o1], stable=True)]

    rows = jnp.concatenate([store.rows, add_rows, del_rows])
    cols = jnp.concatenate([store.cols, add_cols, del_cols])
    tomb = jnp.concatenate(
        [
            jnp.zeros(store.rows.shape[0] + add_rows.shape[0], jnp.bool_),
            jnp.ones(del_rows.shape[0], jnp.bool_),
        ]
    )
    order = lexsort_rc(rows, cols)
    rows, cols, tomb = rows[order], cols[order], tomb[order]
    nxt_tomb = jnp.concatenate([tomb[1:], jnp.zeros((1,), jnp.bool_)])
    same = jnp.concatenate(
        [(rows[1:] == rows[:-1]) & (cols[1:] == cols[:-1]),
         jnp.zeros((1,), jnp.bool_)]
    )
    dead = tomb | (nxt_tomb & same & ~tomb)
    rows = jnp.where(dead, n, rows)
    cols = jnp.where(dead, n, cols)
    order = lexsort_rc(rows, cols)
    capacity = store.rows.shape[0]
    rows, cols = rows[order][:capacity], cols[order][:capacity]
    return EdgeStore(
        rows=rows, cols=cols,
        num_edges=jnp.sum((rows < n).astype(jnp.int32)),
        num_nodes=n,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=2_000_000)
    ap.add_argument("--nodes", type=int, default=1_100_000)
    ap.add_argument("--slide", type=int, default=10_000)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--chunk-size", type=int, default=1024)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--skip-legacy", action="store_true")
    ap.add_argument("--only-dyn", action="store_true",
                    help="skip the update-only sections (measured r2)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from benchmarking.micro._timing import readback_rtt
    from stgraph_tpu.graph.delta_graph import EdgeStore, apply_delta

    n, cap, d, t_steps = args.nodes, args.cap, args.slide, args.steps
    rng = np.random.default_rng(0)

    # Initial store: cap-8d edges, sorted.
    e0 = cap - 8 * d
    keys = np.unique(
        rng.integers(0, n, e0 * 2).astype(np.int64) * n
        + rng.integers(0, n, e0 * 2)
    )[:e0]
    rows0 = np.full(cap, n, np.int32)
    cols0 = np.full(cap, n, np.int32)
    rows0[:e0] = (keys // n).astype(np.int32)
    cols0[:e0] = (keys % n).astype(np.int32)

    # Per-step deltas: delete `d` existing edges, add `d` fresh ones.
    adds = np.full((t_steps, d, 2), n, np.int32)
    dels = np.full((t_steps, d, 2), n, np.int32)
    for t in range(t_steps):
        sel = rng.choice(e0, d, replace=False)
        dels[t, :, 0] = rows0[sel]
        dels[t, :, 1] = cols0[sel]
        # fresh adds (won't collide with the uniform sample, whp)
        adds[t, :, 0] = rng.integers(0, n, d)
        adds[t, :, 1] = rng.integers(0, n, d)
    # NOTE: this bench measures structure-update COST; the randomized adds
    # may rarely collide with existing edges — irrelevant for timing.

    def bench(fn, label):
        @jax.jit
        def run(rows, cols, ne):
            def body(carry, xs):
                r, c, k = carry
                a, dl = xs
                s = fn(
                    EdgeStore(r, c, k, n),
                    a[:, 0], a[:, 1], dl[:, 0], dl[:, 1],
                )
                return (s.rows, s.cols, s.num_edges), s.num_edges

            (_, _, ne2), counts = jax.lax.scan(
                body, (rows, cols, ne), (jnp.asarray(adds), jnp.asarray(dels))
            )
            return ne2

        r0 = jnp.asarray(rows0)
        c0 = jnp.asarray(cols0)
        ne0 = jnp.asarray(np.int32(e0))
        t0 = time.perf_counter()
        v = int(run(r0, c0, ne0))
        print(f"{label}: compile+run1 {time.perf_counter()-t0:.1f}s", flush=True)
        rtt = readback_rtt()
        t0 = time.perf_counter()
        v = int(run(r0, c0, ne0))
        dt = (time.perf_counter() - t0 - rtt) / t_steps
        print(
            f"{label}: {dt*1e3:.2f} ms/timestep "
            f"(cap={cap}, slide={d}, final edges={v})",
            flush=True,
        )
        return dt

    if not args.only_dyn:
        dt_new = bench(apply_delta, "merge-based apply_delta   ")

    # PMA chunked store: cost O(min(d, C)·S) — sublinear in capacity once
    # the slide is small relative to the chunk count (the PCSR regime).
    from stgraph_tpu.graph.pma_store import apply_delta_pma, pma_from_edges

    S = args.chunk_size
    C = (cap + S - 1) // S * 2  # ~50% density
    store0 = pma_from_edges(
        cols0[:e0], rows0[:e0], n, num_chunks=C, chunk_size=S
    )

    @jax.jit
    def run_pma(st):
        def body(st, xs):
            a, dl = xs
            st = apply_delta_pma(st, a[:, 0], a[:, 1], dl[:, 0], dl[:, 1])
            return st, st.num_edges

        st, _ = jax.lax.scan(
            body, st, (jnp.asarray(adds), jnp.asarray(dels))
        )
        return st.num_edges

    if not args.only_dyn:
        t0 = time.perf_counter()
        v = int(run_pma(store0))
        print(f"pma chunked (S={S})       : compile+run1 "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        rtt = readback_rtt()
        t0 = time.perf_counter()
        v = int(run_pma(store0))
        dt_pma = (time.perf_counter() - t0 - rtt) / t_steps
        print(
            f"pma chunked (S={S})       : {dt_pma*1e3:.2f} ms/timestep "
            f"(C={C}, affected<= {min(2*d, C)}, final edges={v})",
            flush=True,
        )

        if not args.skip_legacy:
            dt_old = bench(_legacy_apply_delta, "legacy 3x-argsort baseline")
            print(f"speedup merge vs legacy: {dt_old/dt_new:.1f}x", flush=True)
        print(f"speedup pma vs merge: {dt_new/dt_pma:.1f}x", flush=True)

    # LAZY store (round 4, graph/lazy_store.py): tombstone + tail-log
    # O(delta) updates — no capacity-wide pass per step; compaction
    # amortized via lax.cond. This is the flagship update path.
    from stgraph_tpu.ops.dyn_spmm import (
        apply_delta_lazy_pair,
        lazy_pair_from_edges,
        lazy_spmm,
    )

    lazy0 = lazy_pair_from_edges(
        cols0[:e0], rows0[:e0], n, capacity=cap, tail_capacity=16 * d
    )

    # Delta batches store (row=dst, col=src); the pair APIs take
    # (src, dst), so operands are swapped: dl[:, 1] is the source key.
    # (Advisor round 4: passing dl[:, 0] as del_src made every delete a
    # silent no-op — the timing replayed a delete-never-hits workload.)
    @jax.jit
    def run_lazy_updates(pair):
        def body(pair, xs):
            a, dl = xs
            pair = apply_delta_lazy_pair(
                pair, a[:, 1], a[:, 0], dl[:, 1], dl[:, 0]
            )
            return pair, pair.fwd.num_edges

        _, counts = jax.lax.scan(
            body, pair, (jnp.asarray(adds), jnp.asarray(dels))
        )
        return counts[-1]

    t0 = time.perf_counter()
    v = int(run_lazy_updates(lazy0))
    print(f"lazy tombstone+log       : compile+run1 "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    rtt = readback_rtt()
    t0 = time.perf_counter()
    v = int(run_lazy_updates(lazy0))
    dt_lazy = (time.perf_counter() - t0 - rtt) / t_steps
    print(
        f"lazy tombstone+log       : {dt_lazy*1e3:.2f} ms/timestep "
        f"({2*d/max(dt_lazy,1e-9)/1e3:.0f}k updates/s, final edges={v})",
        flush=True,
    )

    # Full dynamic STEP at wiki-talk scale: delta replay on the dual PMA
    # stores + row-id-kernel aggregation (ops/dyn_spmm), forward and
    # forward+backward — the "dynamic graph at kernel speed" capability
    # (VERDICT r2 item 3). Compare edges/s against the static SpMM rate.
    from stgraph_tpu.ops.dyn_spmm import (
        apply_delta_pair,
        pma_pair_from_edges,
        pma_spmm,
    )

    f_dim = args.feat
    pair0 = pma_pair_from_edges(
        cols0[:e0], rows0[:e0], n, num_chunks=C, chunk_size=S
    )
    feats = jnp.asarray(
        rng.standard_normal((n, f_dim)).astype(np.float32)
    )

    @jax.jit
    def run_dyn_fwd(pair, feats):
        def body(pair, xs):
            a, dl = xs
            # Same (src, dst) argument order as the lazy pair above.
            pair = apply_delta_pair(
                pair, a[:, 1], a[:, 0], dl[:, 1], dl[:, 0]
            )
            out = pma_spmm(pair, feats)
            return pair, jnp.sum(out, dtype=jnp.float32)

        _, sums = jax.lax.scan(
            body, pair, (jnp.asarray(adds), jnp.asarray(dels))
        )
        return sums[-1]

    @jax.jit
    def run_dyn_bwd(pair, feats):
        def loss(feats):
            return run_dyn_fwd(pair, feats)

        return jax.grad(loss)(feats)[0, 0]

    for label, fn in (("fwd", run_dyn_fwd), ("fwd+bwd", run_dyn_bwd)):
        t0 = time.perf_counter()
        v = float(fn(pair0, feats))
        print(
            f"dyn step {label} (F={f_dim}): compile+run1 "
            f"{time.perf_counter()-t0:.1f}s",
            flush=True,
        )
        rtt = readback_rtt()
        t0 = time.perf_counter()
        v = float(fn(pair0, feats))
        dt = (time.perf_counter() - t0 - rtt) / t_steps
        print(
            f"dyn step {label} (F={f_dim}): {dt*1e3:.2f} ms/timestep -> "
            f"{e0/dt/1e6:.0f}M edges/s (update + pma_spmm)",
            flush=True,
        )


if __name__ == "__main__":
    main()
