"""Where do the lazy store's per-step 69 ms go? (round-4 verdict ask #2)

Decomposes ``apply_delta_lazy_pair`` at the bench.py dyn shape (cap 2.2M,
N=1.1M, slide 10k adds + 10k dels, dual stores) into separately-jitted
measurements that must explain the total:

  * ``pair_step``      — the full per-step update (bench.py's metric);
  * ``pair_nocompact`` — the same with ``tail_capacity`` raised so NO
    compaction fires inside the window: the pure per-step cost
    (bisects + scatters + log appends);
  * ``compact_once``   — one ``compact()`` on a full-log store, the
    amortized term (fires every ~tcap/slide steps on each store);
  * ``scatter_10k``    — a bare 10k-index scatter into a (cap,) f32
    array inside the same scan shape: the tombstone write's floor;
  * ``bisect_10k``     — the two sorted lookups alone (main + tail).

Usage: python benchmarking/micro/lazy_profile.py [--cap 2200000]
"""

from __future__ import annotations

import argparse
import sys
import time

try:
    import stgraph_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, __file__.rsplit("/", 3)[0])

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=2_200_000)
    ap.add_argument("--nodes", type=int, default=1_100_000)
    ap.add_argument("--slide", type=int, default=10_000)
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarking.micro._timing import readback_rtt
    from stgraph_tpu.graph.lazy_store import (
        _lexsort_rc,
        _sorted_lookup,
        compact,
        lazy_from_edges,
    )
    from stgraph_tpu.ops.dyn_spmm import (
        apply_delta_lazy_pair,
        lazy_pair_from_edges,
    )
    from stgraph_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    nodes, cap, slide, steps = args.nodes, args.cap, args.slide, args.steps
    rng = np.random.default_rng(0)
    e0 = cap - 280_000
    keys = np.unique(
        rng.integers(0, nodes, e0 * 2).astype(np.int64) * nodes
        + rng.integers(0, nodes, e0 * 2)
    )[:e0]
    rows0 = (keys // nodes).astype(np.int32)
    cols0 = (keys % nodes).astype(np.int32)
    adds = np.full((steps, slide, 2), nodes, np.int32)
    dels = np.full((steps, slide, 2), nodes, np.int32)
    for t in range(steps):
        sel = rng.choice(e0, slide, replace=False)
        dels[t, :, 0] = cols0[sel]  # (src, dst) — the pair argument order
        dels[t, :, 1] = rows0[sel]
        adds[t, :, 0] = rng.integers(0, nodes, slide)
        adds[t, :, 1] = rng.integers(0, nodes, slide)
    adds_j, dels_j = jnp.asarray(adds), jnp.asarray(dels)

    results = {}

    def bench(name, fn, *fargs, per=1):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(*fargs)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        compile_s = time.perf_counter() - t0
        rtt = readback_rtt()
        t1 = time.perf_counter()
        out = jfn(*fargs)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        dt = max(time.perf_counter() - t1 - rtt, 1e-9) / per
        results[name] = dt
        print(
            f"{name:16s} {dt*1e3:9.2f} ms   (compile {compile_s:.0f}s)",
            flush=True,
        )
        return dt

    def make_run(pair0, weighted=False):
        wts = jnp.ones((slide,), jnp.float32) if weighted else None

        def run(pair, a, dl):
            def body(pair, xs):
                aa, dd = xs
                pair = apply_delta_lazy_pair(
                    pair, aa[:, 0], aa[:, 1], dd[:, 0], dd[:, 1],
                    add_weights=wts,
                )
                return pair, pair.fwd.num_edges

            _, counts = jax.lax.scan(body, pair, (a, dl))
            return counts[-1]

        return run

    # 1. Full pair step at the bench tail capacity (compactions fire
    #    every ~tcap/slide = 16 steps on each store).
    pair_small = lazy_pair_from_edges(
        cols0, rows0, nodes, capacity=cap, tail_capacity=16 * slide
    )
    bench("pair_step", make_run(pair_small), pair_small, adds_j, dels_j,
          per=steps)

    # 1b. WEIGHTED pair: exercises the legacy tail-kill path (bisects
    #     every tail entry into the sorted delete batch, O(tcap·log d)
    #     per step) — the cost the unweighted anti-entry path removes.
    pair_w = lazy_pair_from_edges(
        cols0, rows0, nodes, capacity=cap, tail_capacity=16 * slide,
        weights=np.ones((e0,), np.float32),
    )
    bench("step_weighted", make_run(pair_w, weighted=True),
          pair_w, adds_j, dels_j, per=steps)

    # 1c. Small-tail variant: compactions fire 4x as often (every ~4
    #     steps per store) — exposes the in-scan compaction cost by slope.
    pair_tiny = lazy_pair_from_edges(
        cols0, rows0, nodes, capacity=cap, tail_capacity=4 * slide
    )
    bench("pair_tcap40k", make_run(pair_tiny), pair_tiny, adds_j, dels_j,
          per=steps)

    # 1d. Large-tail variant: with O(delta) per-step cost the tail size
    #     only sets compaction cadence — 64·slide fires every ~64 steps.
    pair_64 = lazy_pair_from_edges(
        cols0, rows0, nodes, capacity=cap, tail_capacity=64 * slide
    )
    bench("pair_tcap640k", make_run(pair_64), pair_64, adds_j, dels_j,
          per=steps)

    # 2. Compaction-free window: logs sized for the whole run.
    pair_big = lazy_pair_from_edges(
        cols0, rows0, nodes, capacity=cap,
        tail_capacity=(steps + 2) * slide,
    )
    bench("pair_nocompact", make_run(pair_big), pair_big, adds_j, dels_j,
          per=steps)

    # 3. One compaction on a full-log single store: 15 batches of adds
    #    in the tail, 15 batches of main tombstones (w=0 + anti-free) —
    #    the steady-state shape the in-scan cond branch sees.
    store = lazy_from_edges(
        cols0, rows0, nodes, capacity=cap, tail_capacity=16 * slide
    )
    t = 16 * slide
    tr = np.full((t,), nodes, np.int32)
    tc = np.full((t,), nodes, np.int32)
    tw = np.zeros((t,), np.float32)
    fill = 15 * slide
    tr[:fill] = rng.integers(0, nodes, fill)
    tc[:fill] = rng.integers(0, nodes, fill)
    tw[:fill] = 1.0
    w_main = np.zeros((cap,), np.float32)
    w_main[:e0] = 1.0
    sel = rng.choice(e0, fill, replace=False)
    w_main[sel] = 0.0  # tombstoned main slots (w>0 is the only record)
    from dataclasses import replace as dc_replace

    store_full = dc_replace(
        store,
        w=jnp.asarray(w_main),
        tail_rows=jnp.asarray(tr), tail_cols=jnp.asarray(tc),
        tail_w=jnp.asarray(tw), tail_count=jnp.int32(fill),
    )
    bench("compact_once", lambda s: compact(s).num_edges, store_full)

    # 3b. The same compaction INSIDE a scan, unconditionally chained —
    #     isolates whether the in-scan lax.cond(taken) overhead is the
    #     compact program itself or the cond/scan interaction (the
    #     implied in-scan cost from pair_step is ~15x compact_once).
    def run_compact_chain(s):
        def body(s, _):
            return compact(s), s.num_edges

        _, es = jax.lax.scan(body, s, None, length=8)
        return es[-1]

    bench("compact_chain8", run_compact_chain, store_full, per=8)

    # 3c. The cond exactly as the step builds it, taken every iteration
    #     (tail pre-filled so need=True each time after re-fill).
    def run_cond_chain(s):
        def body(s, _):
            s2 = jax.lax.cond(
                s.tail_count + slide > s.tail_capacity,
                compact,
                lambda x: x,
                s,
            )
            # Re-fill the tail count so the cond keeps firing (the log
            # arrays keep their stale content — cost is shape-driven).
            from dataclasses import replace as _rep

            s2 = _rep(
                s2,
                tail_rows=s.tail_rows, tail_cols=s.tail_cols,
                tail_w=s.tail_w, tail_count=s.tail_count,
            )
            return s2, s2.num_edges

        _, es = jax.lax.scan(body, s, None, length=8)
        return es[-1]

    bench("cond_chain8", run_cond_chain, store_full, per=8)

    # 4. Bare scatter floor: 10k tombstone writes into (cap,) f32, chained
    #    in the same scan shape so dispatch amortizes identically.
    w0 = jnp.ones((cap,), jnp.float32)
    idx = jnp.asarray(
        rng.integers(0, cap, (steps, slide)).astype(np.int32)
    )

    def run_scatter(w, idx):
        def body(w, ix):
            w = w.at[ix].set(0.0, mode="drop")
            return w, w[0]

        _, outs = jax.lax.scan(body, w, idx)
        return outs[-1]

    bench("scatter_10k", run_scatter, w0, idx, per=steps)

    # 5. The two sorted lookups alone (per store, per step: one over main
    #    by d queries + one over the tail by tcap entries).
    s_rows = jnp.asarray(np.sort(rows0))
    s_cols = jnp.asarray(cols0[np.argsort(rows0, kind="stable")])

    def run_bisect(sr, sc, dl):
        def body(c, dd):
            qo = _lexsort_rc(dd[:, 1], dd[:, 0])
            f1, i1 = _sorted_lookup(
                sr, sc, dd[:, 1][qo], dd[:, 0][qo], nodes
            )
            return c + jnp.sum(i1), c

        c, _ = jax.lax.scan(body, jnp.int32(0), dl)
        return c

    bench("bisect_main_10k", run_bisect, s_rows, s_cols, dels_j, per=steps)

    print(flush=True)
    amort = results.get("compact_once", 0.0) * 2 * slide / (16 * slide)
    print(
        f"accounting: nocompact {results['pair_nocompact']*1e3:.1f} ms "
        f"+ amortized 2-store compaction "
        f"{amort*1e3:.1f} ms "
        f"= {(results['pair_nocompact'] + amort)*1e3:.1f} ms "
        f"vs measured pair_step {results['pair_step']*1e3:.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
