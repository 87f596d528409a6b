"""Lazy-store update-cost decomposition (round-5 verdict ask #2).

This harness drove the round-5 redesign, in three measured steps
(docs/PERF.md round-5 dynamic section):

1. the round-4 69 ms step was 52% tail-kill pass (``step_nokill``
   ablation; per-step cost scaled with tail_capacity, not delta) —
   replaced by the anti-entry log;
2. the remaining amortized compaction was program-bisected
   (``compact_upto_*`` probes: the merge design's bisect and
   rank-select gather phases cost 183 + 375 ms on real operands) —
   replaced by the unified sort compact (218 ms);
3. final steady state: ``pair_step`` 15.9 ms (1.26M updates/s) with
   in-scan compactions, ``pair_nocompact`` 4.9 ms floor.

Probes (run a subset with ``--stages name,name``): pair_step /
step_weighted (legacy kill path) / pair_tcap{40k,640k} /
pair_nocompact / compact_once / compact_chain8 / cond_chain8 /
compact_unroll8 / compact_upto_{pre,live,bisect,full} (the REPLACED
merge design, kept as the measured record of the losing alternative) /
argsort320k_scan / bisect320k_scan / segsum320k_scan /
merge_phase_scan / livecompact_scan / scatter_10k / bisect_main_10k.

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
    ap.add_argument("--stages", type=str, default="all",
                    help="comma list of bench names to run (default all)")
    args = ap.parse_args()
    only = None if args.stages == "all" else set(args.stages.split(","))

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
    # Live-set stream: deletes name live edges (the apply_delta contract;
    # sampling from the ORIGINAL edge set names already-deleted keys
    # ~20% of the time by step 40). keys are dst-major here; the stream
    # generator packs src-major.
    from benchmarking.micro._workload import gen_delta_stream

    keys_sd = cols0.astype(np.int64) * nodes + rows0
    adds, dels = gen_delta_stream(rng, keys_sd, nodes, steps, slide)
    adds_j, dels_j = jnp.asarray(adds), jnp.asarray(dels)

    results = {}

    def bench(name, fn, *fargs, per=1):
        if only is not None and name not in only:
            return 0.0
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
    # Consume rows/cols/w, not just num_edges: the counts depend only on
    # the keep masks, so a num_edges-only read lets XLA DCE the entire
    # merge phase and the "standalone compact" time measures nothing.
    bench(
        "compact_once",
        lambda s: (lambda c: jnp.sum(c.rows) + jnp.sum(c.w))(compact(s)),
        store_full,
    )

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
                s.tail_count + slide >= s.tail_capacity,  # True: taken
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

    # 3d'. Program bisection: consume progressively more of compact's
    #      outputs (XLA DCEs everything downstream of the consumed set)
    #      — phase deltas on the REAL operands.
    from stgraph_tpu.graph.lazy_store import (
        _lexsort_rc as _lx,
        _searchsorted_rc as _ss,
    )

    def _compact_upto(s, upto):
        # Mirrors the round-5 MERGE-based compact prototype phase-for-
        # phase (pre-combine -> live-compact -> bisect -> rank-select).
        # That design measured 605 ms here and was REPLACED by the
        # unified-sort compact now in lazy_store.py (218 ms); this probe
        # is kept as the measured record of the losing alternative.
        nn = s.num_nodes
        tt = s.tail_capacity
        t2 = 2 * tt
        capc = s.capacity
        r_a = jnp.concatenate([s.tail_rows, s.anti_rows])
        c_a = jnp.concatenate([s.tail_cols, s.anti_cols])
        w_a = jnp.concatenate([s.tail_w, s.anti_w()])
        o = _lx(r_a, c_a)
        r, c, w = r_a[o], c_a[o], w_a[o]
        first = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), (r[1:] != r[:-1]) | (c[1:] != c[:-1])]
        )
        rid = jnp.cumsum(first.astype(jnp.int32)) - 1
        net = jax.ops.segment_sum(w, rid, num_segments=t2)[rid]
        keep = first & (r < nn) & (net > 0)
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        pos = jnp.where(keep, rank, t2)
        na_r = jnp.full((t2,), nn, jnp.int32).at[pos].set(
            jnp.where(keep, r, nn), mode="drop")
        na_c = jnp.full((t2,), nn, jnp.int32).at[pos].set(
            jnp.where(keep, c, nn), mode="drop")
        na_w = jnp.zeros((t2,), jnp.float32).at[pos].set(
            jnp.where(keep, net, 0.0), mode="drop")
        if upto == "pre":
            return jnp.sum(na_r) + jnp.sum(na_w)
        lm = s.w > 0
        mrank = jnp.cumsum(lm.astype(jnp.int32)) - 1
        mpos = jnp.where(lm, mrank, capc)
        lm_r = jnp.full((capc,), nn, jnp.int32).at[mpos].set(
            s.rows, mode="drop")
        lm_c = jnp.full((capc,), nn, jnp.int32).at[mpos].set(
            s.cols, mode="drop")
        lm_w = jnp.zeros((capc,), jnp.float32).at[mpos].set(
            s.w, mode="drop")
        if upto == "live":
            return (jnp.sum(na_r) + jnp.sum(na_w)
                    + jnp.sum(lm_r) + jnp.sum(lm_w))
        pp = _ss(lm_r, lm_c, na_r, na_c)
        if upto == "bisect":
            return (jnp.sum(na_r) + jnp.sum(lm_r) + jnp.sum(pp))
        q = pp + jnp.arange(t2, dtype=jnp.int32)
        L = capc + t2
        i = jnp.arange(L, dtype=jnp.int32)
        ind = jnp.zeros((L + 1,), jnp.int32).at[jnp.minimum(q + 1, L)].add(1)
        tcum = jnp.cumsum(ind)[:L]
        tcc = jnp.minimum(tcum, t2 - 1)
        is_add = q[tcc] == i
        sidx = jnp.minimum(jnp.maximum(i - tcum, 0), capc - 1)
        m_rows = jnp.where(is_add, na_r[tcc], lm_r[sidx])[:capc]
        m_cols = jnp.where(is_add, na_c[tcc], lm_c[sidx])[:capc]
        m_w = jnp.where(is_add, na_w[tcc], lm_w[sidx])[:capc]
        return jnp.sum(m_rows) + jnp.sum(m_cols) + jnp.sum(m_w)

    from dataclasses import replace as _dc_rep

    for phase in ("pre", "live", "bisect", "full"):
        def run_phase(s, _phase=phase):
            def body(carry, _):
                # Thread the float carry through the weight arrays so the
                # probe is NOT loop-invariant (XLA would hoist it and the
                # 8-iteration scan would measure one execution). The
                # 0.0*out chain survives because 0*NaN != 0 for floats.
                s2 = _dc_rep(
                    s, w=s.w + carry, tail_w=s.tail_w + carry
                )
                out = _compact_upto(s2, _phase)
                return 0.0 * out.astype(jnp.float32), out

            c2, _ = jax.lax.scan(
                body, jnp.float32(0), None, length=8
            )
            return c2

        bench(f"compact_upto_{phase}", run_phase, store_full, per=8)

    # 3d. The same 8 chained compacts WITHOUT a scan (Python unroll):
    #     separates "compact is slow in scan context" from "compact is
    #     slow, and short standalone programs are mistimed by the relay".
    def run_compact_unroll(s):
        for _ in range(8):
            s = compact(s)
        return s.num_edges

    bench("compact_unroll8", run_compact_unroll, store_full, per=8)

    # 3e. Compact sub-ops, in scan (8 iters) — which one blows up?
    t16 = 16 * slide

    def run_argsort_scan(r, c):
        def body(carry, _):
            r, c = carry
            o = jnp.argsort(c, stable=True)
            o = o[jnp.argsort(r[o], stable=True)]
            return (r.at[0].set(o[0]), c), o[-1]

        _, os_ = jax.lax.scan(body, (r, c), None, length=8)
        return os_[-1]

    r2 = jnp.asarray(rng.integers(0, nodes, 2 * t16).astype(np.int32))
    c2 = jnp.asarray(rng.integers(0, nodes, 2 * t16).astype(np.int32))
    bench("argsort320k_scan", run_argsort_scan, r2, c2, per=8)

    qr = jnp.asarray(rng.integers(0, nodes, 2 * t16).astype(np.int32))
    qc = jnp.asarray(rng.integers(0, nodes, 2 * t16).astype(np.int32))

    def run_bisect320k_scan(sr, sc, qr, qc):
        def body(carry, _):
            f, i1 = _sorted_lookup(sr, sc, qr + carry, qc, nodes)
            return carry * 0 + i1[0] * 0, jnp.sum(i1)

        _, os_ = jax.lax.scan(
            body, jnp.int32(0), None, length=8
        )
        return os_[-1]

    bench("bisect320k_scan", run_bisect320k_scan,
          jnp.asarray(np.sort(rows0)),
          jnp.asarray(cols0[np.argsort(rows0, kind="stable")]),
          qr, qc, per=8)

    def run_segsum_scan(r2, w2):
        def body(carry, _):
            s = jax.ops.segment_sum(w2 + carry, r2, num_segments=2 * t16)
            return carry * 0 + s[0] * 0, s[-1]

        _, os_ = jax.lax.scan(body, jnp.float32(0), None, length=8)
        return os_[-1]

    rid2 = jnp.asarray(rng.integers(0, 2 * t16, 2 * t16).astype(np.int32))
    w2 = jnp.ones((2 * t16,), jnp.float32)
    bench("segsum320k_scan", run_segsum_scan, rid2, w2, per=8)

    # 3f. The merge/rank-select phase alone (ind scatter + L cumsum +
    #     6 monotone gathers + wheres), on realistic operands, in scan.
    t2b = 2 * t16
    na_r_b = jnp.asarray(
        np.sort(rng.integers(0, nodes, t2b)).astype(np.int32)
    )
    na_c_b = jnp.asarray(rng.integers(0, nodes, t2b).astype(np.int32))
    na_w_b = jnp.ones((t2b,), jnp.float32)
    lm_r_b = jnp.asarray(
        np.pad(np.sort(rows0), (0, cap - e0), constant_values=nodes)
    )
    lm_c_b = jnp.asarray(
        np.pad(cols0[np.argsort(rows0, kind="stable")], (0, cap - e0),
               constant_values=nodes)
    )
    lm_w_b = jnp.ones((cap,), jnp.float32)
    p_b = jnp.asarray(
        np.searchsorted(np.sort(rows0), np.asarray(na_r_b)).astype(np.int32)
    )

    def run_merge_phase(na_r, na_c, na_w, lm_r, lm_c, lm_w, p):
        L = cap + t2b
        i = jnp.arange(L, dtype=jnp.int32)

        def body(carry, _):
            q = p + jnp.arange(t2b, dtype=jnp.int32) + carry
            ind = (
                jnp.zeros((L + 1,), jnp.int32)
                .at[jnp.minimum(q + 1, L)]
                .add(1)
            )
            tcum = jnp.cumsum(ind)[:L]
            tcc = jnp.minimum(tcum, t2b - 1)
            is_add = q[tcc] == i
            sidx = jnp.minimum(jnp.maximum(i - tcum, 0), cap - 1)
            m_rows = jnp.where(is_add, na_r[tcc], lm_r[sidx])[:cap]
            m_w = jnp.where(is_add, na_w[tcc], lm_w[sidx])[:cap]
            m_cols = jnp.where(is_add, na_c[tcc], lm_c[sidx])[:cap]
            out = jnp.sum(m_rows) + jnp.sum(m_cols) + jnp.sum(m_w)
            return carry * 0 + out.astype(jnp.int32) * 0, out

        _, os_ = jax.lax.scan(body, jnp.int32(0), None, length=8)
        return os_[-1]

    bench("merge_phase_scan", run_merge_phase,
          na_r_b, na_c_b, na_w_b, lm_r_b, lm_c_b, lm_w_b, p_b, per=8)

    # Capacity-sized cumsum + scatter (live-compact phase) in scan.
    def run_livecompact_scan(w_m, r_m):
        def body(carry, _):
            lm = (w_m + carry) > 0
            rank = jnp.cumsum(lm.astype(jnp.int32)) - 1
            out = (
                jnp.full((cap,), nodes, jnp.int32)
                .at[jnp.where(lm, rank, cap)]
                .set(r_m, mode="drop")
            )
            return carry * 0 + out[0] * 0.0, out[-1]

        _, os_ = jax.lax.scan(body, jnp.float32(0), None, length=8)
        return os_[-1]

    bench("livecompact_scan", run_livecompact_scan,
          jnp.asarray(w_main), jnp.asarray(np.sort(rows0))[:cap] if cap <= e0
          else jnp.asarray(np.pad(np.sort(rows0), (0, cap - e0))),
          per=8)

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
    if only is not None:
        return
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
