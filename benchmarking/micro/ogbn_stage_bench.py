"""Stage-level interleaved A/B: where does the reorder's fwd+bwd loss go?

Round-3 finding (``ogbn_ab_bench.py``): locality reordering wins the
isolated forward SpMM 2.08x but LOSES ~12% on the full 3-layer GCN
fwd+bwd step. This bench times each stage separately, interleaved
base/reorder in one process, to pin the regression:

  * ``gather_fwd`` / ``gather_bwd`` — a 16M-edge window of the raw XLA
    row gather by the forward cols / transpose cols (the per-edge HBM
    random-read cost, the quantity the reorder is supposed to shrink);
  * ``spmm_fwd`` / ``spmm_bwd`` — the full segmented rowmask SpMM over
    the forward / transpose CSR (gather + kernel, all segments);
  * ``step`` — the full 3-layer fwd+bwd training step (continuity with
    ``ogbn_ab_bench.py``).

Usage: python benchmarking/micro/ogbn_stage_bench.py [--scale 1.0]
       [--stages gather,spmm,step]
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
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--stages", type=str, default="gather,spmm")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp

    from benchmarking.micro._timing import bench_chained, readback_rtt
    from stgraph_tpu.dataset import OgbNodeDataLoader
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.graph.reorder import locality_order, relabel_edges
    from stgraph_tpu.ops import spmm_pallas
    from stgraph_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    t0 = time.perf_counter()
    d = OgbNodeDataLoader("ogbn-products", scale=args.scale)
    n, e = d.gdata["num_nodes"], d.gdata["num_edges"]
    ei = d.get_edge_index()
    print(f"load: N={n} E={e} in {time.perf_counter()-t0:.1f}s", flush=True)

    order = locality_order(ei[0], ei[1], n)
    src_r, dst_r = relabel_edges(ei[0], ei[1], order)

    rng = np.random.default_rng(0)
    h_np = rng.standard_normal((n, args.hidden)).astype(np.float32)
    h = jax.device_put(h_np)

    def build(src, dst):
        csr = build_csr(src, dst, n)
        csr_t = csr.transpose()
        _, _, cols_np, _ = csr.host_arrays()
        _, _, cols_t_np, _ = csr_t.host_arrays()
        sids = jax.device_put(np.minimum(cols_np, n - 1))
        sids_t = jax.device_put(np.minimum(cols_t_np, n - 1))
        return csr, csr_t, sids, sids_t

    t0 = time.perf_counter()
    variants = {
        "base": build(ei[0], ei[1]),
        "reorder": build(src_r, dst_r),
    }
    print(f"build both: {time.perf_counter()-t0:.1f}s", flush=True)

    win = min(16_000_000, e)
    lo = (e - win) // 2

    results = {}

    def run(stage, name, make_fn, x0, per_edge_of, iters=None):
        t0 = time.perf_counter()
        dt = bench_chained(make_fn, x0, iters=iters or args.iters)
        rate = per_edge_of / dt / 1e6
        results[(stage, name)] = dt
        print(
            f"{stage:12s} {name:8s} {dt*1e3:8.1f} ms  "
            f"{rate:7.1f}M edges/s  (wall {time.perf_counter()-t0:.0f}s)",
            flush=True,
        )

    for name, (csr, csr_t, sids, sids_t) in variants.items():
        if "gather" in stages:
            idx_f = jax.lax.slice(sids, (lo,), (lo + win,))
            idx_b = jax.lax.slice(sids_t, (lo,), (lo + win,))
            # The raw gather is a SHORT program; at <~1 s of chained work
            # the relay acks before executing and the measurement reads ~0
            # (docs/PERF.md, timing methodology). 64 chained iterations
            # put it far past the relay pipeline window.
            run(
                "gather_fwd", name,
                lambda i=idx_f: (lambda x: jnp.sum(x[i], dtype=jnp.float32)),
                h, win, iters=64,
            )
            run(
                "gather_bwd", name,
                lambda i=idx_b: (lambda x: jnp.sum(x[i], dtype=jnp.float32)),
                h, win, iters=64,
            )
        if "spmm" in stages:
            # The full segmented SpMM is a BIG module; chaining it inside
            # a scan triples it past the relay's remote-compile limit
            # (broken pipe). Single-dispatch + readback is honest here —
            # the program runs ~1 s, far past the relay's ack pipeline
            # (same methodology as bench.py's ogbn metric).
            def run_single(stage, fn, burst=6):
                # Burst timing: enqueue `burst` dispatches, drain ONCE via
                # the last result's readback. A single ~700 ms program can
                # still sit inside the relay's ack pipeline and read fast
                # (docs/PERF.md); a multi-second burst cannot.
                t0 = time.perf_counter()
                float(fn(h, sids, sids_t))  # compile + warm + drain
                rtt = readback_rtt()
                t1 = time.perf_counter()
                out = None
                for _ in range(burst):
                    out = fn(h, sids, sids_t)
                float(out)
                dt = (time.perf_counter() - t1 - rtt) / burst
                results[(stage, name)] = dt
                print(
                    f"{stage:12s} {name:8s} {dt*1e3:8.1f} ms  "
                    f"{e/dt/1e6:7.1f}M edges/s  "
                    f"(wall {time.perf_counter()-t0:.0f}s)",
                    flush=True,
                )

            fwd = jax.jit(
                lambda x, si, st, c=csr, ct=csr_t: jnp.sum(
                    spmm_pallas.spmm(
                        c, x, csr_t=ct, src_ids=si, src_ids_t=st
                    ),
                    dtype=jnp.float32,
                )
            )
            bwd = jax.jit(
                lambda x, si, st, c=csr, ct=csr_t: jnp.sum(
                    spmm_pallas.spmm(
                        ct, x, csr_t=c, src_ids=st, src_ids_t=si
                    ),
                    dtype=jnp.float32,
                )
            )
            run_single("spmm_fwd", fwd)
            run_single("spmm_bwd", bwd)

    for (stage, name), dt in sorted(results.items()):
        print(f"RESULT {stage} {name} {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
