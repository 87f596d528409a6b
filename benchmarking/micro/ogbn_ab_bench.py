"""Interleaved A/B: ogbn-scale GCN step with vs without locality reorder.

The round-3 separate-process runs disagreed on the 3-layer GCN step
(13.0 s baseline vs 14.4 s reordered) while the SpMM alone improved 2.08x
— suspicious of relay drift between processes. This bench builds BOTH
graphs, compiles both steps, then times them interleaved (A B A B ...) in
one process so drift hits both equally.

Usage: python benchmarking/micro/ogbn_ab_bench.py [--scale 1.0] [--rounds 3]
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
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from benchmarking.micro._timing import readback_rtt
    from stgraph_tpu.dataset import OgbNodeDataLoader
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.graph.reorder import (
        inverse_permutation,
        locality_order,
        relabel_edges,
    )
    from stgraph_tpu.ops import spmm_pallas
    from stgraph_tpu.utils.cache import setup_compilation_cache
    from stgraph_tpu.utils.norm import symmetric_norm

    setup_compilation_cache()
    t0 = time.perf_counter()
    d = OgbNodeDataLoader("ogbn-products", scale=args.scale)
    n, e = d.gdata["num_nodes"], d.gdata["num_edges"]
    f, classes = d.gdata["num_feats"], d.gdata["num_classes"]
    ei = d.get_edge_index()
    print(f"load: N={n} E={e} in {time.perf_counter()-t0:.1f}s", flush=True)

    order = locality_order(ei[0], ei[1], n)
    new_id = inverse_permutation(order).astype(np.int64)
    src_r, dst_r = relabel_edges(ei[0], ei[1], order)

    x = d.get_all_features().astype(np.float32)
    y = d.get_all_targets()
    rng = np.random.default_rng(0)
    dims = [f, args.hidden, args.hidden, classes]
    params = {
        f"w{i}": jnp.asarray(
            rng.standard_normal((dims[i], dims[i + 1])) * 0.05, jnp.float32
        )
        for i in range(3)
    }

    def build(src, dst, xx, yy):
        csr = build_csr(src, dst, n)
        csr_t = csr.transpose()
        norm = np.asarray(symmetric_norm(csr))
        _, _, cols_np, _ = csr.host_arrays()
        _, _, cols_t_np, _ = csr_t.host_arrays()
        sids = jax.device_put(np.minimum(cols_np, n - 1))
        sids_t = jax.device_put(np.minimum(cols_t_np, n - 1))

        def model(p, h, si, st):
            for i in range(3):
                h = (h @ p[f"w{i}"]) * norm
                h = spmm_pallas.spmm(
                    csr, h, csr_t=csr_t, src_ids=si, src_ids_t=st
                ) * norm
                if i < 2:
                    h = jax.nn.relu(h)
            return h

        @jax.jit
        def step(p, xx, yy, si, st):
            def loss_fn(p):
                logits = model(p, xx, si, st)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, yy
                ).mean()

            return jax.value_and_grad(loss_fn)(p)

        xd = jax.device_put(xx)
        yd = jax.device_put(yy)
        return lambda: step(params, xd, yd, sids, sids_t)

    t0 = time.perf_counter()
    run_a = build(ei[0], ei[1], x, y)
    run_b = build(src_r, dst_r, x[order], y[order])
    print(f"build both: {time.perf_counter()-t0:.1f}s", flush=True)

    # Compile both before timing anything.
    for name, fn in (("base", run_a), ("reorder", run_b)):
        t0 = time.perf_counter()
        loss, _ = fn()
        _ = float(loss)
        print(f"{name} compile+run1: {time.perf_counter()-t0:.1f}s", flush=True)

    rtt = readback_rtt()
    times = {"base": [], "reorder": []}
    for r in range(args.rounds):
        for name, fn in (("base", run_a), ("reorder", run_b)):
            t0 = time.perf_counter()
            loss, _ = fn()
            _ = float(loss)
            times[name].append(time.perf_counter() - t0 - rtt)
    for name in ("base", "reorder"):
        ts = times[name]
        dt = float(np.median(ts))
        print(
            f"{name}: median {dt*1e3:.0f} ms/step over {len(ts)} "
            f"(all: {[f'{t*1e3:.0f}' for t in ts]}) -> "
            f"{6*e/dt/1e6:.0f}M mp-edges/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
