"""Micro-benchmark: per-segment max strategies at large-graph GAT scale.

Measures (on the default backend):
  * jnp ``segment_max`` (XLA scatter-max) over E sorted edge ids, K heads
  * the blocked Pallas ``segment_sum_edges`` (for scale reference)
  * the raw XLA gather ``h[cols]``

Run: python benchmarking/micro/segmax_bench.py [--edges 2000000 --nodes 100000 --heads 8]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _timeit(fn, arg, iters=30):
    """Time ``fn(arg)`` per iteration, chaining iterations through a
    ``lax.scan`` carry inside ONE dispatch so per-call tunnel overhead and
    queue pipelining cannot distort the number."""
    import jax
    import jax.numpy as jnp

    def step(carry, _):
        out = fn(arg * carry)
        # fold the output back into the scalar carry: serializes iterations
        # and defeats CSE without measurable extra work
        c = 1.0 + 0.0 * jax.lax.stop_gradient(out.reshape(-1)[0])
        return c.astype(arg.dtype), ()

    @jax.jit
    def run():
        c, _ = jax.lax.scan(step, jnp.asarray(1.0, arg.dtype), None, length=iters)
        return c

    run().block_until_ready()  # compile + warmup
    t0 = time.perf_counter()
    run().block_until_ready()
    return (time.perf_counter() - t0) / iters


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=100_000)
    p.add_argument("--edges", type=int, default=2_000_000)
    p.add_argument("--heads", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.graph.blocked import build_blocked
    from stgraph_tpu.ops import segment as seg
    from stgraph_tpu.ops import spmm_pallas

    rng = np.random.default_rng(0)
    src = rng.integers(0, args.nodes, size=args.edges, dtype=np.int32)
    dst = rng.integers(0, args.nodes, size=args.edges, dtype=np.int32)
    csr = build_csr(src, dst, args.nodes)
    blocked = build_blocked(csr)
    print(f"graph: N={args.nodes} E={args.edges} heads={args.heads}", flush=True)

    # device_put once — numpy args would re-upload through the tunnel per call
    vals = jax.device_put(
        rng.standard_normal((csr.capacity, args.heads)).astype(np.float32)
    )
    n = csr.num_nodes

    t0 = _timeit(lambda v: v * 2.0, vals)
    print(
        f"scan-chain baseline (read+write E x {args.heads}): {t0*1e3:.3f} ms",
        flush=True,
    )

    def xla_segmax(v):
        return seg.segment_max(v, csr.rows, n, edge_mask=csr.edge_mask)

    t = _timeit(xla_segmax, vals)
    print(f"xla scatter segment_max (E,{args.heads}): {t*1e3:.3f} ms", flush=True)

    @jax.jit
    def xla_segsum(v):
        return seg.segment_sum(v, csr.rows, n, edge_mask=csr.edge_mask)

    t = _timeit(xla_segsum, vals)
    print(f"xla scatter segment_sum (E,{args.heads}): {t*1e3:.3f} ms", flush=True)

    @jax.jit
    def pallas_segsum(v):
        return spmm_pallas.segment_sum_edges(csr, v, blocked=blocked)

    t = _timeit(pallas_segsum, vals)
    print(f"pallas blocked segment_sum_edges (E,{args.heads}): {t*1e3:.3f} ms", flush=True)

    h = jax.device_put(rng.standard_normal((args.nodes, 128)).astype(np.float32))

    @jax.jit
    def gather(hh):
        return hh[jnp.asarray(csr.cols)]

    t = _timeit(gather, h)
    print(f"xla gather h[cols] (E,128): {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__" and "--decompose" not in __import__("sys").argv:
    main()


def decompose() -> None:
    """Stage-by-stage decomposition of segment_sum_edges at GAT scale."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=100_000)
    p.add_argument("--edges", type=int, default=2_000_000)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--decompose", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.graph.blocked import build_blocked
    from stgraph_tpu.ops import segment as seg
    from stgraph_tpu.ops import spmm_pallas

    rng = np.random.default_rng(0)
    src = rng.integers(0, args.nodes, size=args.edges, dtype=np.int32)
    dst = rng.integers(0, args.nodes, size=args.edges, dtype=np.int32)
    csr = build_csr(src, dst, args.nodes)
    blocked = build_blocked(csr)
    n = csr.num_nodes
    cb = blocked.capacity
    print(f"graph: N={n} E={args.edges} heads={args.heads} CB={cb}", flush=True)

    perm = np.minimum(np.asarray(blocked.perm), csr.capacity - 1)
    mask = (np.asarray(blocked.perm) < csr.capacity).astype(np.float32)

    vals = jax.device_put(
        rng.standard_normal((csr.capacity, args.heads)).astype(np.float32)
    )
    vb128 = jax.device_put(rng.standard_normal((cb, 128)).astype(np.float32))
    ones = jnp.ones((cb,), jnp.float32)

    t = _timeit(lambda v: spmm_pallas.segment_sum_blocked(blocked, ones, v), vb128)
    print(f"kernel only, pre-blocked (CB,128): {t*1e3:.3f} ms", flush=True)

    t = _timeit(lambda v: v[perm] * mask[:, None], vals)
    print(f"perm-gather (E,{args.heads}) -> (CB,{args.heads}): {t*1e3:.3f} ms", flush=True)

    t = _timeit(
        lambda v: jnp.pad(v[perm] * mask[:, None], ((0, 0), (0, 128 - args.heads))),
        vals,
    )
    print(f"perm-gather + pad to (CB,128): {t*1e3:.3f} ms", flush=True)

    vals128 = jax.device_put(
        rng.standard_normal((csr.capacity, 128)).astype(np.float32)
    )
    t = _timeit(lambda v: seg.segment_sum(v, csr.rows, n, edge_mask=csr.edge_mask), vals128)
    print(f"xla scatter segment_sum (E,128): {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__" and "--decompose" in __import__("sys").argv:
    decompose()
    raise SystemExit(0)
