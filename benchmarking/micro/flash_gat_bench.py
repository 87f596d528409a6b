"""Flash-GAT stage timings on the real chip (docs/PERF.md).

Stages: the [fs|el] plane gather, the narrow el segment-max, forward
only, and forward+backward — the derived backward cost is (d) - (c).

Usage: python benchmarking/micro/flash_gat_bench.py [--e 2000000]
"""

from __future__ import annotations

import argparse
import sys

try:  # installed package (pip install -e .) or raw-checkout fallback
    import stgraph_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, __file__.rsplit("/", 3)[0])

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--e", type=int, default=2_000_000)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--f", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarking.micro._timing import bench_chained
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops.flash_gat import flash_gat_attention
    from stgraph_tpu.ops.segment_pallas import segment_max_narrow
    from stgraph_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    n, e, h, f = args.n, args.e, args.heads, args.f
    rng = np.random.default_rng(0)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    csr = build_csr(src, dst, n)
    cap = csr.capacity
    el = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    er = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((n, h * f)).astype(np.float32))
    _, rows_np, cols_np, _ = csr.host_arrays()
    cols_c = np.minimum(cols_np, n - 1)
    sdt = jnp.bfloat16

    table = jnp.concatenate(
        [fs, el, jnp.zeros((n, 128 - h), jnp.float32)], axis=1
    )

    ids = jnp.asarray(cols_c)

    dt = bench_chained(lambda: (lambda t: t[ids].astype(sdt)), table)
    print(f"plane gather (E,{table.shape[1]}): {dt*1e3:.2f} ms", flush=True)

    ele = jnp.asarray(rng.standard_normal((cap, h)).astype(np.float32))
    dt = bench_chained(
        lambda: (lambda v: segment_max_narrow(csr, v)), ele
    )
    print(f"elmax narrow segment-max:  {dt*1e3:.2f} ms", flush=True)

    dt_f = bench_chained(
        lambda: (
            lambda c: flash_gat_attention(
                csr, el, er, c, heads=h, stream_dtype=sdt
            )
        ),
        fs,
    )
    print(f"flash forward:             {dt_f*1e3:.2f} ms", flush=True)

    # ALL THREE grads must feed the timed output: der (backward pass A)
    # reaches only the er gradient, so returning just g[2] lets XLA DCE
    # pass A entirely and the "fwd+bwd" time silently excludes it.
    g = jax.grad(
        lambda a, b, c: jnp.sum(
            flash_gat_attention(csr, a, b, c, heads=h, stream_dtype=sdt)
            ** 2
        ),
        argnums=(0, 1, 2),
    )

    def full_grads(c):
        dl, der, dfs = g(el, er, c)
        return jnp.concatenate([dl, der, dfs], axis=1)

    dt_b = bench_chained(lambda: (lambda c: full_grads(c)), fs)
    print(
        f"flash fwd+bwd:             {dt_b*1e3:.2f} ms "
        f"(bwd ~= {(dt_b-dt_f)*1e3:.2f} ms, {e/dt_b/1e6:.1f}M edges/s)",
        flush=True,
    )

    # Per-pass stage costs: skip one backward pass (its outputs zeroed,
    # so its kernels AND plane builds drop out of the program) and
    # subtract. flash_gat._SKIP_BWD_PASS is a trace-time knob.
    from stgraph_tpu.ops import flash_gat as fg

    for skip in ("A", "B"):
        fg._SKIP_BWD_PASS = skip
        try:
            dt_s = bench_chained(lambda: (lambda c: full_grads(c)), fs)
        finally:
            fg._SKIP_BWD_PASS = None
        print(
            f"fwd+bwd minus pass {skip}:     {dt_s*1e3:.2f} ms "
            f"(pass {skip} = {(dt_b-dt_s)*1e3:.2f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
