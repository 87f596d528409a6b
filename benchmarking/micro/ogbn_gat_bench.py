"""Flash-GAT at ogbn-products scale on one chip (segmented plane path).

The round-2 flash path refused graphs whose gather plane exceeded
FLASH_MAX_PLANE_BYTES; round 3's segment-streaming rebuild lets the full
E=123.7M attention layer run on a single v5e. Per-edge id arrays ride as
jit ARGUMENTS (the (cap,) constants exceed the remote-compile request
limit at this scale — same workaround as the SpMM bench).

Usage: python benchmarking/micro/ogbn_gat_bench.py [--scale 1.0]
       [--heads 8] [--f 32] [--bwd]
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
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--f", type=int, default=32)
    ap.add_argument("--bwd", action="store_true", help="also time fwd+bwd")
    ap.add_argument("--reorder", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarking.micro._timing import readback_rtt
    from stgraph_tpu.dataset import OgbNodeDataLoader
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops.flash_gat import flash_gat_attention
    from stgraph_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    t0 = time.perf_counter()
    d = OgbNodeDataLoader(
        "ogbn-products", scale=args.scale, reorder=args.reorder
    )
    n, e = d.gdata["num_nodes"], d.gdata["num_edges"]
    print(
        f"load ({'SYNTHETIC' if d.synthetic else 'real'}"
        f"{', reordered' if args.reorder else ''}): N={n} E={e} "
        f"in {time.perf_counter()-t0:.1f}s",
        flush=True,
    )
    ei = d.get_edge_index()
    t0 = time.perf_counter()
    csr = build_csr(ei[0], ei[1], n)
    csr_t = csr.transpose()
    print(f"CSR build+transpose: {time.perf_counter()-t0:.1f}s", flush=True)

    h, f = args.heads, args.f
    rng = np.random.default_rng(0)
    el = jax.device_put(rng.standard_normal((n, h)).astype(np.float32))
    er = jax.device_put(rng.standard_normal((n, h)).astype(np.float32))
    fs = jax.device_put(rng.standard_normal((n, h * f)).astype(np.float32))
    _, _, cols_np, _ = csr.host_arrays()
    _, _, cols_t_np, _ = csr_t.host_arrays()
    sids = jax.device_put(np.minimum(cols_np, n - 1))
    sids_t = jax.device_put(np.minimum(cols_t_np, n - 1))

    def attn(el, er, fs, si, st):
        return flash_gat_attention(
            csr, el, er, fs, heads=h, csr_t=csr_t,
            stream_dtype=jnp.bfloat16, src_ids=si, src_ids_t=st,
        )

    fwd = jax.jit(
        lambda el, er, fs, si, st: jnp.sum(
            attn(el, er, fs, si, st), dtype=jnp.float32
        )
    )
    t0 = time.perf_counter()
    v = float(fwd(el, er, fs, sids, sids_t))
    print(f"fwd compile+run1: {time.perf_counter()-t0:.1f}s", flush=True)
    rtt = readback_rtt()
    t0 = time.perf_counter()
    v = float(fwd(el, er, fs, sids, sids_t))
    dt = time.perf_counter() - t0 - rtt
    print(
        f"flash GAT fwd E={e}: {dt*1e3:.1f} ms -> "
        f"{e/dt/1e6:.1f}M edges/s/chip",
        flush=True,
    )

    if args.bwd:
        grad = jax.jit(
            jax.grad(
                lambda el, er, fs, si, st: jnp.sum(
                    attn(el, er, fs, si, st) ** 2, dtype=jnp.float32
                ),
                argnums=(0, 1, 2),
            )
        )
        t0 = time.perf_counter()
        g = grad(el, er, fs, sids, sids_t)
        jax.block_until_ready(g)
        _ = float(g[0][0, 0])
        print(f"fwd+bwd compile+run1: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        g = grad(el, er, fs, sids, sids_t)
        _ = float(g[0][0, 0])
        dt = time.perf_counter() - t0 - rtt
        print(
            f"flash GAT fwd+bwd E={e}: {dt*1e3:.1f} ms -> "
            f"{e/dt/1e6:.1f}M edges/s/chip",
            flush=True,
        )


if __name__ == "__main__":
    main()
