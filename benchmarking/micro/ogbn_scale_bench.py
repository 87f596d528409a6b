"""ogbn-products-scale single-chip benchmark (BASELINE config 5, 1-chip leg).

Loads ogbn-products through the OGB loader (real files when present; this
environment has no egress, so the scale-faithful synthetic fallback runs at
the REAL size: N=2,449,029, E=123,718,280 directed edges, F=100) and:

  1. verifies the rowmask SpMM's segment streaming at >= 1e8 edges on one
     chip (the gathered feature plane never exceeds ``_SEGMENT_BYTES``);
  2. times a full 3-layer GCN forward+backward step and reports
     edges/s/chip (message-passing edges = 3 layers x E per direction).

Usage: python benchmarking/micro/ogbn_scale_bench.py [--scale 0.1]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--reorder",
        action="store_true",
        help="apply the label-propagation gather-locality relabeling "
        "(graph/reorder.py) before CSR construction",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from benchmarking.micro._timing import readback_rtt
    from stgraph_tpu.dataset import OgbNodeDataLoader
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.nn import GCNConv
    from stgraph_tpu.utils.norm import symmetric_norm

    t0 = time.perf_counter()
    d = OgbNodeDataLoader(
        "ogbn-products", scale=args.scale, reorder=args.reorder
    )
    print(
        f"load ({'SYNTHETIC' if d.synthetic else 'real'}"
        f"{', reordered' if args.reorder else ''}): "
        f"{d.gdata} in {time.perf_counter()-t0:.1f}s",
        flush=True,
    )
    n, e = d.gdata["num_nodes"], d.gdata["num_edges"]
    f, classes = d.gdata["num_feats"], d.gdata["num_classes"]
    ei = d.get_edge_index()
    if args.reorder:
        from stgraph_tpu.graph.reorder import gather_working_set

        # Region ~= the 512 MB gathered-feature segment the kernel streams.
        ws = gather_working_set(ei[1], ei[0], n, region_edges=1 << 20)
        print(f"gather working set after reorder: {ws/1e6:.1f} MB/region")

    t0 = time.perf_counter()
    csr = build_csr(ei[0], ei[1], n)
    csr_t = csr.transpose()
    print(f"CSR build+transpose: {time.perf_counter()-t0:.1f}s", flush=True)

    from stgraph_tpu.graph.stgraph_base import STGraphBase

    class _G(STGraphBase):
        def __init__(self):
            super().__init__()
            self._fwd = csr

        def get_num_nodes(self):
            return n

        def get_num_edges(self):
            return e

        def graph_type(self):
            return "csr"

    g = _G()
    g.fwd_csr = csr
    g.bwd_csr = csr_t

    # GCNConv consumes StaticGraph-like objects; drive the ops layer
    # directly instead (same code path GCNConv lowers to).
    from stgraph_tpu.ops import spmm_pallas

    # Features/labels stay HOST numpy and ride as jit ARGUMENTS: closing
    # over device arrays pulls them d2h at lowering (docs/PERF.md), and
    # embedding them as constants would add ~1 GB to the lowered module.
    x = d.get_all_features().astype(np.float32)
    y = d.get_all_targets()
    norm = np.asarray(symmetric_norm(csr))

    dims = [f, args.hidden, args.hidden, classes]
    rng = np.random.default_rng(0)
    params = {
        **{
            f"w{i}": jnp.asarray(
                rng.standard_normal((dims[i], dims[i + 1])) * 0.05, jnp.float32
            )
            for i in range(3)
        },
    }

    # Per-edge id arrays ride as jit ARGUMENTS: at 1.2e8 edges the
    # (capacity,) constants are ~500 MB each, past the remote-compile
    # request limit (HTTP 413) — see _make_rowmask_spmm_dynidx.
    _, _, cols_np, _ = csr.host_arrays()
    _, _, cols_t_np, _ = csr_t.host_arrays()
    sids = jax.device_put(np.minimum(cols_np, n - 1))
    sids_t = jax.device_put(np.minimum(cols_t_np, n - 1))

    def spmm(h, si, st):
        return spmm_pallas.spmm(csr, h, csr_t=csr_t, src_ids=si, src_ids_t=st)

    def model(p, h, si, st):
        for i in range(3):
            h = (h @ p[f"w{i}"]) * norm
            h = spmm(h, si, st) * norm
            if i < 2:
                h = jax.nn.relu(h)
        return h

    # 1. streaming SpMM forward at full edge count
    h0 = jax.device_put(
        rng.standard_normal((n, args.hidden)).astype(np.float32)
    )
    fwd = jax.jit(
        lambda h, si, st: jnp.sum(spmm(h, si, st), dtype=jnp.float32)
    )
    t0 = time.perf_counter()
    v = float(fwd(h0, sids, sids_t))
    print(f"spmm compile+run1: {time.perf_counter()-t0:.1f}s", flush=True)
    rtt = readback_rtt()
    t0 = time.perf_counter()
    v = float(fwd(h0, sids, sids_t))
    dt = time.perf_counter() - t0 - rtt
    print(
        f"SPMM E={e}: {dt*1e3:.1f} ms -> {e/dt/1e6:.0f}M edges/s/chip",
        flush=True,
    )

    # 2. full 3-layer GCN fwd+bwd step (x/y as device args, uploaded once)
    xd = jax.device_put(x)
    yd = jax.device_put(y)

    @jax.jit
    def step(p, xx, yy, si, st):
        def loss_fn(p):
            logits = model(p, xx, si, st)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yy
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        return loss, grads

    t0 = time.perf_counter()
    loss, grads = step(params, xd, yd, sids, sids_t)
    _ = float(loss)
    print(f"gcn step compile+run1: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        loss, grads = step(params, xd, yd, sids, sids_t)
    _ = float(loss)
    dt = (time.perf_counter() - t0 - rtt) / args.iters
    mp_edges = 6 * e  # 3 layers x (fwd + transpose bwd)
    print(
        f"3-layer GCN fwd+bwd: {dt*1e3:.1f} ms/step -> "
        f"{mp_edges/dt/1e6:.0f}M message-passing edges/s/chip "
        f"(loss={float(loss):.4f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
