"""GCN benchmark: Cora node classification.

Mirrors the reference driver ``benchmarking/gcn/seastar/train.py``:
per-epoch wall time averaged over epochs ≥ 3, peak device memory, train
accuracy, and the machine-parseable ``^^^<mem>^^^<time>`` summary line
(reference ``train.py:111``).
"""

from __future__ import annotations

import os
import sys

try:  # installed package (pip install -e .) or raw-checkout fallback
    import stgraph_tpu  # noqa: F401
except ImportError:
    sys.path.insert(
        0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    )

import argparse
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser("GCN-on-Cora benchmark")
    ap.add_argument("--num_epochs", type=int, default=200)
    ap.add_argument("--num_hidden", type=int, default=16)
    ap.add_argument("--num_layers", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--impl", default="auto", choices=["auto", "jnp", "dense", "pallas"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from stgraph_tpu.utils.cache import setup_compilation_cache
    from stgraph_tpu.utils.fetch import fetch_float

    setup_compilation_cache()
    import flax.linen as fnn
    import jax.numpy as jnp
    import optax

    from stgraph_tpu import StaticGraph
    from stgraph_tpu.dataset import CoraDataLoader
    from stgraph_tpu.nn import GCNConv
    from stgraph_tpu.utils import DataTable

    cora = CoraDataLoader(verbose=True)
    g = StaticGraph(cora.get_edges(), None, cora.gdata["num_nodes"])
    x = jnp.asarray(cora.get_all_features())
    y = jnp.asarray(cora.get_all_targets())
    f, classes = cora.gdata["num_feats"], cora.gdata["num_classes"]

    class GCN(fnn.Module):
        @fnn.compact
        def __call__(self, h):
            for _ in range(args.num_layers - 1):
                h = GCNConv(h.shape[-1], args.num_hidden, activation=jax.nn.relu,
                            impl=args.impl)(g, h)
            return GCNConv(h.shape[-1], classes, impl=args.impl)(g, h)

    model = GCN()
    params = jax.jit(model.init)(jax.random.key(42), x)
    opt = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    table = DataTable("GCN Cora", ["epoch", "loss", "time (s)", "acc"])
    times = []
    for epoch in range(args.num_epochs):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        if epoch >= 3:
            times.append(dt)
        if epoch % 20 == 0 or epoch == args.num_epochs - 1:
            acc = fetch_float((model.apply(params, x).argmax(-1) == y).mean())
            table.add_row([epoch, f"{fetch_float(loss):.4f}", f"{dt:.5f}", f"{acc:.4f}"])
    table.display()

    mem_mb = _peak_device_mem_mb()
    avg = float(np.mean(times)) if times else 0.0
    acc = fetch_float((model.apply(params, x).argmax(-1) == y).mean())
    print(f"train acc: {acc:.4f}, avg epoch time (>=3): {avg:.6f}s")
    print(f"^^^{mem_mb:.4f}^^^{avg:.6f}")  # reference-format summary line


def _peak_device_mem_mb() -> float:
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", 0) / 1e6
    except Exception:
        return 0.0


if __name__ == "__main__":
    main()
