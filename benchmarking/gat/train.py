"""GAT benchmark: Cora node classification with multi-head attention.

Mirrors the reference ``benchmarking/gat/seastar/train.py`` (multi-head
config ``heads=[num_heads]*(layers-1)+[out_heads]``, ``train.py:77-90``).
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
    ap = argparse.ArgumentParser("GAT-on-Cora benchmark")
    ap.add_argument("--dataset", default="cora", choices=["cora", "pubmed"])
    ap.add_argument("--num_epochs", type=int, default=200)
    ap.add_argument("--num_hidden", type=int, default=8)
    ap.add_argument("--num_heads", type=int, default=8)
    ap.add_argument("--num_out_heads", type=int, default=1)
    ap.add_argument("--num_layers", type=int, default=2)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--negative_slope", type=float, default=0.2)
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
    from stgraph_tpu.dataset import CoraDataLoader, PubmedDataLoader
    from stgraph_tpu.nn import GATConv
    from stgraph_tpu.utils import DataTable

    cora = (
        PubmedDataLoader(verbose=True)
        if args.dataset == "pubmed"
        else CoraDataLoader(verbose=True)
    )
    g = StaticGraph(cora.get_edges(), None, cora.gdata["num_nodes"])
    x = jnp.asarray(cora.get_all_features())
    y = jnp.asarray(cora.get_all_targets())
    f, classes = cora.gdata["num_feats"], cora.gdata["num_classes"]
    heads = [args.num_heads] * (args.num_layers - 1) + [args.num_out_heads]

    class GAT(fnn.Module):
        @fnn.compact
        def __call__(self, h):
            for layer in range(args.num_layers - 1):
                h = GATConv(
                    h.shape[-1],
                    args.num_hidden,
                    num_heads=heads[layer],
                    negative_slope=args.negative_slope,
                    activation=jax.nn.elu,
                )(g, h)
                h = h.reshape(h.shape[0], -1)  # concat heads
            out = GATConv(
                h.shape[-1],
                classes,
                num_heads=heads[-1],
                negative_slope=args.negative_slope,
            )(g, h)
            return out.mean(axis=1)  # average the output heads

    model = GAT()
    params = jax.jit(model.init)(jax.random.key(42), x)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    table = DataTable("GAT Cora", ["epoch", "loss", "time (s)", "acc"])
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
    avg = float(np.mean(times)) if times else 0.0
    acc = fetch_float((model.apply(params, x).argmax(-1) == y).mean())
    print(f"train acc: {acc:.4f}, avg epoch time (>=3): {avg:.6f}s")
    print(f"^^^0^^^{avg:.6f}")


if __name__ == "__main__":
    main()
