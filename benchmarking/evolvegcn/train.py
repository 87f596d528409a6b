"""EvolveGCN benchmark: temporal regression with evolving GCN weights.

North-star model family (BASELINE.json lists EvolveGCN alongside
GCN/GAT/TGCN; the reference repo itself does not ship it). Trains
EvolveGCN-O or -H over a temporal dataset with the weight state threaded
through `lax.scan`, mirroring the TGCN driver's shape.

Usage: python benchmarking/evolvegcn/train.py --variant o --dataset wikimath
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
    ap = argparse.ArgumentParser("EvolveGCN benchmark")
    ap.add_argument("--variant", default="o", choices=["o", "h"])
    ap.add_argument("--dataset", default="wikimath")
    ap.add_argument("--num_epochs", type=int, default=10)
    ap.add_argument("--num_hidden", type=int, default=32)
    ap.add_argument("--feat_size", type=int, default=8)
    ap.add_argument("--cutoff_time", type=int, default=None)
    ap.add_argument("--lr", type=float, default=1e-2)
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
    from stgraph_tpu import dataset as D
    from stgraph_tpu.nn import EvolveGCNH, EvolveGCNO
    from stgraph_tpu.utils import DataTable

    lags = args.feat_size
    if args.dataset == "wikimath":
        d = D.WikiMathDataLoader(lags=lags, cutoff_time=args.cutoff_time)
    elif args.dataset.startswith("windmill"):
        d = D.WindmillOutputDataLoader(
            size="small", lags=lags, cutoff_time=args.cutoff_time
        )
    else:
        raise ValueError(f"unknown dataset {args.dataset}")

    n = d.gdata["num_nodes"]
    g = StaticGraph(d.get_edges(), d.get_edge_weights(), n)
    targets = np.stack(d.get_all_targets()).astype(np.float32)
    t_steps = targets.shape[0] - lags
    feats = jnp.asarray(
        np.stack([targets[i : i + lags].T for i in range(t_steps)])
    )  # (T, N, lags)
    ys = jnp.asarray(targets[lags:])

    cls = EvolveGCNO if args.variant == "o" else EvolveGCNH
    conv = cls(lags, args.num_hidden)
    head = fnn.Dense(1)
    params = jax.jit(lambda k, x: conv.init(k, g, x))(jax.random.key(0), feats[0])
    hp = jax.jit(head.init)(jax.random.key(1), jnp.zeros((n, args.num_hidden)))
    opt = optax.adam(args.lr)
    opt_state = jax.jit(opt.init)((params, hp))

    @jax.jit
    def epoch(ps, opt_state):
        def loss_fn(ps):
            params, hp = ps

            def body(w, xy):
                x_t, y_t = xy
                out, w = conv.apply(params, g, x_t, weight=w)
                y_hat = head.apply(hp, jax.nn.relu(out))[:, 0]
                return w, jnp.mean((y_hat - y_t) ** 2)

            w0 = params["params"]["weight"]
            _, losses = jax.lax.scan(body, w0, (feats, ys))
            return losses.mean()

        loss, grads = jax.value_and_grad(loss_fn)(ps)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(ps, updates), opt_state, loss

    table = DataTable(
        f"EvolveGCN-{args.variant.upper()} {args.dataset}",
        ["epoch", "mse", "time (s)"],
    )
    times = []
    ps = (params, hp)
    for ep in range(args.num_epochs):
        t0 = time.perf_counter()
        ps, opt_state, loss = epoch(ps, opt_state)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        if ep >= 3:
            times.append(dt)
        table.add_row([ep, f"{fetch_float(loss):.6f}", f"{dt:.4f}"])
    table.display()
    avg = float(np.mean(times)) if times else 0.0
    print(f"avg epoch time (>=3): {avg:.5f}s")
    print(f"^^^0^^^{avg:.6f}")


if __name__ == "__main__":
    main()
