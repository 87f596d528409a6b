"""Static-temporal TGCN benchmark: regression over a fixed graph.

Mirrors the reference ``benchmarking/static-temporal-tgcn/seastar/train.py``:
dataset switch (WikiMath / Windmill / Hungary / PedalMe / Montevideo),
sweepable feature size, truncated-BPTT ``--backprop_every`` windows
(reference ``train.py:124-131``), per-epoch time + MSE, CSV output.

TPU-native twist: each BPTT window runs as one ``jax.lax.scan`` over
timesteps inside a single jitted train step — the whole window's
forward+backward is one XLA program (the reference launches per-timestep
kernels and unwinds a Python state stack).
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
import csv
import os
import time

import numpy as np


def load_dataset(name: str, lags: int, cutoff):
    from stgraph_tpu import dataset as D

    name = name.lower()
    if name in ("wiki", "wikimath"):
        d = D.WikiMathDataLoader(lags=lags, cutoff_time=cutoff)
    elif name.startswith("windmill"):
        size = name.split("_")[1] if "_" in name else "small"
        d = D.WindmillOutputDataLoader(size=size, lags=lags, cutoff_time=cutoff)
    elif name in ("hungarycp", "hungary"):
        d = D.HungaryCPDataLoader(lags=lags, cutoff_time=cutoff)
    elif name == "pedalme":
        d = D.PedalMeDataLoader(lags=lags, cutoff_time=cutoff)
    elif name in ("monte", "montevideobus"):
        d = D.MontevideoBusDataLoader(lags=lags, cutoff_time=cutoff)
    else:
        raise ValueError(f"unknown dataset {name}")
    return d


def main() -> None:
    ap = argparse.ArgumentParser("static-temporal TGCN benchmark")
    ap.add_argument("--dataset", default="wikimath")
    ap.add_argument("--num_epochs", type=int, default=10)
    ap.add_argument("--num_hidden", type=int, default=64)
    ap.add_argument("--feat_size", type=int, default=8, help="lags window = features")
    ap.add_argument("--backprop_every", type=int, default=0,
                    help="truncated-BPTT window (0 = whole sequence)")
    ap.add_argument("--cutoff_time", type=int, default=None)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--results_csv", default="")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint each timestep (trade FLOPs for HBM)")
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
    from stgraph_tpu.nn import TGCN
    from stgraph_tpu.utils import DataTable

    lags = args.feat_size
    d = load_dataset(args.dataset, lags, args.cutoff_time)
    n = d.gdata["num_nodes"]
    g = StaticGraph(d.get_edges(), d.get_edge_weights(), n)
    ew = jnp.asarray(np.asarray(d.get_edge_weights(), dtype=np.float32))

    targets = jnp.asarray(np.stack(d.get_all_targets()), jnp.float32)
    if targets.ndim != 2:
        targets = targets.reshape(targets.shape[0], -1)
    # Features: sliding lags window of the target series (the reference
    # benchmark builds y_hat inputs the same way).
    total = targets.shape[0] - lags
    feats = jnp.stack([targets[i : i + lags].T for i in range(total)])
    ys = targets[lags:]

    model = TGCN(lags, args.num_hidden, impl=args.impl)
    head = fnn.Dense(1)
    params = jax.jit(lambda k, x: model.init(k, g, x, edge_weight=ew))(
        jax.random.key(0), feats[0]
    )
    hparams = head.init(jax.random.key(1), jnp.zeros((n, args.num_hidden)))
    opt = optax.adam(args.lr)
    opt_state = opt.init((params, hparams))

    window = args.backprop_every or total
    n_windows = -(-total // window)
    pad = n_windows * window - total
    feats_w = jnp.pad(feats, ((0, pad), (0, 0), (0, 0))).reshape(
        n_windows, window, n, lags
    )
    ys_w = jnp.pad(ys, ((0, pad), (0, 0))).reshape(n_windows, window, n)
    mask_w_np = np.pad(np.ones(total, np.float32), (0, pad)).reshape(
        n_windows, window
    )
    mask_w = jnp.asarray(mask_w_np)

    @jax.jit
    def window_step(ps, opt_state, hidden, xw, yw, mw):
        def loss_fn(ps):
            p, hp = ps

            def body(h, xym):
                x_t, y_t, m_t = xym
                h = model.apply(p, g, x_t, edge_weight=ew, hidden=h)
                y_hat = head.apply(hp, h)[:, 0]
                return h, m_t * jnp.mean((y_hat - y_t) ** 2)

            if args.remat:
                # Rematerialize each timestep in backward: O(1) live
                # activations per step instead of O(window) — the lever for
                # very long sequences (SURVEY §5.7).
                body = jax.checkpoint(body)
            h_out, losses = jax.lax.scan(body, hidden, (xw, yw, mw))
            return losses.sum() / jnp.maximum(mw.sum(), 1.0), h_out

        (loss, h_out), grads = jax.value_and_grad(loss_fn, has_aux=True)(ps)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(ps, updates), opt_state, jax.lax.stop_gradient(h_out), loss

    table = DataTable(
        f"TGCN {args.dataset}", ["epoch", "mse", "time (s)"]
    )
    times = []
    ps = (params, hparams)
    for epoch in range(args.num_epochs):
        t0 = time.perf_counter()
        hidden = jnp.zeros((n, args.num_hidden))
        tot = 0.0
        try:
            for wi in range(n_windows):
                ps, opt_state, hidden, loss = window_step(
                    ps, opt_state, hidden, feats_w[wi], ys_w[wi], mask_w[wi]
                )
                tot += fetch_float(loss) * float(mask_w_np[wi].sum())
            jax.block_until_ready(loss)
        except (RuntimeError, jax.errors.JaxRuntimeError) as exc:
            # Device OOM parity with the reference's OOM row
            # (static-temporal-tgcn/seastar/train.py:212-218).
            if "RESOURCE_EXHAUSTED" in str(exc) or "out of memory" in str(exc).lower():
                table.add_row([epoch, "OOM", "OOM"])
                table.display()
                print("^^^OOM^^^OOM")
                return
            raise
        dt = time.perf_counter() - t0
        if epoch >= 3:
            times.append(dt)
        table.add_row([epoch, f"{tot / total:.6f}", f"{dt:.4f}"])
    table.display()
    avg = float(np.mean(times)) if times else 0.0
    print(f"avg epoch time (>=3): {avg:.5f}s")
    print(f"^^^0^^^{avg:.6f}")

    if args.results_csv:
        os.makedirs(os.path.dirname(args.results_csv) or ".", exist_ok=True)
        new = not os.path.exists(args.results_csv)
        with open(args.results_csv, "a", newline="") as fh:
            w = csv.writer(fh)
            if new:
                w.writerow(["dataset", "feat_size", "backprop_every", "epoch_time_s", "mse"])
            w.writerow([args.dataset, args.feat_size, args.backprop_every, avg, tot / total])


if __name__ == "__main__":
    main()
