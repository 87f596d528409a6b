"""External-framework quality parity: stgraph_tpu vs independent torch.

Trains the same model families on the same data, splits, hyperparameters,
and epoch budgets in BOTH frameworks and reports the quality metrics side
by side — the role the reference's PyG-T baseline drivers play for its
claims (``/root/reference/benchmarking/*/pygt/train.py``; PyG(-T) itself
is not in this image, so the torch side is an independent implementation
of the same layer math on torch scatter primitives, ``torch_models.py``).

Runs on CPU (both frameworks), minutes total. Emits a markdown table and
writes ``benchmarking/results/baselines.md``; the measured numbers are
mirrored into ``docs/PARITY.md``.

Usage: python benchmarking/baselines/run_baselines.py [--epochs-scale 1.0]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

try:  # installed package (pip install -e .) or raw-checkout fallback
    import stgraph_tpu  # noqa: F401
except ImportError:
    sys.path.insert(
        0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    )

import numpy as np


def _jax_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _split(n: int, seed: int = 0, train_frac: float = 0.6):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    k = int(n * train_frac)
    train = np.zeros(n, bool)
    train[perm[:k]] = True
    return train, ~train


def gcn_cora(epochs: int, seed: int = 0):
    """2-layer GCN node classification on Cora; returns (ours, torch) acc."""
    global _PROVENANCE
    jax = _jax_cpu()
    import flax.linen as fnn
    import jax.numpy as jnp
    import optax
    import torch

    from benchmarking.baselines.torch_models import (
        TorchGCN,
        _norm,
        edges_to_torch,
    )
    from stgraph_tpu import StaticGraph
    from stgraph_tpu.dataset import CoraDataLoader
    from stgraph_tpu.nn import GCNConv

    d = CoraDataLoader()
    _PROVENANCE.append("synthetic" if d.synthetic else "real")
    n, f = d.gdata["num_nodes"], d.gdata["num_feats"]
    classes = d.gdata["num_classes"]
    x_np = d.get_all_features().astype(np.float32)
    y_np = d.get_all_targets().astype(np.int64)
    train, test = _split(n)
    edges = np.asarray(d.get_edges(), np.int64)

    # ---- ours (jax) ----
    g = StaticGraph(edges, None, n)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)
    tr = jnp.asarray(train)

    class GCN(fnn.Module):
        @fnn.compact
        def __call__(self, h):
            h = GCNConv(f, 16, activation=jax.nn.relu)(g, h)
            return GCNConv(16, classes)(g, h)

    model = GCN()
    params = jax.jit(model.init)(jax.random.key(seed), x)
    opt = optax.adam(1e-2)
    ost = jax.jit(opt.init)(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            logits = model.apply(p, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(jnp.where(tr, ls, 0.0)) / tr.sum()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(grads, s)
        return optax.apply_updates(p, up), s, loss

    for _ in range(epochs):
        params, ost, _ = step(params, ost)
    pred = np.asarray(jnp.argmax(model.apply(params, x), -1))
    ours = float((pred[test] == y_np[test]).mean())

    # ---- torch ----
    torch.manual_seed(seed)
    src_t, dst_t = edges_to_torch(edges)
    norm_t = _norm(dst_t, n)
    tm = TorchGCN(f, 16, classes)
    optim = torch.optim.Adam(tm.parameters(), lr=1e-2)
    xt = torch.from_numpy(x_np)
    yt = torch.from_numpy(y_np)
    trt = torch.from_numpy(train)
    for _ in range(epochs):
        optim.zero_grad()
        logits = tm(src_t, dst_t, norm_t, xt)
        loss = torch.nn.functional.cross_entropy(logits[trt], yt[trt])
        loss.backward()
        optim.step()
    with torch.no_grad():
        pred_t = tm(src_t, dst_t, norm_t, xt).argmax(-1).numpy()
    theirs = float((pred_t[test] == y_np[test]).mean())
    return ours, theirs


def gat_cora(epochs: int, seed: int = 0):
    """2-layer 8-head GAT on Cora; returns (ours, torch) test accuracy."""
    jax = _jax_cpu()
    import flax.linen as fnn
    import jax.numpy as jnp
    import optax
    import torch

    from benchmarking.baselines.torch_models import TorchGAT, edges_to_torch
    from stgraph_tpu import StaticGraph
    from stgraph_tpu.dataset import CoraDataLoader
    from stgraph_tpu.nn import GATConv

    d = CoraDataLoader()
    _PROVENANCE.append("synthetic" if d.synthetic else "real")
    n, f = d.gdata["num_nodes"], d.gdata["num_feats"]
    classes = d.gdata["num_classes"]
    x_np = d.get_all_features().astype(np.float32)
    y_np = d.get_all_targets().astype(np.int64)
    train, test = _split(n)
    edges = np.asarray(d.get_edges(), np.int64)

    g = StaticGraph(edges, None, n)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)
    tr = jnp.asarray(train)

    class GAT(fnn.Module):
        @fnn.compact
        def __call__(self, h):
            h = GATConv(f, 8, num_heads=8, activation=jax.nn.elu)(g, h)
            h = h.reshape(h.shape[0], -1)
            h = GATConv(64, classes, num_heads=1)(g, h)
            return h.mean(axis=1)

    model = GAT()
    params = jax.jit(model.init)(jax.random.key(seed), x)
    opt = optax.adam(5e-3)
    ost = jax.jit(opt.init)(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            logits = model.apply(p, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(jnp.where(tr, ls, 0.0)) / tr.sum()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(grads, s)
        return optax.apply_updates(p, up), s, loss

    for _ in range(epochs):
        params, ost, _ = step(params, ost)
    pred = np.asarray(jnp.argmax(model.apply(params, x), -1))
    ours = float((pred[test] == y_np[test]).mean())

    torch.manual_seed(seed)
    src_t, dst_t = edges_to_torch(edges)
    tm = TorchGAT(f, 8, classes, heads=8, out_heads=1)
    optim = torch.optim.Adam(tm.parameters(), lr=5e-3)
    xt = torch.from_numpy(x_np)
    yt = torch.from_numpy(y_np)
    trt = torch.from_numpy(train)
    for _ in range(epochs):
        optim.zero_grad()
        logits = tm(src_t, dst_t, n, xt)
        loss = torch.nn.functional.cross_entropy(logits[trt], yt[trt])
        loss.backward()
        optim.step()
    with torch.no_grad():
        pred_t = tm(src_t, dst_t, n, xt).argmax(-1).numpy()
    theirs = float((pred_t[test] == y_np[test]).mean())
    return ours, theirs


def tgcn_wikimath(epochs: int, seed: int = 0, cutoff: int = 120, lags: int = 8):
    """TGCN regression on WikiMath (static-temporal); returns final-epoch
    TRAIN MSE (the reference's reported metric — its drivers print train
    MSE per epoch; a 20%-tail forecast metric is init-variance-dominated
    at these epoch budgets)."""
    jax = _jax_cpu()
    import flax.linen as fnn
    import jax.numpy as jnp
    import optax
    import torch

    from benchmarking.baselines.torch_models import (
        TorchTGCN,
        _norm,
        edges_to_torch,
    )
    from stgraph_tpu import StaticGraph
    from stgraph_tpu.dataset import WikiMathDataLoader
    from stgraph_tpu.nn import TGCN

    d = WikiMathDataLoader(lags=lags, cutoff_time=cutoff)
    _PROVENANCE.append("synthetic" if d.synthetic else "real")
    n = d.gdata["num_nodes"]
    targets = np.stack(d.get_all_targets()).astype(np.float32)  # (T, N)
    t_steps = targets.shape[0] - lags
    feats = np.stack(
        [targets[i : i + lags].T for i in range(t_steps)]
    )  # (T', N, lags)
    ys = targets[lags:]
    t_train = int(t_steps * 0.8)
    edges = np.asarray(d.get_edges(), np.int64)
    ew = np.asarray(d.get_edge_weights(), np.float32)

    # ---- ours ----
    g = StaticGraph(edges, ew, n)
    model = TGCN(lags, 16)
    head = fnn.Dense(1)
    fj = jnp.asarray(feats)
    yj = jnp.asarray(ys)
    ewj = jnp.asarray(ew)
    params = jax.jit(lambda k, x: model.init(k, g, x, edge_weight=ewj))(
        jax.random.key(seed), fj[0]
    )
    hp = jax.jit(head.init)(jax.random.key(1), jnp.zeros((n, 16)))
    opt = optax.adam(1e-2)
    ost = opt.init((params, hp))

    def run_span(params, hp, lo, hi):
        def body(hidden, xy):
            x_t, y_t = xy
            hidden = model.apply(params, g, x_t, edge_weight=ewj, hidden=hidden)
            y_hat = head.apply(hp, hidden)[:, 0]
            return hidden, jnp.mean((y_hat - y_t) ** 2)

        _, losses = jax.lax.scan(
            body, jnp.zeros((n, 16)), (fj[lo:hi], yj[lo:hi])
        )
        return losses

    @jax.jit
    def epoch(params, hp, s):
        def loss_fn(ph):
            params, hp = ph
            return run_span(params, hp, 0, t_train).mean()

        loss, grads = jax.value_and_grad(loss_fn)((params, hp))
        up, s = opt.update(grads, s)
        (params, hp) = optax.apply_updates((params, hp), up)
        return params, hp, s, loss

    for _ in range(epochs):
        params, hp, ost, _ = epoch(params, hp, ost)

    @jax.jit
    def eval_train(params, hp):
        return run_span(params, hp, 0, t_train).mean()

    ours = float(eval_train(params, hp))

    # ---- torch ----
    torch.manual_seed(seed)
    src_t, dst_t = edges_to_torch(edges)
    # Our StaticGraph sorts edges by (dst, src) and applies weights in CSR
    # order; the torch layer consumes user order directly — same multiset.
    ew_t = torch.from_numpy(ew)
    norm_t = _norm(dst_t, n)
    tm = TorchTGCN(lags, 16)
    th = torch.nn.Linear(16, 1)
    optim = torch.optim.Adam(
        list(tm.parameters()) + list(th.parameters()), lr=1e-2
    )
    ft = torch.from_numpy(feats)
    yt = torch.from_numpy(ys)

    def torch_span(lo, hi):
        hidden = torch.zeros(n, 16)
        losses = []
        for t in range(lo, hi):
            hidden = tm(src_t, dst_t, norm_t, ft[t], ew_t, hidden)
            y_hat = th(hidden)[:, 0]
            losses.append(((y_hat - yt[t]) ** 2).mean())
        return torch.stack(losses)

    for _ in range(epochs):
        optim.zero_grad()
        loss = torch_span(0, t_train).mean()
        loss.backward()
        optim.step()
    with torch.no_grad():
        theirs = float(torch_span(0, t_train).mean())
    return ours, theirs


def tgcn_england_covid(epochs: int, seed: int = 0, lags: int = 8):
    """Dynamic-graph TGCN regression on England-COVID (per-step edges +
    weights); returns final-epoch TRAIN MSE for both frameworks."""
    jax = _jax_cpu()
    import flax.linen as fnn
    import jax.numpy as jnp
    import optax
    import torch

    from benchmarking.baselines.torch_models import (
        TorchTGCN,
        _norm,
        edges_to_torch,
    )
    from stgraph_tpu.dataset import EnglandCovidDataLoader
    from stgraph_tpu.graph import NaiveGraph
    from stgraph_tpu.nn import TGCN

    d = EnglandCovidDataLoader(lags=lags)
    _PROVENANCE.append("synthetic" if d.synthetic else "real")
    edge_lists = d.get_edges()
    weight_lists = d.get_edge_weights()
    feats = [np.asarray(f, np.float32) for f in d.get_all_features()]
    ys = [np.asarray(y, np.float32) for y in d.get_all_targets()]
    t_steps = len(feats)
    t_train = int(t_steps * 0.8)

    G = NaiveGraph(edge_lists, weight_lists)
    n = G.get_num_nodes()
    stacked = G.stacked()
    stacked = jax.tree_util.tree_map(
        lambda x: x[lags : lags + t_steps], stacked
    )
    weights = G.stacked_weights()[lags : lags + t_steps]
    fj = jnp.asarray(np.stack(feats))
    yj = jnp.asarray(np.stack(ys))

    model = TGCN(lags, 16)
    head = fnn.Dense(1)
    csr0 = jax.tree_util.tree_map(lambda a: a[0], stacked)
    params = jax.jit(
        lambda k, x: model.init(
            k, csr0, x, edge_weight=weights[0].reshape(-1, 1)
        )
    )(jax.random.key(seed), fj[0])
    hp = jax.jit(head.init)(jax.random.key(1), jnp.zeros((n, 16)))
    opt = optax.adam(1e-2)
    ost = opt.init((params, hp))

    def run_span(params, hp, lo, hi):
        def body(hidden, xs):
            csr_t, w_t, x_t, y_t = xs
            hidden = model.apply(
                params, csr_t, x_t,
                edge_weight=w_t.reshape(-1, 1), hidden=hidden,
            )
            y_hat = head.apply(hp, hidden)[:, 0]
            return hidden, jnp.mean((y_hat - y_t) ** 2)

        sub = jax.tree_util.tree_map(lambda a: a[lo:hi], stacked)
        _, losses = jax.lax.scan(
            body, jnp.zeros((n, 16)),
            (sub, weights[lo:hi], fj[lo:hi], yj[lo:hi]),
        )
        return losses

    @jax.jit
    def epoch(params, hp, s):
        def loss_fn(ph):
            params, hp = ph
            return run_span(params, hp, 0, t_train).mean()

        loss, grads = jax.value_and_grad(loss_fn)((params, hp))
        up, s = opt.update(grads, s)
        (params, hp) = optax.apply_updates((params, hp), up)
        return params, hp, s, loss

    for _ in range(epochs):
        params, hp, ost, _ = epoch(params, hp, ost)
    ours = float(jax.jit(
        lambda p, h: run_span(p, h, 0, t_train).mean()
    )(params, hp))

    # ---- torch ----
    torch.manual_seed(seed)
    tm = TorchTGCN(lags, 16)
    th = torch.nn.Linear(16, 1)
    optim = torch.optim.Adam(
        list(tm.parameters()) + list(th.parameters()), lr=1e-2
    )
    edges_t, norms_t, w_t = [], [], []
    for t in range(t_steps):
        e = np.asarray(edge_lists[lags + t], np.int64)
        s_, d_ = edges_to_torch(e)
        edges_t.append((s_, d_))
        norms_t.append(_norm(d_, n))
        w_t.append(torch.from_numpy(np.asarray(weight_lists[lags + t], np.float32)))
    ft = [torch.from_numpy(f) for f in feats]
    yt = [torch.from_numpy(y) for y in ys]

    def torch_span(lo, hi):
        hidden = torch.zeros(n, 16)
        losses = []
        for t in range(lo, hi):
            s_, d_ = edges_t[t]
            hidden = tm(s_, d_, norms_t[t], ft[t], w_t[t], hidden)
            y_hat = th(hidden)[:, 0]
            losses.append(((y_hat - yt[t]) ** 2).mean())
        return torch.stack(losses)

    for _ in range(epochs):
        optim.zero_grad()
        loss = torch_span(0, t_train).mean()
        loss.backward()
        optim.step()
    with torch.no_grad():
        # Same span as ours (round-3 bug: this evaluated the TEST span
        # [t_train, t_steps) against our TRAIN MSE — the "1.9x gap in our
        # favor" in the round-3 table was an apples-to-oranges read).
        theirs = float(torch_span(0, t_train).mean())
    return ours, theirs


_PROVENANCE: list = []


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs-scale", type=float, default=1.0)
    ap.add_argument(
        "--seeds", type=int, default=3,
        help="init seeds per task; the table reports mean ± std "
        "(single-seed deltas on these small synthetic tasks are "
        "init-noise-dominated — the round-3 'GAT -3.6 pts' read)",
    )
    args = ap.parse_args()
    sc = args.epochs_scale

    rows = []
    for name, fn, epochs, metric in (
        ("Cora GCN", gcn_cora, int(200 * sc), "test acc"),
        ("Cora GAT (8 heads)", gat_cora, int(100 * sc), "test acc"),
        ("WikiMath TGCN", tgcn_wikimath, int(30 * sc), "train MSE"),
        ("England-COVID TGCN (dynamic)", tgcn_england_covid, int(100 * sc),
         "train MSE"),
    ):
        t0 = time.perf_counter()
        ours_l, theirs_l = [], []
        for seed in range(args.seeds):
            ours, theirs = fn(epochs, seed=seed)
            ours_l.append(ours)
            theirs_l.append(theirs)
        dt = time.perf_counter() - t0
        om, osd = float(np.mean(ours_l)), float(np.std(ours_l))
        tm, tsd = float(np.mean(theirs_l)), float(np.std(theirs_l))
        rows.append((name, metric, epochs, om, osd, tm, tsd, dt))
        print(
            f"{name}: ours={om:.4f}±{osd:.4f} torch={tm:.4f}±{tsd:.4f} "
            f"({metric}, {epochs} epochs x {args.seeds} seeds, {dt:.0f}s)",
            flush=True,
        )

    lines = [
        "# External baseline parity (measured)",
        "",
        "Same data, same split, same hyperparameters, same epoch budget;",
        "torch side is an independent implementation "
        "(`torch_models.py`). CPU, both frameworks.",
        f"Mean ± std over {args.seeds} init seeds (models in both",
        "frameworks re-initialized per seed; data/split fixed).",
        "",
        "| Task | Data | Metric | Epochs | stgraph_tpu | torch baseline |",
        "|---|---|---|---|---|---|",
    ]
    provs = _PROVENANCE[:: max(args.seeds, 1)]
    for (name, metric, epochs, om, osd, tm, tsd, _), prov in zip(
        rows, provs
    ):
        lines.append(
            f"| {name} | {prov} | {metric} | {epochs} "
            f"| {om:.4f} ± {osd:.4f} | {tm:.4f} ± {tsd:.4f} |"
        )
    out = "\n".join(lines) + "\n"
    path = os.path.join(
        os.path.dirname(__file__), "..", "results", "baselines.md"
    )
    with open(os.path.abspath(path), "w") as fh:
        fh.write(out)
    print(out)


if __name__ == "__main__":
    main()
