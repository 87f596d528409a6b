"""Testpack: end-to-end training runs over every dataloader.

Role-parity with the reference's manual GPU testpacks
(``/root/reference/tests/scripts/stgraph_script.py`` + ``v1_1_0/``:
"modules whose correctness cannot be directly unit tested using PyTest").
Unlike the reference — which needs a human with a GPU — this pack runs on
any backend; CI runs it on CPU via ``tests/test_testpack.py``.

Each pack trains briefly and asserts the loss is finite and decreasing-ish:

* GCN pack: 2-layer GCN node classification on Cora.
* Temporal TGCN pack: TGCN regression on each temporal dataloader.
* Dynamic pack: TGCN link prediction on England-COVID (naive + delta).

Usage: python tests/scripts/stgraph_script.py [--packs gcn,temporal,dynamic]
Writes one log per run under tests/scripts/outputs/.
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

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "outputs")


def _log(name: str, lines) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, f"{name}.log"), "w") as fh:
        fh.write("\n".join(str(x) for x in lines) + "\n")


def run_gcn_pack() -> dict:
    import jax
    import jax.numpy as jnp
    import flax.linen as fnn
    import optax

    from stgraph_tpu import StaticGraph
    from stgraph_tpu.dataset import CoraDataLoader
    from stgraph_tpu.nn import GCNConv

    cora = CoraDataLoader()
    g = StaticGraph(cora.get_edges(), None, cora.gdata["num_nodes"])
    x = jnp.asarray(cora.get_all_features())
    y = jnp.asarray(cora.get_all_targets())
    classes = cora.gdata["num_classes"]

    class GCN(fnn.Module):
        @fnn.compact
        def __call__(self, h):
            h = GCNConv(h.shape[-1], 16, activation=jax.nn.relu)(g, h)
            return GCNConv(16, classes)(g, h)

    model = GCN()
    params = jax.jit(model.init)(jax.random.key(0), x)
    opt = optax.adam(1e-2)
    opt_state = jax.jit(opt.init)(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            return optax.softmax_cross_entropy_with_integer_labels(
                model.apply(p, x), y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    _log("gcn_cora", losses)
    assert all(l == l for l in losses), "GCN loss went NaN"
    assert losses[-1] < losses[0], f"GCN loss did not drop: {losses[0]}→{losses[-1]}"
    return {"pack": "gcn", "first": losses[0], "last": losses[-1]}


def _tgcn_regression(name: str, loader, lags: int = 4, steps: int = 10) -> dict:
    import jax
    import jax.numpy as jnp
    import flax.linen as fnn
    import numpy as np
    import optax

    from stgraph_tpu import StaticGraph
    from stgraph_tpu.nn import TGCN

    n = loader.gdata["num_nodes"]
    g = StaticGraph(loader.get_edges(), loader.get_edge_weights(), n)
    targets = jnp.asarray(np.stack(loader.get_all_targets()), jnp.float32)
    if targets.ndim > 2:  # (T, N, k) → (T, N)
        targets = targets.reshape(targets.shape[0], n, -1)[..., 0]
    t_steps = min(steps, targets.shape[0] - lags)
    feats = jnp.stack([targets[i : i + lags].T for i in range(t_steps)])
    ys = targets[lags : lags + t_steps]
    ew = jnp.asarray(loader.get_edge_weights(), jnp.float32)

    model = TGCN(lags, 8)
    head = fnn.Dense(1)
    params = jax.jit(lambda k, f: model.init(k, g, f, edge_weight=ew))(
        jax.random.key(0), feats[0]
    )
    hp = jax.jit(head.init)(jax.random.key(1), jnp.zeros((n, 8)))
    opt = optax.adam(1e-2)
    opt_state = jax.jit(opt.init)((params, hp))

    @jax.jit
    def epoch(ps, s):
        def loss_fn(ps):
            params, hp = ps

            def body(hidden, xy):
                x_t, y_t = xy
                hidden = model.apply(params, g, x_t, edge_weight=ew, hidden=hidden)
                y_hat = head.apply(hp, hidden)[:, 0]
                return hidden, jnp.mean((y_hat - y_t) ** 2)

            _, losses = jax.lax.scan(body, jnp.zeros((n, 8)), (feats, ys))
            return losses.mean()

        loss, grads = jax.value_and_grad(loss_fn)(ps)
        u, s = opt.update(grads, s)
        return optax.apply_updates(ps, u), s, loss

    ps = (params, hp)
    losses = []
    for _ in range(5):
        ps, opt_state, loss = epoch(ps, opt_state)
        losses.append(float(loss))
    _log(f"tgcn_{name}", losses)
    assert all(l == l for l in losses), f"TGCN {name} loss went NaN"
    return {"pack": f"tgcn_{name}", "first": losses[0], "last": losses[-1]}


def run_temporal_pack() -> list:
    from stgraph_tpu import dataset as D

    loaders = {
        "wikimath": lambda: D.WikiMathDataLoader(lags=4, cutoff_time=30),
        "windmill": lambda: D.WindmillOutputDataLoader(
            size="small", lags=4, cutoff_time=30
        ),
        "hungarycp": lambda: D.HungaryCPDataLoader(lags=4, cutoff_time=30),
        "pedalme": lambda: D.PedalMeDataLoader(lags=4, cutoff_time=30),
        "montevideobus": lambda: D.MontevideoBusDataLoader(lags=4, cutoff_time=30),
        "metrla": lambda: D.METRLADataLoader(
            num_timesteps_in=4, num_timesteps_out=1, cutoff_time=30
        ),
    }
    out = []
    for name, make in loaders.items():
        if name == "metrla":
            out.append(_metrla_pack(make()))
        else:
            out.append(_tgcn_regression(name, make()))
    return out


def _metrla_pack(loader) -> dict:
    """METR-LA ships (T, N, F_in) windows; run one fwd/bwd for shape sanity."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stgraph_tpu import StaticGraph
    from stgraph_tpu.nn import GCNConv

    n = loader.gdata["num_nodes"]
    g = StaticGraph(loader.get_edges(), loader.get_edge_weights(), n)
    x = jnp.asarray(np.asarray(loader.get_all_features())[0], jnp.float32)
    x = x.reshape(n, -1)
    conv = GCNConv(x.shape[-1], 8)
    params = jax.jit(lambda k, x: conv.init(k, g, x))(jax.random.key(0), x)

    def loss_fn(p):
        return (conv.apply(p, g, x) ** 2).mean()

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert float(loss) == float(loss)
    _log("tgcn_metrla", [float(loss)])
    return {"pack": "tgcn_metrla", "first": float(loss), "last": float(loss)}


def run_dynamic_pack() -> list:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stgraph_tpu.dataset import EnglandCovidDataLoader
    from stgraph_tpu.graph import DeltaGraph, NaiveGraph
    from stgraph_tpu.nn import TGCN
    import flax.linen as fnn
    import optax

    eng = EnglandCovidDataLoader(lags=4, cutoff_time=12)
    edge_lists = eng.get_edges()
    n = eng.gdata["num_nodes"]
    if isinstance(n, dict):  # dynamic gdata: per-timestamp node counts
        n = max(n.values())
    feats = jnp.asarray(np.stack(eng.get_all_features()), jnp.float32)
    ys = jnp.asarray(np.stack(eng.get_all_targets()), jnp.float32)
    t_total = min(len(edge_lists), feats.shape[0])

    out = []
    for kind, G in (
        ("naive", NaiveGraph(edge_lists)),
        ("delta", DeltaGraph(edge_lists)),
    ):
        model = TGCN(feats.shape[-1], 8)
        head = fnn.Dense(1)
        params = jax.jit(lambda k, f: model.init(k, G.get_graph(0), f))(
            jax.random.key(0), feats[0]
        )
        hp = jax.jit(head.init)(jax.random.key(1), jnp.zeros((n, 8)))
        opt = optax.adam(1e-2)
        opt_state = jax.jit(opt.init)((params, hp))

        def epoch(ps, s):
            def loss_fn(ps):
                params, hp = ps
                hidden = jnp.zeros((n, 8))
                tot = 0.0
                for t in range(t_total):
                    hidden = model.apply(params, G.get_graph(t), feats[t], hidden=hidden)
                    y_hat = head.apply(hp, hidden)[:, 0]
                    tot = tot + jnp.mean((y_hat - ys[t]) ** 2)
                return tot / t_total

            loss, grads = jax.value_and_grad(loss_fn)(ps)
            u, s = opt.update(grads, s)
            return optax.apply_updates(ps, u), s, loss

        epoch = jax.jit(epoch)
        ps = (params, hp)
        losses = []
        for _ in range(3):
            ps, opt_state, loss = epoch(ps, opt_state)
            losses.append(float(loss))
        _log(f"dynamic_{kind}", losses)
        assert all(l == l for l in losses), f"dynamic {kind} NaN"
        out.append({"pack": f"dynamic_{kind}", "first": losses[0], "last": losses[-1]})

    # Lazy pair: the flagship O(delta) store driven through the SAME
    # TGCN loop — per-timestep apply_delta_lazy_pair from the staged
    # deltas (unweighted, so the anti-entry delete path is exercised),
    # aggregation through GCNConv's LazyPair routing.
    from stgraph_tpu.ops.dyn_spmm import (
        apply_delta_lazy_pair,
        lazy_pair_from_edges,
    )

    Gd = DeltaGraph(edge_lists)
    sa, sd = Gd.staged_deltas()
    tcap = int(sa.shape[1])
    empty = np.empty((0,), np.int64)
    pair0 = lazy_pair_from_edges(
        empty, empty, n, capacity=Gd._capacity + tcap, tail_capacity=tcap
    )
    model = TGCN(feats.shape[-1], 8)
    head = fnn.Dense(1)
    params = jax.jit(lambda k, f: model.init(k, Gd.get_graph(0), f))(
        jax.random.key(0), feats[0]
    )
    hp = jax.jit(head.init)(jax.random.key(1), jnp.zeros((n, 8)))
    opt = optax.adam(1e-2)
    opt_state = jax.jit(opt.init)((params, hp))

    def lazy_epoch(ps, s):
        def loss_fn(ps):
            params, hp = ps
            hidden = jnp.zeros((n, 8))
            pair = pair0
            tot = 0.0
            for t in range(t_total):
                pair = apply_delta_lazy_pair(
                    pair, sa[t][:, 0], sa[t][:, 1], sd[t][:, 0], sd[t][:, 1]
                )
                hidden = model.apply(params, pair, feats[t], hidden=hidden)
                y_hat = head.apply(hp, hidden)[:, 0]
                tot = tot + jnp.mean((y_hat - ys[t]) ** 2)
            return tot / t_total

        loss, grads = jax.value_and_grad(loss_fn)(ps)
        u, s = opt.update(grads, s)
        return optax.apply_updates(ps, u), s, loss

    lazy_epoch = jax.jit(lazy_epoch)
    ps = (params, hp)
    losses = []
    for _ in range(3):
        ps, opt_state, loss = lazy_epoch(ps, opt_state)
        losses.append(float(loss))
    _log("dynamic_lazy", losses)
    assert all(l == l for l in losses), "dynamic lazy NaN"
    out.append(
        {"pack": "dynamic_lazy", "first": losses[0], "last": losses[-1]}
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--packs", default="gcn,temporal,dynamic")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    packs = args.packs.split(",")
    results = []
    t0 = time.time()
    if "gcn" in packs:
        results.append(run_gcn_pack())
    if "temporal" in packs:
        results.extend(run_temporal_pack())
    if "dynamic" in packs:
        results.extend(run_dynamic_pack())
    for r in results:
        print(f"{r['pack']:>16}: {r['first']:.4f} -> {r['last']:.4f}")
    print(f"testpack OK ({len(results)} runs, {time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
