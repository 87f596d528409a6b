"""Benchmark driver: one JSON line per metric, headline first.

Headline (round 5): the full-scale ogbn-products 3-layer GCN TRAINING
step in mp-edges/s/chip — a device-bound number at 123.7M edges. The
Cora 2-layer GCN line (the BASELINE.json north-star metric) follows as a
continuity metric, explicitly labeled ``dispatch_bound``: at 10.5k edges
and ~100 us/step it measures launch amortization, not device throughput.
Further records: TGCN epoch, 2M-edge SpMM and GAT (with
``fraction_of_hbm_peak`` against the chip's measured practical 627 GB/s,
docs/PERF.md calibration), the full-scale ogbn SpMM, and the dynamic
lazy-store metrics split into step / aggregation-only / update-only with
the same-shape static-SpMM rate alongside.

``vs_baseline`` is 1.0: the reference repository publishes no concrete
numbers (BASELINE.md §"Published numbers" — ``"published": {}``), so there
is no reference figure to normalize against.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


_RTT = None


def _drain(out):
    """Force REAL completion with a device->host readback.

    ``block_until_ready`` is not a reliable fence on this environment's
    remote-TPU relay: it acks small programs before they execute (measured:
    a short matmul scan "finishes" at 45,000 TFLOP/s; the same program at
    longer lengths measures a correct ~170 TFLOP/s). Only a d2h readback
    drains the queue. See docs/PERF.md "Timing methodology".
    """
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def _rtt():
    """Measured scalar-readback round-trip (subtracted from timings)."""
    global _RTT
    if _RTT is None:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: x + 1.0)
        _drain(f(jnp.float32(0.0)))  # first d2h pays one-time path setup
        t0 = time.perf_counter()
        for i in range(3):
            _drain(f(jnp.float32(i)))
        _RTT = (time.perf_counter() - t0) / 3
    return _RTT


def _bench(fn, *args, iters=20, warmup=3):
    """Per-call seconds, drained, with iteration count auto-scaled until the
    measured span dominates the readback RTT (sub-RTT workloads would
    otherwise vanish into the subtraction noise)."""
    rtt = _rtt()
    for _ in range(warmup):
        out = fn(*args)
    _drain(out)
    n = iters
    while True:
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _drain(out)
        dt = time.perf_counter() - t0
        if dt - rtt > max(5 * rtt, 0.25) or n >= 200_000:
            return max(dt - rtt, 1e-9) / n
        n *= 4


def bench_gcn_fwd_bwd():
    """Edges/s of one fwd+bwd step of 2-layer GCN on Cora."""
    import jax
    import jax.numpy as jnp
    import flax.linen as fnn
    import optax
    from stgraph_tpu import StaticGraph
    from stgraph_tpu.dataset import CoraDataLoader
    from stgraph_tpu.nn import GCNConv

    cora = CoraDataLoader()
    n = cora.gdata["num_nodes"]
    e = cora.gdata["num_edges"]
    f = cora.gdata["num_feats"]
    classes = cora.gdata["num_classes"]
    g = StaticGraph(cora.get_edges(), None, n)
    x = jnp.asarray(cora.get_all_features())
    y = jnp.asarray(cora.get_all_targets())

    class GCN(fnn.Module):
        @fnn.compact
        def __call__(self, h):
            h = GCNConv(f, 16, activation=jax.nn.relu)(g, h)
            return GCNConv(16, classes)(g, h)

    model = GCN()
    # Jit the init: eager per-op dispatch over the remote-TPU tunnel takes
    # minutes; one jitted program compiles once.
    params = jax.jit(model.init)(jax.random.key(0), x)
    opt = optax.adam(1e-2)
    opt_state = jax.jit(opt.init)(params)

    def step(p, s):
        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    # Epochs are batched per dispatch (lax.scan over the train step), the
    # standard TPU training-loop shape: single-step dispatch over a remote
    # tunnel has a ~1 ms latency floor that would otherwise dominate this
    # sub-millisecond workload (docs/PERF.md).
    k_steps = 100

    @jax.jit
    def multi_step(p, s):
        def body(c, _):
            p, s = c
            p, s, loss = step(p, s)
            return (p, s), loss

        (p, s), losses = jax.lax.scan(body, (p, s), None, length=k_steps)
        return p, s, losses[-1]

    single = jax.jit(step)

    def run(p, s):
        p, s, loss = multi_step(p, s)
        return loss

    dt = _bench(run, params, opt_state, iters=3, warmup=1) / k_steps
    dt_single = _bench(
        lambda p, s: single(p, s)[2], params, opt_state, iters=20, warmup=3
    )
    return {
        "epoch_s": dt,
        "edges_per_s": e / dt,
        "epoch_s_single_dispatch": dt_single,
        "num_edges": e,
    }


def bench_tgcn_epoch(cutoff=100):
    """TGCN regression epoch (fwd+bwd over all timesteps via lax.scan)."""
    import jax
    import jax.numpy as jnp
    import optax
    from stgraph_tpu import StaticGraph
    from stgraph_tpu.dataset import WindmillOutputDataLoader
    from stgraph_tpu.nn import TGCN

    wind = WindmillOutputDataLoader(size="small", lags=8, cutoff_time=cutoff)
    n = wind.gdata["num_nodes"]
    g = StaticGraph(wind.get_edges(), wind.get_edge_weights(), n)
    targets_np = np.stack(wind.get_all_targets()).astype(np.float32)  # (T, N)
    lags = 8
    t_steps = targets_np.shape[0] - lags
    # Window-building in numpy: eager device slicing would cost one tunnel
    # dispatch per timestep.
    feats = jnp.asarray(
        np.stack([targets_np[i : i + lags].T for i in range(t_steps)])
    )  # (T', N, lags)
    ys = jnp.asarray(targets_np[lags:])  # (T', N)
    ew = jnp.asarray(wind.get_edge_weights(), jnp.float32)

    model = TGCN(lags, 16)
    import flax.linen as fnn

    head = fnn.Dense(1)
    params = jax.jit(
        lambda k, x: model.init(k, g, x, edge_weight=ew)
    )(jax.random.key(0), feats[0])
    hp = jax.jit(head.init)(jax.random.key(1), jnp.zeros((n, 16)))

    @jax.jit
    def epoch(params, hp):
        def loss_fn(params, hp):
            def body(hidden, xy):
                x_t, y_t = xy
                hidden = model.apply(params, g, x_t, edge_weight=ew, hidden=hidden)
                y_hat = head.apply(hp, hidden)[:, 0]
                return hidden, jnp.mean((y_hat - y_t) ** 2)

            _, losses = jax.lax.scan(body, jnp.zeros((n, 16)), (feats, ys))
            return losses.mean()

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, hp)
        return loss

    dt = _bench(epoch, params, hp, iters=10, warmup=2)
    return {"tgcn_epoch_s": dt, "timesteps": int(t_steps)}


# Measured practical HBM bandwidth of the v5e chip (1 GB elementwise add,
# docs/PERF.md "Timing methodology" calibration).
_HBM_PRACTICAL_GBPS = 627.0


def emit(metric, value, unit, **extra):
    rec = {
        "metric": metric,
        "value": round(float(value), 1) if value >= 1 else float(value),
        "unit": unit,
        "vs_baseline": 1.0,
    }
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def bench_ogbn_spmm(scale=1.0):
    """Full-scale ogbn-products SpMM with locality reordering (one chip)."""
    import jax
    import jax.numpy as jnp
    from stgraph_tpu.dataset import OgbNodeDataLoader
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops import spmm_pallas

    d = OgbNodeDataLoader("ogbn-products", scale=scale, reorder=True)
    n, e = d.gdata["num_nodes"], d.gdata["num_edges"]
    ei = d.get_edge_index()
    csr = build_csr(ei[0], ei[1], n)
    csr_t = csr.transpose()
    _, _, cols_np, _ = csr.host_arrays()
    _, _, cols_t_np, _ = csr_t.host_arrays()
    sids = jax.device_put(np.minimum(cols_np, n - 1))
    sids_t = jax.device_put(np.minimum(cols_t_np, n - 1))
    rng = np.random.default_rng(0)
    h0 = jax.device_put(rng.standard_normal((n, 128)).astype(np.float32))
    fwd = jax.jit(
        lambda h, si, st: jnp.sum(
            spmm_pallas.spmm(csr, h, csr_t=csr_t, src_ids=si, src_ids_t=st),
            dtype=jnp.float32,
        )
    )
    _drain(fwd(h0, sids, sids_t))  # compile + warm
    t0 = time.perf_counter()
    _drain(fwd(h0, sids, sids_t))
    dt = max(time.perf_counter() - t0 - _rtt(), 1e-9)
    return {
        "ogbn_spmm_s": dt,
        "ogbn_spmm_edges_per_s": e / dt,
        "ogbn_num_edges": e,
        "synthetic": d.synthetic,
    }


def bench_ogbn_step(scale=1.0, hidden=128):
    """Full-scale ogbn-products 3-layer GCN TRAINING step (fwd+bwd).

    The honest first-class number (round-4 finding: locality reordering
    exactly swaps fwd/bwd SpMM cost, so it cannot improve this metric;
    measured base order). mp-edges/s counts 6 SpMMs per step, matching
    the round-3 convention."""
    import jax
    import jax.numpy as jnp
    import optax
    from stgraph_tpu.dataset import OgbNodeDataLoader
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops import spmm_pallas
    from stgraph_tpu.utils.norm import symmetric_norm

    d = OgbNodeDataLoader("ogbn-products", scale=scale)
    n, e = d.gdata["num_nodes"], d.gdata["num_edges"]
    f, classes = d.gdata["num_feats"], d.gdata["num_classes"]
    ei = d.get_edge_index()
    csr = build_csr(ei[0], ei[1], n)
    csr_t = csr.transpose()
    norm = np.asarray(symmetric_norm(csr))
    _, _, cols_np, _ = csr.host_arrays()
    _, _, cols_t_np, _ = csr_t.host_arrays()
    sids = jax.device_put(np.minimum(cols_np, n - 1))
    sids_t = jax.device_put(np.minimum(cols_t_np, n - 1))
    rng = np.random.default_rng(0)
    dims = [f, hidden, hidden, classes]
    params = {
        f"w{i}": jnp.asarray(
            rng.standard_normal((dims[i], dims[i + 1])) * 0.05, jnp.float32
        )
        for i in range(3)
    }
    xd = jax.device_put(d.get_all_features().astype(np.float32))
    yd = jax.device_put(d.get_all_targets())

    @jax.jit
    def step(p, xx, yy, si, st):
        def loss_fn(p):
            h = xx
            for i in range(3):
                h = (h @ p[f"w{i}"]) * norm
                h = spmm_pallas.spmm(
                    csr, h, csr_t=csr_t, src_ids=si, src_ids_t=st
                ) * norm
                if i < 2:
                    h = jax.nn.relu(h)
            return optax.softmax_cross_entropy_with_integer_labels(
                h, yy
            ).mean()

        return jax.value_and_grad(loss_fn)(p)

    loss, _ = step(params, xd, yd, sids, sids_t)
    _ = float(loss)  # compile + warm + drain
    t0 = time.perf_counter()
    loss, _ = step(params, xd, yd, sids, sids_t)
    _ = float(loss)
    dt = max(time.perf_counter() - t0 - _rtt(), 1e-9)
    return {
        "ogbn_step_s": dt,
        "ogbn_step_edges_per_s": 6 * e / dt,
        "ogbn_num_edges": e,
        "synthetic": d.synthetic,
    }


def bench_dyn(cap=2_200_000, nodes=1_100_000, slide=10_000, steps=64,
              f=128):
    """Dynamic-graph step at wiki-talk scale on the LAZY store (anti-log
    O(delta) updates, row-id-kernel aggregation) in one scan — the
    flagship DTDG path — plus the structure-update rate alone.

    Honesty notes (round 5): ``tail_capacity = 16*slide`` sets the
    compaction cadence to ~16 steps per store (per-step cost is O(delta)
    and does NOT scale with the tail — measured, docs/PERF.md round-5
    dynamic section), and ``steps=64`` makes the window long enough
    that the scan INCLUDES ~8 full compactions, so the published
    per-step number carries the amortized term. Deletes are drawn from
    a live-set simulation (contract: deletions name live edges);
    batches use (src, dst) column order — the pair API's argument order
    (advisor round 4: reversed order made every delete a silent no-op)."""
    import jax
    import jax.numpy as jnp
    from stgraph_tpu.ops.dyn_spmm import (
        apply_delta_lazy_pair,
        lazy_pair_from_edges,
        lazy_spmm,
    )
    from benchmarking.micro._workload import gen_delta_stream

    rng = np.random.default_rng(0)
    tcap = 16 * slide
    e0 = cap - tcap - 40_000
    keys = np.unique(
        rng.integers(0, nodes, e0 * 2).astype(np.int64) * nodes
        + rng.integers(0, nodes, e0 * 2)
    )[:e0]
    rows0 = (keys // nodes).astype(np.int32)
    cols0 = (keys % nodes).astype(np.int32)
    # The stream generator packs keys src-major; `keys` here is
    # dst-major (rows = dst) — repack so delete batches come out in the
    # pair API's (src, dst) order.
    keys_sd = cols0.astype(np.int64) * nodes + rows0
    adds, dels = gen_delta_stream(rng, keys_sd, nodes, steps, slide)
    pair0 = lazy_pair_from_edges(
        cols0, rows0, nodes, capacity=cap, tail_capacity=tcap
    )
    feats = jax.device_put(
        rng.standard_normal((nodes, f)).astype(np.float32)
    )
    adds_j, dels_j = jnp.asarray(adds), jnp.asarray(dels)

    @jax.jit
    def run_step(pair, feats, a, dl):
        def body(pair, xs):
            aa, dd = xs
            pair = apply_delta_lazy_pair(
                pair, aa[:, 0], aa[:, 1], dd[:, 0], dd[:, 1]
            )
            out = lazy_spmm(pair, feats)
            return pair, jnp.sum(out, dtype=jnp.float32)

        _, sums = jax.lax.scan(body, pair, (a, dl))
        return sums[-1]

    @jax.jit
    def run_updates(pair, a, dl):
        def body(pair, xs):
            aa, dd = xs
            pair = apply_delta_lazy_pair(
                pair, aa[:, 0], aa[:, 1], dd[:, 0], dd[:, 1]
            )
            return pair, pair.fwd.num_edges

        _, counts = jax.lax.scan(body, pair, (a, dl))
        return counts[-1]

    @jax.jit
    def run_agg(pair, feats):
        # Aggregation ALONE (fixed structure): the carry-dependent input
        # scale stops XLA hoisting the loop-invariant spmm out of the scan.
        def body(c, _):
            out = lazy_spmm(pair, feats * c)
            return 1.0 + 0.0 * jnp.sum(out, dtype=jnp.float32), ()

        c, _ = jax.lax.scan(
            body, jnp.float32(1.0), None, length=steps
        )
        return c

    _drain(run_step(pair0, feats, adds_j, dels_j))
    t0 = time.perf_counter()
    _drain(run_step(pair0, feats, adds_j, dels_j))
    dt_step = max(time.perf_counter() - t0 - _rtt(), 1e-9) / steps

    _drain(run_updates(pair0, adds_j, dels_j))
    t0 = time.perf_counter()
    _drain(run_updates(pair0, adds_j, dels_j))
    dt_upd = max(time.perf_counter() - t0 - _rtt(), 1e-9) / steps

    _drain(run_agg(pair0, feats))
    t0 = time.perf_counter()
    _drain(run_agg(pair0, feats))
    dt_agg = max(time.perf_counter() - t0 - _rtt(), 1e-9) / steps

    # Same-shape STATIC SpMM (N=1.1M table, 1.92M edges): the denominator
    # of the standing "dynamic aggregation within 2-3x of static" check.
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops import spmm_pallas

    csr = build_csr(cols0, rows0, nodes)
    csr_t = csr.transpose()

    @jax.jit
    def run_static(feats):
        def body(c, _):
            out = spmm_pallas.spmm(csr, feats * c, csr_t=csr_t)
            return 1.0 + 0.0 * jnp.sum(out, dtype=jnp.float32), ()

        c, _ = jax.lax.scan(
            body, jnp.float32(1.0), None, length=steps
        )
        return c

    _drain(run_static(feats))
    t0 = time.perf_counter()
    _drain(run_static(feats))
    dt_static = max(time.perf_counter() - t0 - _rtt(), 1e-9) / steps

    return {
        "dyn_step_s": dt_step,
        "dyn_spmm_edges_per_s": e0 / dt_step,
        "dyn_update_s": dt_upd,
        "dyn_updates_per_s": 2 * slide / dt_upd,
        "dyn_agg_s": dt_agg,
        "dyn_agg_edges_per_s": e0 / dt_agg,
        "static_same_shape_s": dt_static,
        "static_same_shape_edges_per_s": e0 / dt_static,
        "dyn_num_edges": e0,
    }


def bench_pallas_spmm(n=100_000, e=2_000_000, f=128):
    """Large-graph SpMM throughput (Pallas path on TPU, jnp elsewhere)."""
    import jax
    import jax.numpy as jnp
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops import message as M

    rng = np.random.default_rng(0)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    csr = build_csr(src, dst, n)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    h = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    if on_tpu:
        from stgraph_tpu.graph.blocked import build_blocked
        from stgraph_tpu.ops import spmm_pallas

        csr_t = build_csr(dst, src, n, capacity=csr.capacity)
        blocked = build_blocked(csr)
        blocked_t = build_blocked(csr_t)
        fn = jax.jit(
            lambda h: spmm_pallas.spmm(
                csr, h, blocked=blocked, blocked_t=blocked_t
            )
        )
    else:
        fn = jax.jit(lambda h: M.spmm(csr, h, impl="jnp"))
    dt = _bench(fn, h, iters=20, warmup=3)
    bytes_moved = e * 4 * (f + 2) + 2 * n * f * 4
    return {
        "spmm_s": dt,
        "spmm_edges_per_s": e / dt,
        "spmm_approx_gbps": bytes_moved / dt / 1e9,
    }


def bench_gat_layer(n=100_000, e=2_000_000, heads=8, f_in=64, f_out=32):
    """Large-graph GAT layer fwd+bwd (the scatter-free attention pipeline).

    Iterations are chained through a lax.scan whose carry folds in
    jnp.sum(out) — every element forced, so XLA cannot dead-code parts of
    the segmented pipeline (docs/PERF.md methodology note).
    """
    import jax
    import jax.numpy as jnp
    from stgraph_tpu import StaticGraph
    from stgraph_tpu.nn import GATConv

    rng = np.random.default_rng(0)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = StaticGraph(np.stack([src, dst], 1), None, n)
    x = jax.device_put(rng.standard_normal((n, f_in)).astype(np.float32))
    conv = GATConv(f_in, f_out, num_heads=heads, impl="sparse")
    params = jax.jit(lambda xx: conv.init(jax.random.key(0), g, xx))(x)
    iters = 10

    @jax.jit
    def run():
        def body(carry, _):
            def loss(p):
                return jnp.sum(conv.apply(p, g, x * carry) ** 2)

            grads = jax.grad(loss)(params)
            # Fold EVERY grad leaf into the carry: consuming only one
            # lets XLA DCE the backward stages that feed the others
            # (the flash-GAT bench shipped exactly that bug — the
            # attn_r gradient's backward pass vanished from the timed
            # program; docs/PERF.md round-5 GAT section).
            tot = sum(
                jnp.sum(l, dtype=jnp.float32)
                for l in jax.tree_util.tree_leaves(grads)
            )
            c = 1.0 + 0.0 * jax.lax.stop_gradient(tot)
            return c.astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    _drain(run())
    t0 = time.perf_counter()
    _drain(run())
    dt = max((time.perf_counter() - t0) - _rtt(), 1e-9) / iters
    return {"gat_fwd_bwd_s": dt, "gat_edges_per_s": e / dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--quick", action="store_true", help="skip secondary benches")
    ap.add_argument(
        "--ogbn-scale", type=float, default=1.0,
        help="ogbn-products synthetic scale for the large-graph metric",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: compiles dominate wall time over the
    # remote-TPU tunnel; cached executables make re-runs fast.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    # HEADLINE: the full-scale ogbn-products 3-layer GCN TRAINING step —
    # the honest device-bound flagship (round-4 verdict: the Cora metric
    # measures dispatch amortization at 10k edges; it stays below as a
    # clearly-labeled continuity line). Synthetic data is disk-cached, so
    # the dominant cost is one large compile.
    if not args.quick:
        try:
            os_ = bench_ogbn_step(scale=args.ogbn_scale)
            emit(
                "ogbn_gcn_step_edges_per_s", os_["ogbn_step_edges_per_s"],
                "mp-edges/s/chip",
                ogbn_step_s=os_["ogbn_step_s"],
                num_edges=os_["ogbn_num_edges"],
                synthetic=os_["synthetic"],
                reordered=False,
            )
        except Exception as exc:
            print(f"ogbn step bench failed: {exc}", file=sys.stderr)

    gcn = bench_gcn_fwd_bwd()
    emit(
        "gcn_fwd_bwd_edges_per_s",
        gcn["edges_per_s"],
        "edges/s/chip",
        epoch_s=gcn["epoch_s"],
        num_edges=gcn["num_edges"],
        dispatch_bound=True,  # 10.5k edges at ~100 us: measures launch
        # amortization, not device throughput — see the ogbn headline.
    )

    if args.quick:
        return
    try:
        tg = bench_tgcn_epoch()
        emit(
            "tgcn_epoch_s", tg["tgcn_epoch_s"], "s/epoch",
            timesteps=tg["timesteps"],
        )
    except Exception as exc:
        print(f"tgcn bench failed: {exc}", file=sys.stderr)
    try:
        sp = bench_pallas_spmm()
        bytes_moved = 2_000_000 * 4 * (128 + 2) + 2 * 100_000 * 128 * 4
        emit(
            "spmm_edges_per_s", sp["spmm_edges_per_s"], "edges/s/chip",
            spmm_s=sp["spmm_s"],
            fraction_of_hbm_peak=round(
                bytes_moved / sp["spmm_s"] / 1e9 / _HBM_PRACTICAL_GBPS, 3
            ),
        )
    except Exception as exc:
        print(f"spmm bench failed: {exc}", file=sys.stderr)
    try:
        ga = bench_gat_layer()
        # fwd+bwd HBM floor model: 2 gather-plane passes (fwd, bwd B;
        # the single-pass backward has no pass A — docs/PERF.md round-5
        # GAT section) of (E, H*F + side), each built (write) then
        # kernel-read — 4 plane traversals total.
        plane_bytes = 2_000_000 * (256 + 128) * 2  # bf16 stream
        emit(
            "gat_fwd_bwd_edges_per_s", ga["gat_edges_per_s"],
            "edges/s/chip",
            gat_fwd_bwd_s=ga["gat_fwd_bwd_s"],
            fraction_of_hbm_peak=round(
                4 * plane_bytes / ga["gat_fwd_bwd_s"] / 1e9
                / _HBM_PRACTICAL_GBPS,
                3,
            ),
        )
    except Exception as exc:
        print(f"gat bench failed: {exc}", file=sys.stderr)
    try:
        og = bench_ogbn_spmm(scale=args.ogbn_scale)
        bytes_og = og["ogbn_num_edges"] * 4 * (128 + 1)
        emit(
            "ogbn_spmm_edges_per_s", og["ogbn_spmm_edges_per_s"],
            "edges/s/chip",
            ogbn_spmm_s=og["ogbn_spmm_s"],
            num_edges=og["ogbn_num_edges"],
            synthetic=og["synthetic"],
            reordered=True,
            fraction_of_hbm_peak=round(
                bytes_og / og["ogbn_spmm_s"] / 1e9 / _HBM_PRACTICAL_GBPS, 3
            ),
        )
    except Exception as exc:
        print(f"ogbn bench failed: {exc}", file=sys.stderr)
    try:
        dy = bench_dyn()
        emit(
            "dyn_spmm_edges_per_s", dy["dyn_spmm_edges_per_s"],
            "edges/s/chip",
            dyn_step_s=dy["dyn_step_s"],
            num_edges=dy["dyn_num_edges"],
            includes_update=True,  # update + aggregation per scan step
        )
        emit(
            "dyn_agg_edges_per_s", dy["dyn_agg_edges_per_s"],
            "edges/s/chip",
            dyn_agg_s=dy["dyn_agg_s"],
            static_same_shape_edges_per_s=round(
                dy["static_same_shape_edges_per_s"], 1
            ),
            ratio_vs_static=round(
                dy["static_same_shape_edges_per_s"]
                / dy["dyn_agg_edges_per_s"],
                2,
            ),
        )
        emit(
            "dyn_updates_per_s", dy["dyn_updates_per_s"],
            "edge-updates/s/chip",
            dyn_update_s=dy["dyn_update_s"],
        )
    except Exception as exc:
        print(f"dyn bench failed: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
