"""Distributed GCN scaling benchmark: 1 → N devices over a mesh.

The scale-out harness for the net-new distribution layer (the reference is
single-GPU; SURVEY §2.6). Edge-partitions a synthetic power-law graph
(ogbn-products-like at full scale), shards node features by destination
range, and times the full jitted training step — halo all_to_all + local
SpMM + dense layers + optax — per device count.

On a real pod slice this measures ICI scaling; on a dev box it validates
the sharding path on virtual CPU devices
(``--force-cpu-devices 8`` sets ``xla_force_host_platform_device_count``).

Usage:
  python benchmarking/dist/train.py --nodes 100000 --edges 2000000 \
      --device-counts 1,2,4,8 --force-cpu-devices 8
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


def build_step(mesh, dg, x, y, norm, params, opt):
    import jax
    import jax.numpy as jnp
    import optax

    from stgraph_tpu.parallel import dist_spmm

    def model(p, h):
        for i in range(len(p) // 2):
            h = (h @ p[f"w{i}"] + p[f"b{i}"]) * norm
            h = dist_spmm(mesh, dg, h) * norm
            if i < len(p) // 2 - 1:
                h = jax.nn.relu(h)
        return h

    @jax.jit
    def train_step(p, opt_state):
        def loss_fn(p):
            logits = model(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(p, updates), opt_state, loss

    return train_step


def run_once(num_devices: int, args) -> dict:
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from stgraph_tpu.parallel import partition_edges, shard_node_array

    devices = jax.devices()[:num_devices]
    if len(devices) < num_devices:
        raise RuntimeError(f"only {len(devices)} devices visible")
    mesh = Mesh(np.asarray(devices), ("graph",))

    rng = np.random.default_rng(0)
    hidden = args.hidden
    if args.dataset:
        # OGB loader: real files when present, scale-faithful synthetic
        # otherwise (prints which — synthetic numbers must be labeled).
        from stgraph_tpu.dataset import OgbNodeDataLoader

        d = OgbNodeDataLoader(args.dataset, scale=args.scale)
        print(
            f"dataset {args.dataset} "
            f"({'SYNTHETIC fallback' if d.synthetic else 'real files'}): "
            f"{d.gdata}"
        )
        n = d.gdata["num_nodes"]
        e = d.gdata["num_edges"]
        f = d.gdata["num_feats"]
        classes = d.gdata["num_classes"]
        edges = d.get_edges()
        src, dst = edges[:, 0], edges[:, 1]
        feats = d.get_all_features()
        labels = d.get_all_targets()
    else:
        n, e, f, classes = args.nodes, args.edges, args.feat, 16
        # Power-law-ish sources (hubs), uniform destinations.
        src = (n * rng.power(2.5, e)).astype(np.int64) % n
        dst = rng.integers(0, n, e)
        feats = rng.standard_normal((n, f)).astype(np.float32)
        labels = rng.integers(0, classes, n)

    t0 = time.perf_counter()
    dg = partition_edges(src, dst, n, num_devices)
    partition_s = time.perf_counter() - t0

    x = shard_node_array(mesh, jnp.asarray(feats, jnp.float32), dg)
    y_pad = np.zeros(dg.padded_nodes, np.int64)
    y_pad[:n] = labels
    y = jax.device_put(
        jnp.asarray(y_pad), NamedSharding(mesh, P("graph"))
    )
    norm = shard_node_array(
        mesh, jnp.asarray(rng.random((n, 1)) + 0.5, jnp.float32), dg
    )
    dims = [f] + [hidden] * (args.layers - 1) + [classes]
    params = jax.device_put(
        {
            **{
                f"w{i}": jnp.asarray(
                    rng.standard_normal((dims[i], dims[i + 1])) * 0.1, jnp.float32
                )
                for i in range(args.layers)
            },
            **{
                f"b{i}": jnp.zeros((dims[i + 1],), jnp.float32)
                for i in range(args.layers)
            },
        },
        NamedSharding(mesh, P()),
    )
    opt = optax.adam(1e-2)
    opt_state = jax.jit(opt.init)(params)

    step = build_step(mesh, dg, x, y, norm, params, opt)
    params, opt_state, loss = step(params, opt_state)  # compile
    jax.block_until_ready(loss)

    iters = args.iters
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters

    return {
        "devices": num_devices,
        "step_s": dt,
        "edges_per_s": e / dt,
        "halo_rows": dg.halo_total,
        "partition_s": partition_s,
        "loss": float(loss),
    }


def main() -> None:
    ap = argparse.ArgumentParser("distributed GCN scaling")
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=3,
                    help="GCN depth (BASELINE config: 3-layer)")
    ap.add_argument("--preset", default=None, choices=[None, "ogbn-products"],
                    help="ogbn-products scale: N=2.45M, E=61.9M, F=100")
    ap.add_argument("--dataset", default=None,
                    choices=[None, "ogbn-products", "ogbn-arxiv"],
                    help="load an OGB dataset (local files, or a "
                         "scale-faithful synthetic fallback)")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="synthetic-fallback shrink factor for --dataset")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--device-counts", default="1,2,4,8")
    ap.add_argument(
        "--force-cpu-devices",
        type=int,
        default=0,
        help="simulate N virtual CPU devices",
    )
    args = ap.parse_args()
    if args.preset == "ogbn-products":
        args.nodes, args.edges, args.feat = 2_449_029, 61_859_140, 100

    if args.force_cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    from stgraph_tpu.utils import DataTable

    counts = [int(c) for c in args.device_counts.split(",")]
    dt = DataTable(
        f"distributed GCN step (N={args.nodes}, E={args.edges}, F={args.feat})",
        ["devices", "step_ms", "edges/s", "speedup", "halo_rows", "partition_s"],
    )
    base = None
    for c in counts:
        r = run_once(c, args)
        if base is None:
            base = r["step_s"]
        dt.add_row(
            [
                r["devices"],
                f"{r['step_s'] * 1e3:.2f}",
                f"{r['edges_per_s']:.3g}",
                f"{base / r['step_s']:.2f}x",
                r["halo_rows"],
                f"{r['partition_s']:.2f}",
            ]
        )
        print(f"devices={c}: {r['step_s']*1e3:.2f} ms/step", file=sys.stderr)
    dt.display()


if __name__ == "__main__":
    main()
