"""Synthetic STATIC-temporal dataset builder (fixed graph, per-t features).

Role-parity with the reference's
``benchmarking/dataset/dataset_builder/dataset_builder_static.py``: one
fixed random sparse edge set with integer weights plus per-timestamp
``y`` feature vectors, written as the JSON schema the static-temporal
loaders consume (``{"edges", "weights", "time_periods", "<t>": {"y"}}``
— the WikiMath/Windmill layout). Vectorized with numpy.

Usage:
  python benchmarking/dataset/dataset_builder_static.py mathjax \
      -N 1000 -M 0.01 -T 50 -o /tmp/mathjax.json
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_static(
    num_nodes: int,
    edge_multiplier: float,
    timestamps: int,
    seed: int = 0,
) -> dict:
    rng = np.random.default_rng(seed)
    target_edges = max(int(num_nodes * num_nodes * edge_multiplier), 1)
    e = rng.integers(
        0, num_nodes, (int(target_edges * 1.3) + 8, 2), dtype=np.int64
    )
    e = e[e[:, 0] != e[:, 1]]
    keys = e[:, 0] * num_nodes + e[:, 1]
    _, idx = np.unique(keys, return_index=True)
    e = e[np.sort(idx)][:target_edges]

    data: dict = {
        "edges": e.tolist(),
        "weights": rng.integers(1, 20, len(e)).tolist(),
        "time_periods": timestamps,
    }
    # AR(1)-style feature walk so consecutive timestamps correlate, as
    # page-view-like series do.
    y = rng.random(num_nodes)
    for t in range(timestamps):
        y = 0.8 * y + 0.2 * rng.random(num_nodes)
        data[str(t)] = {"y": np.round(y, 5).tolist()}
    return data


def main() -> None:
    ap = argparse.ArgumentParser("synthetic static-temporal graph builder")
    ap.add_argument("dataset_name")
    ap.add_argument("-N", type=int, default=500, help="number of nodes")
    ap.add_argument(
        "-M", type=float, default=0.01, help="edge density multiplier (N^2 M)"
    )
    ap.add_argument("-T", type=int, default=25, help="timestamps")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--out", default=None, help="output JSON path")
    args = ap.parse_args()

    data = build_static(args.N, args.M, args.T, args.seed)
    out = args.out or f"{args.dataset_name}.json"
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(data, fh)
    print(
        f"{args.dataset_name}: N={args.N} E={len(data['edges'])} "
        f"T={args.T} -> {out}"
    )


if __name__ == "__main__":
    main()
