"""Synthetic dynamic-graph dataset builder.

Role-parity with the reference's
``benchmarking/dataset/dataset_builder/dataset_builder.py`` (random sparse
dynamic graphs with per-timestamp add/delete churn, written as JSON the
dynamic loaders understand: ``{"edge_mapping": {"edge_index": {t: [[u,v],…]}},
"time_periods": T}``), vectorized with numpy instead of per-edge Python.

Usage:
  python benchmarking/dataset/dataset_builder.py soorah -N 10000 -M 0.001 \
      -A 0.05 -D 0.05 -T 50 -o /tmp/soorah.json
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build(
    num_nodes: int,
    edge_multiplier: float,
    add_coeff: float,
    delete_coeff: float,
    timestamps: int,
    seed: int = 0,
    sparse: bool = False,
) -> dict:
    """``sparse=True`` interprets the multiplier as edges-per-node
    (``E = N * M``) — the reference's ``dataset_builder_modified.py``
    semantics for super-large sparse graphs; the default quadratic
    interpretation (``E = N^2 * M``) matches ``dataset_builder.py``."""
    rng = np.random.default_rng(seed)
    if sparse:
        target_edges = max(int(num_nodes * edge_multiplier), 1)
    else:
        target_edges = max(int(num_nodes * num_nodes * edge_multiplier), 1)

    def sample(k: int) -> np.ndarray:
        e = rng.integers(0, num_nodes, (int(k * 1.2) + 8, 2), dtype=np.int64)
        e = e[e[:, 0] != e[:, 1]]  # no self loops
        keys = e[:, 0] * num_nodes + e[:, 1]
        _, idx = np.unique(keys, return_index=True)
        return e[np.sort(idx)][:k]

    current = sample(target_edges)
    edge_index = {}
    weights = {}
    for t in range(timestamps):
        if t > 0:
            n_del = int(len(current) * delete_coeff)
            n_add = int(target_edges * add_coeff)
            keep = rng.permutation(len(current))[n_del:]
            current = np.concatenate([current[keep], sample(n_add)])
            # De-dup after the merge.
            keys = current[:, 0] * num_nodes + current[:, 1]
            _, idx = np.unique(keys, return_index=True)
            current = current[np.sort(idx)]
        edge_index[str(t)] = current.tolist()
        # STABLE per-key weights: an edge keeps its weight across the
        # snapshots it survives (a key-derived hash, not a fresh draw —
        # re-randomizing every timestamp turns EVERY edge into a
        # delete+add weight-update delta, which inflates the staged
        # delta arrays to all-edges size and, through them, the delta
        # stores' capacity: measured as a 31.7 GB scan program at the
        # 200k-edge wiki shape).
        k = current[:, 0] * np.int64(2654435761) + current[:, 1]
        weights[str(t)] = np.round(
            (k % 1000).astype(float) / 1999.0 + 0.5, 4
        ).tolist()

    return {
        "time_periods": timestamps,
        "edge_mapping": {"edge_index": edge_index, "edge_weight": weights},
    }


def main() -> None:
    ap = argparse.ArgumentParser("synthetic dynamic graph builder")
    ap.add_argument("dataset_name")
    ap.add_argument("-N", type=int, default=500, help="number of nodes")
    ap.add_argument("-M", type=float, default=0.2, help="edge density multiplier")
    ap.add_argument("-A", type=float, default=0.1, help="add coefficient per step")
    ap.add_argument("-D", type=float, default=0.1, help="delete coefficient per step")
    ap.add_argument("-T", type=int, default=25, help="timestamps")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--sparse", action="store_true",
        help="edges-per-node density (E = N*M) for super-large sparse "
        "graphs (reference dataset_builder_modified.py semantics)",
    )
    ap.add_argument("-o", "--out", default=None, help="output JSON path")
    args = ap.parse_args()

    data = build(
        args.N, args.M, args.A, args.D, args.T, args.seed,
        sparse=args.sparse,
    )
    out = args.out or f"{args.dataset_name}.json"
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(data, fh)
    sizes = [len(v) for v in data["edge_mapping"]["edge_index"].values()]
    print(
        f"{args.dataset_name}: N={args.N} T={args.T} "
        f"edges/t min={min(sizes)} max={max(sizes)} -> {out}"
    )


if __name__ == "__main__":
    main()
