"""SNAP temporal edge streams -> per-timestamp DTDG update JSON.

Role-parity with the reference's
``benchmarking/dataset/preprocessing/preprocess_temporal_data.py``: consume
a raw SNAP stream (``src dst [timestamp]`` per line, e.g. sx-mathoverflow or
wiki-talk-temporal), keep the first ``--cutoff-time`` interactions, relabel
node ids densely in first-appearance order, then slide a window over the
stream — a ``--base``-edge snapshot at t=0, then per timestamp ``add_delta``
new edges enter and ``delete_delta`` old edges leave, where both deltas are
``base * percent_change / 200`` (the reference's split of the percent change
half to adds, half to deletes). Each timestamp also gets ``neg`` negative
samples (non-edges), one per added edge, for link-prediction training.

Output schema (the reference's):

    {"edge_mapping": {"edge_index": {
        "0": {"add": [[u, v], ...], "delete": [], "neg": []},
        "1": {"add": ..., "delete": ..., "neg": ...}, ...}},
     "time_periods": T}

The snapshot at time t is defined as the de-duplicated edge set of stream
positions ``[t * delete_delta, base + t * add_delta)``; ``add`` and
``delete`` are exactly the sets that transform snapshot t-1 into snapshot t
(duplicates inside the stream make the windows overlap, so the naive window
difference over-counts — the reference fixes this with two set differences,
reproduced here with vectorized numpy set algebra over packed int64 keys
instead of Python sets over tuples).

The environment has no egress, so ``--synthetic N`` generates a
SNAP-format stream first (power-law sources, timestamp-sorted) and then
preprocesses it — the "replayed synthetic SNAP-format" path.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def parse_snap_stream(lines, cutoff_time: int = sys.maxsize):
    """First ``cutoff_time`` interactions, node ids densely relabeled in
    first-appearance order (reference: ``parse_txt_lines``)."""
    src, dst = [], []
    for line in lines:
        if len(src) >= cutoff_time:
            break
        parts = line.split()
        if len(parts) < 2 or parts[0].startswith(("#", "%")):
            continue
        src.append(int(parts[0]))
        dst.append(int(parts[1]))
    raw = np.stack(
        [np.asarray(src, np.int64), np.asarray(dst, np.int64)], axis=1
    )
    # Dense relabel by first appearance across the interleaved (src, dst)
    # stream — matches the reference's per-line counter exactly.
    flat = raw.reshape(-1)
    uniq, first_pos = np.unique(flat, return_index=True)
    order = np.argsort(first_pos, kind="stable")
    remap = np.empty(uniq.shape[0], np.int64)
    remap[order] = np.arange(uniq.shape[0])
    lut = dict(zip(uniq.tolist(), remap.tolist()))
    edges = np.vectorize(lut.__getitem__, otypes=[np.int64])(raw)
    return edges, int(uniq.shape[0])


def _key(e: np.ndarray, n: int) -> np.ndarray:
    return e[:, 0] * np.int64(n) + e[:, 1]


def _unkey(k: np.ndarray, n: int) -> np.ndarray:
    return np.stack([k // n, k % n], axis=1)


def _sample_negatives(count: int, graph_keys: np.ndarray, n: int, rng):
    """``count`` distinct non-edges of snapshot ``graph_keys`` (rejection
    sampling, vectorized)."""
    found = np.empty(0, np.int64)
    while found.shape[0] < count:
        want = (count - found.shape[0]) * 2 + 8
        cand = rng.integers(0, n, (want, 2), dtype=np.int64)
        keys = _key(cand, n)
        keys = keys[~np.isin(keys, graph_keys)]
        found = np.unique(np.concatenate([found, keys]))
    return _unkey(found[:count], n)


def sliding_windows(
    edges: np.ndarray,
    num_nodes: int,
    base: int,
    add_delta: int,
    delete_delta: int,
    seed: int = 0,
):
    """Per-timestamp {add, delete, neg} dicts (reference:
    ``preprocess_graph``), as numpy set algebra over packed keys."""
    n = num_nodes
    rng = np.random.default_rng(seed)
    keys = _key(edges, n)
    e_total = keys.shape[0]

    graphs = {
        "0": {
            "add": _unkey(np.unique(keys[:base]), n).tolist(),
            "delete": [],
            "neg": [],
        }
    }
    add_ptr, del_ptr, t = base, 0, 1
    while add_ptr < e_total:
        hi = min(add_ptr + add_delta, e_total)
        graph_t = np.unique(keys[del_ptr + delete_delta : hi])
        carried = np.unique(keys[del_ptr:add_ptr])
        # Adds: fresh window minus what the carried-over portion already has.
        adds = np.setdiff1d(np.unique(keys[add_ptr:hi]), carried)
        adds = adds[np.isin(adds, graph_t)]  # guard dup-only windows
        # Deletes: the dropped window minus edges still present at t.
        drops = np.setdiff1d(
            np.unique(keys[del_ptr : del_ptr + delete_delta]), graph_t
        )
        # Invariant the reference asserts: |carried| + |add| - |del| == |G_t|.
        assert carried.shape[0] + adds.shape[0] - drops.shape[0] == graph_t.shape[0]
        graphs[str(t)] = {
            "add": _unkey(adds, n).tolist(),
            "delete": _unkey(drops, n).tolist(),
            "neg": _sample_negatives(adds.shape[0], graph_t, n, rng).tolist(),
        }
        add_ptr += add_delta
        del_ptr += delete_delta
        t += 1
    return {
        "edge_mapping": {"edge_index": graphs},
        "time_periods": t,
    }


def synthesize_snap_stream(
    num_events: int, num_nodes: int, seed: int = 0
) -> list[str]:
    """SNAP-format lines (``src dst unixtime``) with power-law-ish source
    activity — shaped like sx-mathoverflow for egress-free testing."""
    rng = np.random.default_rng(seed)
    # Zipf-weighted endpoints: a few hub users dominate, like real streams.
    ranks = np.arange(1, num_nodes + 1, dtype=np.float64)
    p = (1.0 / ranks) / np.sum(1.0 / ranks)
    perm = rng.permutation(num_nodes)
    src = perm[rng.choice(num_nodes, num_events, p=p)]
    dst = perm[rng.choice(num_nodes, num_events, p=p)]
    fix = src == dst
    dst[fix] = (dst[fix] + 1) % num_nodes
    ts = np.sort(rng.integers(1_250_000_000, 1_450_000_000, num_events))
    return [f"{s} {d} {t}\n" for s, d, t in zip(src, dst, ts)]


def main() -> None:
    ap = argparse.ArgumentParser("Preprocess SNAP temporal data")
    ap.add_argument("--dataset", type=str, default="", help="stream name; reads <name>.txt")
    ap.add_argument("--base", type=int, default=0, help="edges in the base graph")
    ap.add_argument(
        "--percent-change", type=float, default=5,
        help="percent of base churned per timestamp (half adds, half deletes)",
    )
    ap.add_argument("--cutoff-time", type=int, default=sys.maxsize)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--synthetic", type=int, default=0,
        help="generate an N-event synthetic SNAP stream instead of reading "
        "<dataset>.txt (this environment has no network egress)",
    )
    ap.add_argument("--synthetic-nodes", type=int, default=0)
    ap.add_argument("-o", "--out", type=str, default="")
    args = ap.parse_args()

    if args.synthetic:
        nn = args.synthetic_nodes or max(args.synthetic // 40, 16)
        lines = synthesize_snap_stream(args.synthetic, nn, args.seed)
    else:
        with open(f"{args.dataset}.txt") as fh:
            lines = fh.readlines()
    edges, num_nodes = parse_snap_stream(lines, args.cutoff_time)
    delta = int(args.base * (args.percent_change / 200))
    graph_json = sliding_windows(
        edges, num_nodes, args.base, delta, delta, args.seed
    )
    out = args.out or f"{args.dataset}-data-{args.percent_change}.json"
    with open(out, "w") as fh:
        json.dump(graph_json, fh)
    print(
        f"{out}: {graph_json['time_periods']} timestamps, "
        f"{num_nodes} nodes, base {args.base}, delta {delta}"
    )


if __name__ == "__main__":
    main()
