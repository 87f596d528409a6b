"""Analytic multi-chip scaling model from measured single-chip rates.

Real multi-chip hardware is not reachable from this environment, but the
ingredients of the BASELINE ">= 0.9 scaling efficiency" target are:

  * partition BALANCE — per-shard edge counts under destination-range
    ownership (``parallel/partition.py``'s rule);
  * comm VOLUME — halo rows per ring displacement (sum K_d), i.e. the
    distinct remote source rows each shard must receive per SpMM;
  * an efficiency model — per-shard compute time (local edges at the
    measured single-chip per-edge rate) vs halo-exchange time (comm
    bytes over ICI), with the interior/frontier overlap the distributed
    SpMM implements (``parallel/halo.py``: interior aggregation has no
    data dependency on the collectives).

Model:  T_P = max(t_interior, t_comm) + t_frontier
        efficiency(P) = T_1 / (P * T_P)

Two compute-rate scenarios bracket reality: the measured FULL-table
single-chip rate (pessimistic: a 1/P-size shard table gathers faster)
and the measured small-table rate (optimistic: the shard table fits
cache-friendlier working sets — the round-2 measurement at 5% scale).

Usage:
  python benchmarking/micro/scaling_model.py [--scale 1.0] [--shards 8]
      [--feat 128] [--ici-gbps 90]
      [--rate-full 85e6] [--rate-small 515e6]
"""

from __future__ import annotations

import argparse
import json
import sys

try:
    import stgraph_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, __file__.rsplit("/", 3)[0])

import numpy as np


def halo_stats(src, dst, num_nodes: int, p: int):
    """Balance + halo volumes under destination-range edge partitioning.

    Same ownership/halo math as ``parallel/partition.py:115-154`` without
    materializing CSRs (tractable at 1e8 edges)."""
    src = np.asarray(src, np.int64).reshape(-1)
    dst = np.asarray(dst, np.int64).reshape(-1)
    ns = -(-num_nodes // p)
    e_owner = dst // ns  # edge owner = dst range owner
    s_owner = src // ns
    edges_per_shard = np.bincount(e_owner, minlength=p)
    interior = np.bincount(e_owner[s_owner == e_owner], minlength=p)
    frontier = edges_per_shard - interior

    # K_d[q] = distinct remote src rows shard (q+d)%p needs from q.
    # Count distinct (receiver, source-row) pairs grouped by displacement.
    remote = s_owner != e_owner
    pair = np.unique(
        e_owner[remote] * np.int64(num_nodes + 1) + src[remote]
    )
    recv = pair // (num_nodes + 1)
    row = pair % (num_nodes + 1)
    d = (recv - row // ns) % p
    k_by_d = np.bincount(d, minlength=p)[1:]  # displacement 1..p-1
    # Per-shard distinct remote rows (the rows each RECEIVER must pull):
    # the efficiency model charges every shard ITS OWN volume, not the
    # average (round-4 verdict: contiguous dst ranges need not receive
    # evenly).
    halo_rows_each = np.bincount(recv, minlength=p)
    return {
        "edges_per_shard": edges_per_shard.tolist(),
        "interior_per_shard": interior.tolist(),
        "frontier_per_shard": frontier.tolist(),
        "k_by_displacement_total": k_by_d.tolist(),
        "halo_rows_per_shard": halo_rows_each.tolist(),
        "avg_halo_rows_per_shard": float(pair.shape[0] / p),
    }


def efficiency(stats, e_total: int, feat: int, rate_edges_s: float,
               ici_bytes_s: float, p: int):
    """Projected scaling efficiency for one SpMM under the overlap model."""
    per_edge = 1.0 / rate_edges_s
    t1 = e_total * per_edge
    worst = 0.0
    for pp in range(p):
        t_int = stats["interior_per_shard"][pp] * per_edge
        t_fro = stats["frontier_per_shard"][pp] * per_edge
        # Each shard is charged ITS OWN received-halo volume (per-shard
        # maxima fall out of the max over pp below).
        comm_bytes = stats["halo_rows_per_shard"][pp] * feat * 4
        t_comm = comm_bytes / ici_bytes_s
        worst = max(worst, max(t_int, t_comm) + t_fro)
    return t1 / (p * worst), worst, t1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--reorder", action="store_true")
    ap.add_argument(
        "--ici-gbps", type=float, default=90.0,
        help="effective per-chip ICI bandwidth for the ring exchange "
        "(GB/s); v5e has ~180 GB/s aggregate over 4 links, a "
        "bidirectional ring uses ~half",
    )
    ap.add_argument(
        "--rate-full", type=float, default=178e6,
        help="measured single-chip SpMM rate at the FULL 2.4M-row table "
        "(docs/PERF.md: post gather-cliff fix, BOTH directions, base "
        "order — round-4's 85e6 default predated the fix)",
    )
    ap.add_argument(
        "--rate-small", type=float, default=515e6,
        help="measured single-chip rate at a ~120k-row table (5% scale)",
    )
    args = ap.parse_args()

    from stgraph_tpu.dataset import OgbNodeDataLoader

    d = OgbNodeDataLoader("ogbn-products", scale=args.scale)
    n, e = d.gdata["num_nodes"], d.gdata["num_edges"]
    ei = d.get_edge_index()
    if args.reorder:
        # Locality reorder makes communities contiguous, which aligns them
        # with the destination-range ownership — shrinking the halo.
        from stgraph_tpu.graph.reorder import locality_order, relabel_edges

        order = locality_order(ei[0], ei[1], n)
        ei = relabel_edges(ei[0], ei[1], order)
    print(
        f"ogbn scale={args.scale}: N={n} E={e} reorder={args.reorder}",
        flush=True,
    )

    rows = []
    for p in (2, 4, args.shards):
        st = halo_stats(ei[0], ei[1], n, p)
        bal = max(st["edges_per_shard"]) / (e / p)
        eff_f, tp_f, t1_f = efficiency(
            st, e, args.feat, args.rate_full, args.ici_gbps * 1e9, p
        )
        eff_s, tp_s, t1_s = efficiency(
            st, e, args.feat, args.rate_small, args.ici_gbps * 1e9, p
        )
        # ICI sensitivity: the projection must survive a pessimistic link
        # budget (half) and show the optimistic one (double).
        ici_sweep = {
            f"{g:g}GBps": round(
                float(
                    efficiency(
                        st, e, args.feat, args.rate_full, g * 1e9, p
                    )[0]
                ),
                3,
            )
            for g in (args.ici_gbps / 2, args.ici_gbps, args.ici_gbps * 2)
        }
        row = {
            "shards": p,
            "edge_balance_max_over_mean": round(float(bal), 4),
            "max_halo_rows_per_shard": int(max(st["halo_rows_per_shard"])),
            "avg_halo_rows_per_shard": int(st["avg_halo_rows_per_shard"]),
            "max_halo_bytes_per_shard_f32": int(
                max(st["halo_rows_per_shard"]) * args.feat * 4
            ),
            "k_by_displacement": st["k_by_displacement_total"],
            "proj_efficiency_at_full_table_rate": round(float(eff_f), 3),
            "proj_efficiency_at_small_table_rate": round(float(eff_s), 3),
            "proj_efficiency_ici_sensitivity_full_rate": ici_sweep,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(
        "\nAssumptions: dst-range ownership; halo = distinct remote src "
        f"rows; ICI {args.ici_gbps} GB/s effective; overlap model "
        "T_P = max(t_interior, t_comm) + t_frontier "
        "(parallel/halo.py interior/frontier split). Rates: "
        f"full-table {args.rate_full/1e6:.0f}M edges/s, small-table "
        f"{args.rate_small/1e6:.0f}M edges/s (docs/PERF.md). The "
        "small-table rate is the relevant one at P >= 8: each shard's "
        "gather table is N/P rows — the locality-recovery argument of "
        "PERF.md's ogbn section.",
        flush=True,
    )


if __name__ == "__main__":
    main()
