"""Aggregate sweep CSVs into rich tables.

Role-parity with the reference's ``benchmarking/results/result_generator_static.py``
(parses result CSVs into rich tables grouped by dataset/sweep axis).

Usage: python result_generator.py [csv ...]
Defaults to every ``*.csv`` under this directory.
"""

from __future__ import annotations

import csv
import glob
import os
import sys

try:  # installed package (pip install -e .) or raw-checkout fallback
    import stgraph_tpu  # noqa: F401
except ImportError:
    sys.path.insert(
        0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    )

from stgraph_tpu.utils import DataTable


def render(path: str) -> None:
    with open(path, newline="") as fh:
        rows = list(csv.reader(fh))
    if len(rows) < 2:
        print(f"{path}: empty")
        return
    header, body = rows[0], rows[1:]
    # Group by dataset (first column) when present.
    groups: dict = {}
    for r in body:
        groups.setdefault(r[0], []).append(r)
    for name, rs in sorted(groups.items()):
        dt = DataTable(f"{os.path.basename(path)} — {name}", header[1:])
        for r in sorted(rs, key=lambda r: [_num(x) for x in r[1:]]):
            dt.add_row(r[1:])
        dt.display()


def _num(x: str):
    try:
        return float(x)
    except ValueError:
        return x


def main() -> None:
    paths = sys.argv[1:] or glob.glob(
        os.path.join(os.path.dirname(__file__), "**", "*.csv"), recursive=True
    )
    if not paths:
        print("no result CSVs found")
        return
    for p in paths:
        render(p)


if __name__ == "__main__":
    main()
