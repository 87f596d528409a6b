"""SNAP temporal preprocessing: invariants of the sliding-window DTDG.

Mirrors what the reference asserts inside
``benchmarking/dataset/preprocessing/preprocess_temporal_data.py`` (dense
node relabeling, the carried+add-delete==snapshot invariant) plus replay
checks the reference leaves implicit.
"""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "preprocessing",
        os.path.join(_ROOT, "benchmarking", "dataset", "preprocessing.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def prep():
    return _load()


def test_parse_relabels_densely(prep):
    lines = ["100 7 1\n", "7 100 2\n", "9 100 3\n", "# comment\n"]
    edges, n = prep.parse_snap_stream(lines)
    assert n == 3
    # First-appearance order: 100 -> 0, 7 -> 1, 9 -> 2.
    assert edges.tolist() == [[0, 1], [1, 0], [2, 0]]


def test_parse_cutoff(prep):
    lines = [f"{i} {i + 1} {i}\n" for i in range(100)]
    edges, n = prep.parse_snap_stream(lines, cutoff_time=10)
    assert edges.shape[0] == 10
    assert n == 11


def test_sliding_window_replay_matches_definition(prep):
    """Replaying add/delete must reconstruct each timestamp's window set."""
    rng = np.random.default_rng(0)
    n = 50
    edges = rng.integers(0, n, (2000, 2), dtype=np.int64)
    base, delta = 500, 50
    out = prep.sliding_windows(edges, n, base, delta, delta, seed=0)
    gi = out["edge_mapping"]["edge_index"]
    t_count = out["time_periods"]
    assert t_count == 1 + (2000 - base) // delta

    keys = edges[:, 0] * n + edges[:, 1]
    current = set(map(tuple, np.asarray(gi["0"]["add"])))
    assert current == set(
        map(tuple, prep._unkey(np.unique(keys[:base]), n))
    )
    for t in range(1, t_count):
        upd = gi[str(t)]
        adds = set(map(tuple, upd["add"]))
        dels = set(map(tuple, upd["delete"]))
        assert not adds & current  # never re-add a present edge
        assert dels <= current  # never delete an absent edge
        current = (current | adds) - dels
        lo, hi = t * delta, min(base + t * delta, 2000)
        expect = set(map(tuple, prep._unkey(np.unique(keys[lo:hi]), n)))
        assert current == expect
        # One negative per added edge, none of them real edges of G_t.
        assert len(upd["neg"]) == len(upd["add"])
        assert not set(map(tuple, upd["neg"])) & current


def test_cli_synthetic_roundtrip(tmp_path):
    """End-to-end: synthesize a SNAP stream, preprocess, feed the dynamic
    driver's adapter."""
    out = tmp_path / "synth-snap.json"
    subprocess.run(
        [
            sys.executable,
            os.path.join(_ROOT, "benchmarking", "dataset", "preprocessing.py"),
            "--synthetic", "4000", "--base", "1000",
            "--percent-change", "10", "-o", str(out),
        ],
        check=True,
        capture_output=True,
    )
    data = json.loads(out.read_text())
    assert data["time_periods"] >= 2
    first = data["edge_mapping"]["edge_index"]["0"]
    assert first["add"] and not first["delete"]

    # The dynamic driver's adapter replays the update stream.
    spec = importlib.util.spec_from_file_location(
        "dyn_train",
        os.path.join(_ROOT, "benchmarking", "dynamic-temporal-tgcn", "train.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    d = mod._SyntheticDTDG(str(out), lags=2)
    assert d.gdata["num_nodes"] > 0
    assert len(d.get_edges()) == data["time_periods"]
    assert all(len(e) > 0 for e in d.get_edges())
