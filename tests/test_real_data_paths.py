"""Exercise the REAL-data acquisition paths without egress.

The loaders' download/cache/parse code (``dataset/base.py``) normally
only runs against live URLs; in this environment every recorded run used
the synthetic fallback. These tests serve real-format JSON over local
HTTP (via ``STGRAPH_TPU_DATASET_MIRROR``) so ``urllib`` download, cache
write, cache reload, and the parse paths
(reference ``stgraph/dataset/stgraph_dataset.py:81-223``) all execute on
"real" (non-synthetic) data end to end — plus the OGB local-npz path.
"""

import http.server
import json
import threading

import numpy as np
import pytest

from stgraph_tpu.dataset.base import STGraphDataset


def _cora_payload():
    # Real cora.json schema: {"edges", "features", "labels"}.
    n, f, classes = 24, 10, 3
    rng = np.random.default_rng(1)
    edges = sorted({(int(i), int((i + 1) % n)) for i in range(n)}
                   | {(int(rng.integers(0, n)), int(rng.integers(0, n)))
                      for _ in range(40)})
    edges = [list(e) for e in edges if e[0] != e[1]]
    return {
        "edges": edges,
        "features": (rng.random((n, f)) < 0.2).astype(int).tolist(),
        "labels": rng.integers(0, classes, n).tolist(),
    }


def _wikimath_payload():
    # Real wikivital_mathematics.json schema:
    # {"edges", "weights", "time_periods", "<t>": {"y": [...]}}
    n, e, t = 16, 40, 12
    rng = np.random.default_rng(2)
    edges = sorted({(int(i), int((i + 1) % n)) for i in range(n)})
    while len(edges) < e:
        s, d = int(rng.integers(0, n)), int(rng.integers(0, n))
        if s != d and (s, d) not in edges:
            edges.append((s, d))
    data = {
        "edges": [list(x) for x in edges],
        "weights": rng.integers(1, 9, e).tolist(),
        "time_periods": t,
    }
    for i in range(t):
        data[str(i)] = {"y": rng.random(n).round(4).tolist()}
    return data


def _england_covid_payload():
    # Real england_covid.json schema: {"edge_mapping": {"edge_index",
    # "edge_weight"}, "y", "time_periods"}.
    n, t = 12, 10
    rng = np.random.default_rng(3)
    ei, ew = {}, {}
    for tt in range(t):
        edges = sorted({(int(i), int((i + 1) % n)) for i in range(n)}
                       | {(int(rng.integers(0, n)), int(rng.integers(0, n)))
                          for _ in range(10)})
        edges = [list(e) for e in edges if e[0] != e[1]]
        ei[str(tt)] = edges
        ew[str(tt)] = rng.random(len(edges)).round(5).tolist()
    return {
        "edge_mapping": {"edge_index": ei, "edge_weight": ew},
        "y": rng.random((t, n)).round(4).tolist(),
        "time_periods": t,
    }


@pytest.fixture
def dataset_mirror(tmp_path, monkeypatch):
    """Local HTTP server with real-format dataset JSON; fresh cache dir."""
    docroot = tmp_path / "docroot"
    docroot.mkdir()
    (docroot / "cora.json").write_text(json.dumps(_cora_payload()))
    (docroot / "wikivital_mathematics.json").write_text(
        json.dumps(_wikimath_payload())
    )
    (docroot / "england_covid.json").write_text(
        json.dumps(_england_covid_payload())
    )

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(docroot), **kw
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()

    # Fresh HOME => fresh ~/.stgraph cache; reset the process-wide offline
    # latch set by any earlier (fallback) loader construction.
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.setenv(
        "STGRAPH_TPU_DATASET_MIRROR",
        f"http://127.0.0.1:{srv.server_address[1]}",
    )
    monkeypatch.setattr(STGraphDataset, "_offline", False)
    yield srv
    srv.shutdown()


def test_cora_url_path(dataset_mirror, tmp_path):
    from stgraph_tpu.dataset import CoraDataLoader

    d = CoraDataLoader()
    assert d.synthetic is False  # took the real download path
    assert d.gdata["num_nodes"] == 24
    assert d.gdata["num_feats"] == 10
    assert d.gdata["num_classes"] == 3
    assert len(d.get_edges()) == d.gdata["num_edges"]
    # Cache file was written by the download path...
    cache = tmp_path / ".stgraph" / "dataset_cache" / "Cora.json"
    assert cache.exists()
    # ...and a second construction loads from cache, still non-synthetic.
    dataset_mirror.shutdown()
    d2 = CoraDataLoader()
    assert d2.synthetic is False
    assert d2.gdata == d.gdata


def test_cora_redownload(dataset_mirror):
    from stgraph_tpu.dataset import CoraDataLoader

    d1 = CoraDataLoader()
    d2 = CoraDataLoader(redownload=True)  # cache delete + re-fetch
    assert d2.synthetic is False
    assert d2.gdata == d1.gdata


def test_wikimath_url_path(dataset_mirror):
    from stgraph_tpu.dataset import WikiMathDataLoader

    d = WikiMathDataLoader(lags=4)
    assert d.synthetic is False
    assert d.gdata["total_timestamps"] == 12
    assert d.gdata["num_nodes"] == 16
    targets = d.get_all_targets()
    assert len(targets) == 12
    assert len(d.get_edge_weights()) == d.gdata["num_edges"]


def test_england_covid_url_path(dataset_mirror):
    from stgraph_tpu.dataset import EnglandCovidDataLoader

    d = EnglandCovidDataLoader(lags=4)
    assert d.synthetic is False
    assert d.gdata["total_timestamps"] == 10
    edges = d.get_edges()
    weights = d.get_edge_weights()
    assert len(edges) == 10
    for te, tw in zip(edges, weights):
        assert len(te) == len(tw)
        # parse kept the per-timestamp (dst, src) CSR presort
        keys = [(e[1], e[0]) for e in te]
        assert keys == sorted(keys)
    feats = d.get_all_features()
    assert len(feats) == 10 - 4
    assert feats[0].shape == (12, 4)


def test_ogb_npz_path(tmp_path):
    from stgraph_tpu.dataset import OgbNodeDataLoader

    rng = np.random.default_rng(4)
    n, e, f = 30, 90, 8
    np.savez(
        tmp_path / "ogbn-products.npz",
        edge_index=rng.integers(0, n, (2, e)).astype(np.int64),
        node_feat=rng.standard_normal((n, f)).astype(np.float32),
        labels=rng.integers(0, 5, n).astype(np.int64),
    )
    d = OgbNodeDataLoader(
        "ogbn-products", root=str(tmp_path), allow_synthetic=False
    )
    assert d.synthetic is False
    assert d.gdata["num_nodes"] == 30
    assert d.gdata["num_edges"] == 90
    assert d.get_all_features().shape == (30, 8)
