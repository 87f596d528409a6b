"""Dataset loaders: shapes, gdata invariants, cache round-trip.

Mirrors the reference test strategy (``tests/dataset/``: exact
node/edge/feature counts per loader, lags and cutoff paths). Synthetic
fallbacks must reproduce the real datasets' documented sizes.
"""

import numpy as np
import pytest

from stgraph_tpu.dataset import (
    CoraDataLoader,
    EnglandCovidDataLoader,
    HungaryCPDataLoader,
    METRLADataLoader,
    MontevideoBusDataLoader,
    PedalMeDataLoader,
    WikiMathDataLoader,
    WindmillOutputDataLoader,
)


def test_cora_shapes():
    cora = CoraDataLoader()
    assert cora.gdata["num_nodes"] == 2708
    assert cora.gdata["num_edges"] == 10556
    assert cora.gdata["num_feats"] == 1433
    assert cora.gdata["num_classes"] == 7
    assert len(cora.get_edges()) == 10556
    assert cora.get_all_features().shape == (2708, 1433)
    assert cora.get_all_targets().shape == (2708,)


def test_cora_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    c1 = CoraDataLoader()
    assert c1._has_dataset_cache()
    c2 = CoraDataLoader()  # loads from cache
    assert np.array_equal(c1.get_all_targets(), c2.get_all_targets())


def test_hungary_shapes():
    h = HungaryCPDataLoader(lags=4)
    assert h.gdata["num_nodes"] == 20
    assert h.gdata["num_edges"] == 102
    assert h.gdata["total_timestamps"] == 521
    assert len(h.get_all_targets()) == 521 - 4
    assert h.get_all_targets()[0].shape == (20,)
    assert h.get_edge_weights().shape == (102,)


def test_hungary_cutoff():
    h = HungaryCPDataLoader(lags=4, cutoff_time=100)
    assert h.gdata["total_timestamps"] == 100
    assert len(h.get_all_targets()) == 96


def test_wikimath_shapes():
    w = WikiMathDataLoader(lags=8, cutoff_time=50)
    assert w.gdata["num_nodes"] == 1068
    assert w.gdata["num_edges"] == 27079
    assert w.gdata["total_timestamps"] == 50
    assert w.get_all_targets().shape == (50, 1068)
    assert w.get_edge_weights().shape == (27079,)


def test_pedalme_shapes():
    p = PedalMeDataLoader(lags=4)
    assert p.gdata["num_nodes"] == 15
    assert p.gdata["num_edges"] == 225
    assert p.gdata["total_timestamps"] == 36
    assert p.get_all_targets().shape == (32, 15)


def test_windmill_sizes():
    for size, n in [("small", 11), ("medium", 26)]:
        w = WindmillOutputDataLoader(size=size, cutoff_time=64)
        assert w.gdata["num_nodes"] == n
        assert w.gdata["num_edges"] == n * n
        assert len(w.get_all_targets()) == 64
        assert w.get_all_targets()[0].shape == (n,)


def test_windmill_bad_size():
    with pytest.raises(ValueError):
        WindmillOutputDataLoader(size="gigantic")


def test_montevideo_shapes():
    m = MontevideoBusDataLoader(lags=4, cutoff_time=60)
    assert m.gdata["num_nodes"] == 675
    assert m.gdata["num_edges"] == 690
    assert m.get_all_features().shape == (56, 675, 4)
    assert m.get_all_targets().shape == (56, 675)


def test_metrla_shapes():
    m = METRLADataLoader(num_timesteps_in=12, num_timesteps_out=12, cutoff_time=50)
    assert m.gdata["num_nodes"] == 207
    assert m.gdata["num_edges"] == 1722
    n_windows = 50 - 24 + 1
    assert m.get_all_features().shape == (n_windows, 207, 2, 12)
    assert m.get_all_targets().shape == (n_windows, 207, 12)


def test_england_covid_shapes():
    e = EnglandCovidDataLoader(lags=8)
    assert e.gdata["total_timestamps"] == 61
    assert len(e.get_edges()) == 61
    assert len(e.get_all_features()) == 61 - 8
    assert e.get_all_features()[0].shape == (129, 8)
    assert e.get_all_targets()[0].shape == (129,)
    # per-timestamp weights sorted to CSR (dst, src) order
    for t in range(3):
        edges = e.get_edges()[t]
        assert len(e.get_edge_weights()[t]) == len(edges)
        keys = [(d, s) for s, d in edges]
        assert keys == sorted(keys)


def test_synthetic_flag_set_offline():
    c = CoraDataLoader()
    # In the air-gapped test env the download must have fallen back.
    assert isinstance(c.synthetic, bool)


def test_pubmed_loader_shapes():
    from stgraph_tpu.dataset import PubmedDataLoader

    d = PubmedDataLoader()
    assert d.gdata["num_edges"] == 88648
    assert d.gdata["num_feats"] == 500
    assert d.gdata["num_classes"] == 3
    assert d.get_all_features().shape == (19717, 500)
    assert len(d.get_edges()) == 88648
