"""Tests for the aux subsystems: checkpoint/resume, profiler, DataTable."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from stgraph_tpu.utils import Checkpointer, DataTable, profiler


def test_checkpoint_roundtrip(tmp_path):
    ckpt = Checkpointer(str(tmp_path), keep=2)
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": jnp.int32(7)}
    ckpt.save(7, state)
    restored = ckpt.restore(like=state)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3)
    )
    assert int(np.asarray(restored["step"])) == 7


def test_checkpoint_latest_and_retention(tmp_path):
    ckpt = Checkpointer(str(tmp_path), keep=2)
    state = {"x": jnp.zeros(3)}
    for s in (1, 2, 3):
        ckpt.save(s, {"x": jnp.full(3, float(s))})
    assert ckpt.latest_step() == 3
    assert ckpt.all_steps() == [2, 3]  # keep=2 retention
    restored = ckpt.restore(like=state)
    np.testing.assert_allclose(np.asarray(restored["x"]), 3.0)


def test_checkpoint_empty(tmp_path):
    assert Checkpointer(str(tmp_path)).restore() is None


def test_timer_sync():
    t = profiler.Timer()
    with t.time("fwd") as sync:
        sync.value = jnp.ones(8) * 2
    assert t.total("fwd") > 0
    assert t.summary()["fwd"]["count"] == 1


def test_trace_noop():
    with profiler.trace(None):
        pass


def test_device_memory_stats():
    stats = profiler.device_memory_stats()
    assert len(stats) >= 1
    for v in stats.values():
        assert set(v) == {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"}


def test_data_table_renders(capsys):
    dt = DataTable("title", ["a", "b"])
    dt.add_row(["1", "2"])
    dt.display()
    out = capsys.readouterr().out
    assert "1" in out and "2" in out


def test_device_fetch_roundtrip():
    from stgraph_tpu.utils import device_fetch, fetch_float

    assert fetch_float(jnp.float32(2.5)) == 2.5
    out = device_fetch(jnp.arange(4))
    np.testing.assert_array_equal(out, np.arange(4))
