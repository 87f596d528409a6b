"""Profiling & timing utilities (net-new vs the reference).

The reference has no profiler subsystem — only ad-hoc ``time.time()``
deltas in training scripts and fwd/bwd/move counters inside
``DynamicGraph`` (SURVEY §5.1, reference ``dynamic_graph.py:50-52``). This
module centralizes:

* ``Timer`` — named wall-clock accumulators with ``block_until_ready``
  semantics (device work must be drained before reading the clock);
* ``trace`` — context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory when available, no-op otherwise;
* ``device_memory_stats`` — per-device live/peak HBM bytes where the backend
  exposes them (TPU does; CPU returns zeros).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

__all__ = ["Timer", "trace", "device_memory_stats"]


class Timer:
    """Named accumulating wall-clock timers.

    ``with timer.time("fwd", sync=out): ...`` adds to the "fwd" bucket;
    passing ``sync`` block_until_ready's it before stopping the clock so
    async dispatch doesn't flatter the number.
    """

    def __init__(self) -> None:
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        holder = _SyncHolder()
        try:
            yield holder
        finally:
            if holder.value is not None:
                jax.block_until_ready(holder.value)
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def total(self, name: str) -> float:
        return self._total[name]

    def mean(self, name: str) -> float:
        c = self._count[name]
        return self._total[name] / c if c else 0.0

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self._total[k], "count": self._count[k],
                "mean_s": self.mean(k)}
            for k in sorted(self._total)
        }

    def reset(self) -> None:
        self._total.clear()
        self._count.clear()


class _SyncHolder:
    """Mutable cell: set ``.value`` to the arrays to drain before stop."""

    value = None


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """Profile the enclosed block with jax.profiler when a logdir is given.

    Usage: ``with profiler.trace("/tmp/tb"): train_step(...)``. View with
    TensorBoard's profile plugin. No-op (plain timing scope) when logdir is
    None or the profiler backend is unavailable.
    """
    if logdir is None:
        yield
        return
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """{device: {bytes_in_use, peak_bytes_in_use, bytes_limit}} when exposed."""
    out: Dict[str, Dict[str, int]] = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        out[str(d)] = {
            "bytes_in_use": int(stats.get("bytes_in_use", 0)),
            "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", 0)),
            "bytes_limit": int(stats.get("bytes_limit", 0)),
        }
    return out
