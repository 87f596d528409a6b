"""Timeout-guarded device→host fetches.

On remote-TPU tunnels the device→host path can wedge indefinitely while
compile/execute/h2d stay healthy (docs/PERF.md). ``device_fetch`` pulls a
value with a hard timeout by running the blocking read in a daemon thread;
after the first timeout a process-wide flag short-circuits later fetches so
a training loop degrades to "metrics n/a" instead of hanging.
"""

from __future__ import annotations

import threading
from typing import Any, Optional

import numpy as np

__all__ = ["device_fetch", "fetch_float", "d2h_available"]

_broken = False
_lock = threading.Lock()


def d2h_available() -> bool:
    return not _broken


def device_fetch(x: Any, timeout_s: float = 30.0) -> Optional[np.ndarray]:
    """``np.asarray(x)`` with a timeout; None on timeout (and thereafter).

    Waits for the computation itself (``block_until_ready``) *outside* the
    timeout, so the timeout measures only the transfer — otherwise a slow
    first compile would falsely latch the broken flag.
    """
    global _broken
    if _broken:
        return None
    if isinstance(x, np.ndarray):
        return x
    try:
        import jax

        jax.block_until_ready(x)
    except Exception:
        pass
    box = {}

    def worker():
        try:
            box["v"] = np.asarray(x)
        except Exception as exc:  # surface as a failed fetch
            box["e"] = exc

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        with _lock:
            _broken = True
        return None
    if "e" in box:
        raise box["e"]
    return box.get("v")


def fetch_float(x: Any, timeout_s: float = 30.0) -> float:
    """Scalar fetch; NaN when the device→host path is unavailable."""
    v = device_fetch(x, timeout_s)
    return float(v) if v is not None else float("nan")
