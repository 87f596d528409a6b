"""Persistent XLA compilation cache setup.

One call near process start makes every jitted program's executable
persist under a cache dir, so reruns skip compilation — which dominates
wall-clock on remote-TPU tunnels (first compiles run 10s–minutes there).
"""

from __future__ import annotations

import os

__all__ = ["setup_compilation_cache"]


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent compilation cache (idempotent, best-effort)."""
    import jax

    path = path or os.environ.get(
        "STGRAPH_TPU_CACHE_DIR", os.path.expanduser("~/.stgraph_tpu/jax_cache")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

