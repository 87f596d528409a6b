"""Multi-host initialization for pod-slice training.

On a TPU pod slice each host sees only its local chips until
``jax.distributed.initialize()`` runs; afterwards ``jax.devices()`` spans
the slice and every jitted/shard_map program is SPMD across hosts.

Usage (same script launched on every host of the slice)::

    from stgraph_tpu.parallel import launch
    launch.initialize()              # env-driven; no-op on single host
    mesh = make_mesh()               # now spans all hosts' chips
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["initialize", "is_multihost", "process_info"]

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Best-effort ``jax.distributed.initialize`` (idempotent).

    With no arguments, relies on the TPU environment's auto-detection
    (metadata on Cloud TPU VMs) or the standard ``JAX_COORDINATOR_ADDRESS``
    / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` variables. Silently no-ops
    on single-host setups where initialization is unnecessary.
    """
    global _initialized
    if _initialized:
        return
    import jax

    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = coordinator_address or os.environ.get(
            "JAX_COORDINATOR_ADDRESS"
        )
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"]
        )
    if process_id is not None or os.environ.get("JAX_PROCESS_ID") is not None:
        kwargs["process_id"] = int(
            process_id
            if process_id is not None
            else os.environ["JAX_PROCESS_ID"]
        )
    try:
        jax.distributed.initialize(**kwargs)
        _initialized = True
    except Exception:
        if kwargs:
            # Explicit multi-host config that failed must not silently
            # degrade to single-host training — re-raise for diagnosis and
            # leave _initialized unset so a corrected retry works.
            raise
        # No config given (plain single-host run): proceed with the local
        # devices.
        _initialized = True


def is_multihost() -> bool:
    import jax

    return jax.process_count() > 1


def process_info() -> dict:
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
