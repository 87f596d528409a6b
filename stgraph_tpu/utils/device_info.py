"""Device discovery & pretty-printed device properties.

Role-parity with the reference's ``DeviceInfo``
(``stgraph/compiler/code_gen/device_info.py:17-115``: compute-capability +
nvcc discovery, rich table of GPU properties). On TPU there is no external
compiler to locate; this reports what XLA exposes — platform, device kind,
core counts, HBM limits — for logs and bug reports.
"""

from __future__ import annotations

from typing import Dict, List

import jax

__all__ = ["DeviceInfo"]


class DeviceInfo:
    """Snapshot of the visible JAX devices."""

    def __init__(self) -> None:
        self.backend = jax.default_backend()
        self.devices = jax.devices()

    def rows(self) -> List[Dict[str, str]]:
        out = []
        for d in self.devices:
            try:
                stats = d.memory_stats() or {}
            except Exception:
                stats = {}
            out.append(
                {
                    "id": str(d.id),
                    "platform": d.platform,
                    "kind": getattr(d, "device_kind", "?"),
                    "process": str(getattr(d, "process_index", 0)),
                    "hbm_limit_gb": f"{stats.get('bytes_limit', 0) / 1e9:.1f}",
                    "hbm_in_use_mb": f"{stats.get('bytes_in_use', 0) / 1e6:.1f}",
                }
            )
        return out

    def log(self) -> None:
        from stgraph_tpu.utils.data_table import DataTable

        rows = self.rows()
        dt = DataTable(
            f"JAX devices (backend={self.backend})",
            ["id", "platform", "kind", "process", "hbm_limit_gb", "hbm_in_use_mb"],
        )
        for r in rows:
            dt.add_row([r[k] for k in dt.column_names])
        dt.display()
