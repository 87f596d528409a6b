"""Contract-respecting dynamic-graph delta streams for the dyn benches.

``apply_delta*``'s contract: deletions name LIVE edges, additions are
new (or re-adds of deleted keys). Sampling deletes from the ORIGINAL
edge set every step violates that increasingly with window length
(~20% of deletes name already-deleted edges by step 40 at the wiki-talk
shape, ~80% by step 160) — harmless for op-cost measurement but wrong
as a workload. This generator maintains the live set host-side with a
swap-remove pool, so every delete names a live edge and every add is
genuinely absent.
"""

from __future__ import annotations

import numpy as np


def gen_delta_stream(
    rng: np.random.Generator,
    keys0: np.ndarray,  # (e0,) int64 packed src*nodes+dst, the live set
    nodes: int,
    steps: int,
    slide: int,
):
    """Returns (adds, dels) of shape (steps, slide, 2) int32 in
    (src, dst) column order — the lazy/PMA pair APIs' argument order."""
    cap0 = len(keys0) + steps * slide + 1
    pool = np.empty((cap0,), np.int64)
    pool[: len(keys0)] = keys0
    count = len(keys0)
    live = set(keys0.tolist())
    adds = np.full((steps, slide, 2), nodes, np.int32)
    dels = np.full((steps, slide, 2), nodes, np.int32)
    for t in range(steps):
        # Deletes: swap-remove `slide` distinct live keys from the pool.
        # (The pool may hold stale keys after re-adds; retry-skip them.)
        taken = 0
        while taken < slide:
            j = int(rng.integers(0, count))
            k = int(pool[j])
            count -= 1
            pool[j] = pool[count]
            if k in live:
                live.discard(k)
                dels[t, taken, 0] = k // nodes
                dels[t, taken, 1] = k % nodes
                taken += 1
        # Adds: fresh random keys not currently live.
        taken = 0
        while taken < slide:
            k = int(rng.integers(0, nodes)) * nodes + int(
                rng.integers(0, nodes)
            )
            if k not in live:
                live.add(k)
                pool[count] = k
                count += 1
                adds[t, taken, 0] = k // nodes
                adds[t, taken, 1] = k % nodes
                taken += 1
    return adds, dels
