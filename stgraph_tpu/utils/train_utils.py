"""Training-loop helpers: early stopping, accuracy.

Role-parity with the reference's benchmark utilities (early stopping with
best-params checkpointing, ``/root/reference/benchmarking/gat/seastar/utils.py``),
expressed over JAX pytrees instead of torch modules.
"""

from __future__ import annotations

from typing import Any, Optional

import jax

__all__ = ["EarlyStopping", "accuracy"]


class EarlyStopping:
    """Stop when the monitored score hasn't improved for ``patience`` steps.

    Keeps a copy of the best params in memory (the reference writes a
    ``es_checkpoint.pt`` file; use ``utils.Checkpointer`` for durable saves).
    """

    def __init__(self, patience: int = 10, verbose: bool = False) -> None:
        self.patience = patience
        self.verbose = verbose
        self.counter = 0
        self.best_score: Optional[float] = None
        self.best_params: Any = None
        self.early_stop = False

    def step(self, score: float, params: Any) -> bool:
        score = float(score)
        if self.best_score is None or score > self.best_score:
            self.best_score = score
            self.best_params = jax.tree_util.tree_map(lambda x: x, params)
            self.counter = 0
        else:
            self.counter += 1
            if self.verbose:
                print(f"EarlyStopping counter: {self.counter} / {self.patience}")
            if self.counter >= self.patience:
                self.early_stop = True
        return self.early_stop


def accuracy(logits, labels) -> float:
    """Mean top-1 accuracy of (N, C) logits against (N,) integer labels."""
    return float((logits.argmax(-1) == labels).mean())
