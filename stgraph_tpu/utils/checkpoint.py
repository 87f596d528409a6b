"""Checkpoint/resume for training state (net-new vs the reference).

The reference has no model save/load anywhere (SURVEY §5.4 — training
scripts run fixed-epoch and exit). This module adds orbax-backed
checkpointing of arbitrary JAX pytrees (params + optimizer state + step),
with a pure-numpy ``.npz`` fallback when orbax is unavailable, so resume
works in every environment the framework runs in.

Usage::

    ckpt = Checkpointer("/tmp/run1")
    ckpt.save(step, {"params": params, "opt_state": opt_state})
    state = ckpt.restore()           # latest, or None if empty
    state = ckpt.restore(step=120)   # specific step
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["Checkpointer"]


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


class Checkpointer:
    """Step-indexed checkpoint directory with keep-last-k retention."""

    def __init__(self, directory: str, keep: int = 3, use_orbax: str = "auto"):
        self._dir = os.path.abspath(directory)
        self._keep = keep
        os.makedirs(self._dir, exist_ok=True)
        self._orbax = None
        if use_orbax in ("auto", "yes"):
            try:
                import orbax.checkpoint as ocp

                self._orbax = ocp
            except Exception:
                if use_orbax == "yes":
                    raise

    # -- paths -----------------------------------------------------------
    def _step_dir(self, step: int) -> str:
        return os.path.join(self._dir, f"step_{step:010d}")

    def all_steps(self):
        out = []
        for name in os.listdir(self._dir):
            m = re.fullmatch(r"step_(\d+)", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    # -- save/restore ----------------------------------------------------
    def save(self, step: int, state: Any) -> str:
        path = self._step_dir(step)
        if self._orbax is not None:
            ckptr = self._orbax.PyTreeCheckpointer()
            ckptr.save(os.path.join(path, "tree"), state, force=True)
        else:
            os.makedirs(path, exist_ok=True)
            leaves, treedef = _flatten(state)
            np.savez(
                os.path.join(path, "leaves.npz"),
                **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
            )
            with open(os.path.join(path, "treedef.json"), "w") as f:
                json.dump({"treedef": str(treedef)}, f)
        self._gc()
        return path

    def restore(self, step: Optional[int] = None, like: Any = None) -> Optional[Any]:
        """Restore step (default latest). ``like`` supplies the pytree
        structure for the npz fallback (required there, optional for orbax)."""
        if step is None:
            step = self.latest_step()
            if step is None:
                return None
        path = self._step_dir(step)
        if self._orbax is not None and os.path.isdir(os.path.join(path, "tree")):
            ckptr = self._orbax.PyTreeCheckpointer()
            restored = ckptr.restore(os.path.join(path, "tree"))
            if like is not None:
                leaves = jax.tree_util.tree_leaves(restored)
                treedef = jax.tree_util.tree_structure(like)
                restored = jax.tree_util.tree_unflatten(treedef, leaves)
            return restored
        data = np.load(os.path.join(path, "leaves.npz"))
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
        if like is None:
            raise ValueError("npz restore requires `like` for the tree structure")
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def _gc(self) -> None:
        steps = self.all_steps()
        for s in steps[: -self._keep] if self._keep else []:
            import shutil

            shutil.rmtree(self._step_dir(s), ignore_errors=True)
