"""Serving: ahead-of-time-compiled inference over a fixed graph.

Net-new relative to the reference (which has no inference/serving story —
training scripts only, SURVEY §5.4). For production serving the graph
topology and feature shapes are fixed, so the whole forward pass is
AOT-compiled once (``jax.jit(...).lower().compile()``) and every request
runs the cached executable with zero retracing overhead.

Usage::

    predictor = Predictor.build(model.apply, params, example_inputs=(x,))
    logits = predictor(x)                      # compiled executable call

    # restore + serve
    predictor = Predictor.from_checkpoint(
        ckpt_dir, model.apply, like=params, example_inputs=(x,)
    )
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax

__all__ = ["Predictor"]


class Predictor:
    """An AOT-compiled ``fn(params, *inputs)`` closure over fixed params."""

    def __init__(self, compiled, params: Any) -> None:
        self._compiled = compiled
        self._params = params

    @classmethod
    def build(
        cls,
        apply_fn: Callable,
        params: Any,
        example_inputs: Sequence[Any],
        donate_inputs: bool = False,
    ) -> "Predictor":
        """Lower + compile ``apply_fn(params, *inputs)`` for fixed shapes.

        ``example_inputs`` supply shapes/dtypes only; their values are not
        captured. Compilation happens here (slow once), calls are fast.
        """
        jitted = jax.jit(
            apply_fn,
            donate_argnums=tuple(range(1, 1 + len(example_inputs)))
            if donate_inputs
            else (),
        )
        lowered = jitted.lower(params, *example_inputs)
        return cls(lowered.compile(), params)

    @classmethod
    def from_checkpoint(
        cls,
        directory: str,
        apply_fn: Callable,
        like: Any,
        example_inputs: Sequence[Any],
        step: Optional[int] = None,
    ) -> "Predictor":
        """Restore params with ``utils.Checkpointer`` and compile."""
        from stgraph_tpu.utils import Checkpointer

        state = Checkpointer(directory).restore(step=step, like=like)
        if state is None:
            raise FileNotFoundError(f"no checkpoint found under {directory}")
        return cls.build(apply_fn, state, example_inputs)

    def __call__(self, *inputs: Any):
        return self._compiled(self._params, *inputs)

    @property
    def cost_analysis(self):
        """XLA's FLOP/byte estimates for the compiled executable."""
        try:
            return self._compiled.cost_analysis()
        except Exception:
            return None

    def memory_analysis(self):
        try:
            return self._compiled.memory_analysis()
        except Exception:
            return None
