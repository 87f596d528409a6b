"""Traceable op registry: jnp implementations keyed by op name.

Replaces the reference's ``stgraph/compiler/registry.py`` (415 lines of
per-op symbolic ``grad_impl`` + CUDA ``gen_code`` emitters) with one table:
each op is just a jnp callable, because JAX differentiates it and XLA
generates the code. Op names are kept aligned with the reference's
(``AddOp``, ``SubOp``, ``LeakyReluOp``, ``ExpOp``, ``MulOp``, ``AggSumOp``,
``AggMaxOp``, ``TrueDivOp``, ``ReluOp`` — ``registry.py:195-406``) so the
IR reads the same in dumps.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

__all__ = ["ELEMENTWISE_OPS", "AGG_OPS", "lookup"]


def _leaky_relu(x, negative_slope=0.01):
    return jnp.where(x >= 0, x, negative_slope * x)


ELEMENTWISE_OPS: Dict[str, Callable] = {
    "Add": lambda a, b: a + b,
    "Sub": lambda a, b: a - b,
    "Mul": lambda a, b: a * b,
    "TrueDiv": lambda a, b: a / b,
    "Pow": lambda a, b: a**b,
    "Neg": lambda a: -a,
    "Exp": jnp.exp,
    "Log": jnp.log,
    "Sqrt": jnp.sqrt,
    "Relu": jax.nn.relu,
    "LeakyRelu": _leaky_relu,
    "Sigmoid": jax.nn.sigmoid,
    "Tanh": jnp.tanh,
    "Abs": jnp.abs,
    "Clamp": lambda a, min=None, max=None: jnp.clip(a, min, max),
    "Reshape": lambda a, shape=None: a.reshape(a.shape[:1] + tuple(shape)),
    "SumDim": lambda a, axis=-1, keepdims=False: jnp.sum(
        a, axis=axis, keepdims=keepdims
    ),
    "MaxDim": lambda a, axis=-1, keepdims=False: jnp.max(
        a, axis=axis, keepdims=keepdims
    ),
    "Cast": lambda a, dtype=None: a.astype(dtype),
}

# Aggregations: edge domain -> dest domain. Implemented by the ops layer's
# segment reductions at lowering time.
AGG_OPS = {"AggSum": "sum", "AggMax": "max", "AggMin": "min", "AggMean": "mean"}


def lookup(op: str) -> Callable:
    return ELEMENTWISE_OPS[op]
