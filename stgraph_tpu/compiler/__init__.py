"""Vertex-centric compiler: tracer → IR → lowering to fused JAX/Pallas ops.

The TPU re-design of the reference ``stgraph/compiler/`` package. What the
reference builds by hand — symbolic autodiff (``autodiff.py``), kernel
fusion (``passes/fusion.py``), CUDA codegen (``code_gen/``), an executor
with a temporal state stack (``executor.py``) — is delegated to JAX/XLA:
``jax.vjp`` differentiates the lowered pure function, XLA fuses it, ``jit``
executes it, and ``lax.scan``'s reverse pass replays time steps.
What remains is the valuable part: the vertex-centric frontend and the
lowering that routes aggregation patterns into MXU-friendly kernels.
"""

from stgraph_tpu.compiler import debugging, dsl
from stgraph_tpu.compiler.ir import Program, Stmt, ValType, Var
from stgraph_tpu.compiler.lowering import lower
from stgraph_tpu.compiler.node import CentralNode, NbEdge, NbNode
from stgraph_tpu.compiler.stgraph import Context, STGraph
from stgraph_tpu.compiler.tracer import TracedValue, trace

__all__ = [
    "CentralNode",
    "debugging",
    "Context",
    "NbEdge",
    "NbNode",
    "Program",
    "STGraph",
    "Stmt",
    "TracedValue",
    "ValType",
    "Var",
    "dsl",
    "lower",
    "trace",
]
