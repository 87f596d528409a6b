"""Lowering: traced IR Programs → pure JAX functions over CSR graphs.

The TPU replacement for the reference's entire backend half:
``autodiff.py`` (JAX differentiates the lowered function), ``passes/fusion``
(XLA fuses elementwise chains; the SpMM peephole below routes whole
edge-multiply-aggregate patterns into one fused kernel), ``code_gen/`` (no
codegen — the lowered function *is* the program), and ``executor.py`` (no
executor — ``jit`` is the executor).

Domain materialization rules (see ``ir.ValType``):

  * SRC/DEST statements evaluate on (N, ...) node arrays;
  * EDGE statements evaluate on (capacity, ...) edge arrays, with node
    operands gathered through ``csr.cols`` (SRC) / ``csr.rows`` (DEST) —
    exactly the index expressions the reference's ``KernelContext`` emits
    per val_type (``code_gen/kernel_context.py:23-42``);
  * aggregations segment-reduce edge arrays into DEST node arrays.

The **SpMM peephole** recognizes ``AggSum(Mul-chain)`` where the chain
contains exactly one "wide" SRC feature and any number of per-edge scalar
factors, and emits ``ops.spmm`` so the dense-adjacency MXU path or the
Pallas blocked-CSR kernel can take it — this is the moral equivalent of the
reference's NEAN fused kernel plus its sympy peephole
(``passes/fusion.py``, ``passes/peephole.py``), done at lowering time.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from stgraph_tpu.compiler.ir import Program, Stmt, ValType, Var
from stgraph_tpu.compiler.tracer import TraceResult
from stgraph_tpu.graph.csr import CSR
from stgraph_tpu.ops import message as M

__all__ = ["GraphView", "lower"]


class GraphView(NamedTuple):
    """Everything the lowered program may need about the graph: the forward
    CSR, its transpose (for fused-VJP kernels), and the host-precomputed
    Pallas blocked layouts when available."""

    csr: CSR
    csr_t: Optional[CSR] = None
    blocked: Any = None
    blocked_t: Any = None


def lower(tr: TraceResult, impl: str = "auto") -> Callable:
    """Build ``fn(graph_view, n_feats, e_feats) -> array`` from a trace."""
    prog, out_var = tr.program, tr.output
    param_values = tr.param_values

    # Direction: 'osrc'/'oedge' leaves mean the program aggregates over
    # out-edges; it then lowers against the transposed CSR (reference's
    # Src-parallel mode, ``passes/fusion.py:294-297``). Mixing directions in
    # one program is rejected, as in the reference's per-unit ParallelMode.
    used = {v.leaf for s in prog.stmts for v in s.args if v.leaf}
    if out_var.leaf:
        used.add(out_var.leaf)
    uses_out = any(l.startswith(("osrc:", "oedge:")) for l in used)
    uses_in = any(l.startswith(("src:", "edge:")) for l in used)
    if uses_out and uses_in:
        raise NotImplementedError(
            "a vertex program may aggregate over in-edges or out-edges, "
            "not both (split it into two compiled programs)"
        )

    def fn(gv: GraphView, n_feats: Dict[str, Any], e_feats: Dict[str, Any]):
        if isinstance(gv, CSR):
            gv = GraphView(csr=gv)
        if uses_out:
            # Flip the view: the transpose CSR becomes the forward graph.
            csr_t = gv.csr_t
            if csr_t is None:
                csr_t = gv.csr.transpose()
            gv = GraphView(
                csr=csr_t,
                csr_t=gv.csr,
                blocked=gv.blocked_t,
                blocked_t=gv.blocked,
            )
        csr = gv.csr
        env: Dict[int, Any] = {}
        edge_env: Dict[int, Any] = {}  # per-var cache of edge-domain arrays

        def bind_leaf(v: Var) -> Any:
            kind, _, name = v.leaf.partition(":")
            if kind in ("src", "dst", "osrc"):
                return _host_or_traced(n_feats[name])
            if kind in ("edge", "oedge"):
                e = _host_or_traced(e_feats[name])
                e = _fold(lambda a: _pad_edges(jnp.asarray(a), csr.capacity), e)
                return _fold(M.edge_data_to_csr_order, csr, e)
            if kind == "param":
                return param_values[v.leaf]
            raise KeyError(v.leaf)

        def node_val(v: Var) -> Any:
            if v.id not in env:
                if v.leaf is None:
                    raise RuntimeError(f"unmaterialized var {v}")
                env[v.id] = bind_leaf(v)
            return env[v.id]

        def as_edge(v: Var) -> Any:
            if v.val_type == ValType.EDGE:
                return node_val(v)
            if v.id in edge_env:
                return edge_env[v.id]
            arr = node_val(v)
            # jnp.asarray inside the fold: sentinel ids rely on XLA's
            # clamped out-of-range gather; numpy indexing would raise.
            if v.val_type == ValType.SRC:
                arr = _fold(lambda a: jnp.asarray(a)[csr.cols], arr)
            elif v.val_type == ValType.DEST:
                arr = _fold(lambda a: jnp.asarray(a)[csr.rows], arr)
            # PARAM: broadcasts as-is.
            edge_env[v.id] = arr
            return arr

        for stmt in prog.stmts:
            if stmt.op.startswith("Agg"):
                val = _lower_agg(stmt, gv, as_edge, node_val, impl)
            elif stmt.ret.val_type == ValType.EDGE:
                val = _fold(stmt.fn, *[as_edge(a) for a in stmt.args], **stmt.kwargs)
            else:
                val = _fold(stmt.fn, *[node_val(a) for a in stmt.args], **stmt.kwargs)
            env[stmt.ret.id] = val

        return node_val(out_var)

    return fn


def _host_or_traced(v):
    """Concrete inputs stay host numpy (constants embed without device
    round-trips); traced inputs pass through."""
    import jax

    if isinstance(v, jax.core.Tracer):
        return v
    return np.asarray(v)


def _fold(f, *args, **kwargs):
    """Compile-time constant folding: run ``f`` eagerly when no argument is
    traced. Inside a jit trace this keeps graph-derived constants (degree
    norms, edge-weight products) concrete, so downstream consumers — e.g.
    the dense-adjacency build — happen once at trace time instead of every
    step.

    Folding runs on the CPU backend and returns numpy: a folded constant
    must be HOST data, because embedding a device array as an MLIR constant
    triggers a device->host pull at every lowering — seconds-to-minutes
    over a remote-TPU tunnel (docs/PERF.md).
    """
    import jax

    if any(isinstance(a, jax.core.Tracer) for a in args):
        return f(*args, **kwargs)
    cpu = jax.devices("cpu")[0]
    with jax.ensure_compile_time_eval(), jax.default_device(cpu):
        out = f(*args, **kwargs)
    return jax.tree_util.tree_map(np.asarray, out)


def _pad_edges(e: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Pad user-order edge data to CSR capacity with zeros."""
    if e.shape[0] == capacity:
        return e
    pad = [(0, capacity - e.shape[0])] + [(0, 0)] * (e.ndim - 1)
    return jnp.pad(e, pad)


def _mul_chain_factors(v: Var) -> List[Var]:
    """Flatten a Mul tree rooted at ``v`` into its leaf factors."""
    stmt = v.producer
    if stmt is not None and stmt.op == "Mul":
        out: List[Var] = []
        for a in stmt.args:
            out.extend(_mul_chain_factors(a))
        return out
    return [v]


def _lower_agg(
    stmt: Stmt,
    gv: GraphView,
    as_edge: Callable,
    node_val: Callable,
    impl: str,
):
    csr = gv.csr
    (arg,) = stmt.args
    reduce = stmt.kwargs["reduce"]

    if reduce == "sum":
        factors = _mul_chain_factors(arg)
        wide = [
            f
            for f in factors
            if f.val_type == ValType.SRC and len(f.shape) >= 1 and f.shape[-1] > 1
        ]
        wide_ids = {f.id for f in wide}
        narrow = [f for f in factors if f.id not in wide_ids]
        narrow_ok = all(
            f.val_type == ValType.PARAM or len(f.shape) == 0 or f.shape[-1] == 1
            for f in narrow
        )
        if len(wide) == 1 and narrow_ok:
            feat = node_val(wide[0])
            w = None
            for f in narrow:
                fe = as_edge(f)
                w = fe if w is None else w * fe
            return M.spmm(
                csr,
                feat,
                edge_weight=w,
                reduce="sum",
                impl=impl,
                blocked=gv.blocked,
                blocked_t=gv.blocked_t,
                csr_t=gv.csr_t,
            )

    return M.aggregate(csr, as_edge(arg), reduce=reduce, masked=True, blocked=gv.blocked)
