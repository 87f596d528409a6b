"""STGraph compile decorator: the user entry point to the vertex compiler.

API-parity with the reference ``stgraph/compiler/stgraph.py``
(``STGraph(backend).compile(gnn_module)`` returning a per-function
``Context``) with the machinery inverted for JAX: instead of tracing once
and caching a CUDA executor keyed by entry count (``stgraph.py:46-63``),
``Context.__call__`` retraces the (tiny) closure on every call and returns
the result of the lowered pure function. Under ``jax.jit`` the retrace
happens only while XLA traces the enclosing step, so the steady-state cost
is zero — jit *is* the executor cache.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from stgraph_tpu.compiler.lowering import GraphView, lower
from stgraph_tpu.compiler.tracer import trace
from stgraph_tpu.graph.csr import CSR

__all__ = ["STGraph", "Context"]


class Context:
    """A compiled vertex program; call with ``(g, n_feats, e_feats)``."""

    def __init__(self, f: Callable, impl: str = "auto") -> None:
        self._f = f
        self._impl = impl
        self.__name__ = getattr(f, "__name__", "vertex_program")

    def __call__(
        self,
        g,
        n_feats: Optional[Dict[str, Any]] = None,
        e_feats: Optional[Dict[str, Any]] = None,
    ):
        n_feats = dict(n_feats or {})
        e_feats = dict(e_feats or {})
        gv = _as_view(g, self._impl)
        nspec = {k: (jnp.shape(v)[1:], _dtype(v)) for k, v in n_feats.items()}
        espec = {k: (jnp.shape(v)[1:], _dtype(v)) for k, v in e_feats.items()}
        tr = trace(self._f, nspec, espec)
        fn = lower(tr, impl=self._impl)
        return fn(gv, n_feats, e_feats)


class STGraph:
    """Factory for compiled vertex programs.

    ``backend`` is accepted for signature parity with the reference
    (``STGraph(STGraphBackendTorch())``) but ignored: there is exactly one
    backend — JAX.
    """

    def __init__(self, backend: Any = None) -> None:
        self._backend = backend

    def compile(
        self, gnn_module: Any = None, impl: str = "auto"
    ) -> Callable[[Callable], Context]:
        """Decorator: ``@stgraph.compile()`` over a ``f(v) -> value`` closure.

        ``gnn_module`` is accepted for parity; captured arrays are picked up
        automatically as PARAM leaves, so no module introspection is needed.
        ``impl`` routes aggregation: 'auto' | 'jnp' | 'dense' | 'pallas'.
        """

        def decorator(f: Callable) -> Context:
            return Context(f, impl=impl)

        return decorator


def _as_view(g, impl: str) -> GraphView:
    """Normalize any graph handle (CSR, StaticGraph, ...) into a GraphView.

    Blocked Pallas layouts are fetched only when the Pallas path can run:
    they are host-built (concrete arrays), so a traced bare CSR cannot
    produce them.
    """
    if isinstance(g, GraphView):
        return g
    if isinstance(g, CSR):
        return GraphView(csr=g)
    fwd = getattr(g, "fwd_csr", None)
    if fwd is not None:
        blocked = blocked_t = None
        import jax

        want_pallas = impl == "pallas" or (
            impl == "auto" and jax.default_backend() not in ("cpu", "gpu")
        )
        if want_pallas and hasattr(g, "blocked_fwd"):
            blocked, blocked_t = g.blocked_fwd, g.blocked_bwd
        return GraphView(
            csr=fwd,
            csr_t=getattr(g, "bwd_csr", None),
            blocked=blocked,
            blocked_t=blocked_t,
        )
    raise TypeError(f"cannot extract a graph view from {type(g)!r}")


def _dtype(v) -> Any:
    return getattr(v, "dtype", jnp.asarray(v).dtype)
