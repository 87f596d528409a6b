"""TGCN: GRU-of-GCNs temporal layer.

API-parity port of the reference ``stgraph/nn/pytorch/temporal/tgcn.py``:
three GCNConv gates (z/r/h) feeding GRU arithmetic, with the reference's
``clamp(±1e6)`` guards (``tgcn.py:23,31,39``). The hidden state threads
through timesteps; training loops drive it with ``jax.lax.scan`` so the
whole sequence forward+backward compiles to one XLA program (replacing the
reference's per-timestep state stack, ``compiler/executor.py:29-106``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as fnn
import jax.numpy as jnp

from stgraph_tpu.nn.gcn_conv import GCNConv

__all__ = ["TGCN"]

_CLAMP = 1e6


class TGCN(fnn.Module):
    in_channels: int
    out_channels: int
    impl: str = "auto"

    def setup(self) -> None:
        self.conv_z = GCNConv(
            self.in_channels, self.out_channels, activation=None, impl=self.impl
        )
        self.linear_z = fnn.Dense(self.out_channels)
        self.conv_r = GCNConv(
            self.in_channels, self.out_channels, activation=None, impl=self.impl
        )
        self.linear_r = fnn.Dense(self.out_channels)
        self.conv_h = GCNConv(
            self.in_channels, self.out_channels, activation=None, impl=self.impl
        )
        self.linear_h = fnn.Dense(self.out_channels)

    def __call__(
        self,
        graph,
        x: jnp.ndarray,
        edge_weight: Optional[jnp.ndarray] = None,
        hidden: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if hidden is None:
            hidden = jnp.zeros((x.shape[0], self.out_channels), x.dtype)
        z = self._gate(self.conv_z, self.linear_z, graph, x, edge_weight, hidden)
        z = fnn.sigmoid(z)
        r = self._gate(self.conv_r, self.linear_r, graph, x, edge_weight, hidden)
        r = fnn.sigmoid(r)
        h_tilde = self._gate(
            self.conv_h, self.linear_h, graph, x, edge_weight, hidden * r
        )
        h_tilde = jnp.tanh(h_tilde)
        return z * hidden + (1.0 - z) * h_tilde

    def _gate(self, conv, linear, graph, x, edge_weight, state) -> jnp.ndarray:
        h = conv(graph, x, edge_weight=edge_weight)
        h = jnp.clip(h, -_CLAMP, _CLAMP)
        return linear(jnp.concatenate([h, state], axis=1))
