"""External-framework baseline models in pure torch (CPU).

Role-parity with the reference's side-by-side PyG-T baselines
(``/root/reference/benchmarking/dynamic-temporal-tgcn/pygt/{model,train}.py``
and ``static-temporal-tgcn/pygt/``): the reference anchors its perf/quality
claims against an *external* framework trained on the same data with the
same hyperparameters. PyTorch-Geometric(-Temporal) is not in this image, so
the baselines are implemented directly on torch scatter primitives
(``index_add_`` / ``scatter_reduce``) — the same math PyG's ``GCNConv`` /
``GATConv`` / PyG-T's ``TGCN`` execute, with self-loops disabled to match
(the reference passes ``add_self_loops=False``).

These models are INDEPENDENT implementations of the textbook layer math —
not wrappers over stgraph_tpu — so agreement between the two frameworks is
evidence, not tautology.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _norm(dst: torch.Tensor, n: int) -> torch.Tensor:
    """in_degree^{-1/2}, zero-degree -> 1 (same convention as
    ``stgraph_tpu.utils.norm.symmetric_norm``)."""
    deg = torch.zeros(n).index_add_(0, dst, torch.ones(dst.shape[0]))
    return torch.where(deg > 0, deg.clamp(min=1.0).rsqrt(), torch.ones(n))[:, None]


class TorchGCNLayer(torch.nn.Module):
    """out = norm * A_in @ (norm * (x W)) + b (Kipf & Welling, no self-loops)."""

    def __init__(self, f_in: int, f_out: int, bias: bool = True):
        super().__init__()
        self.lin = torch.nn.Linear(f_in, f_out, bias=bias)
        torch.nn.init.xavier_uniform_(self.lin.weight)

    def forward(self, src, dst, norm, x, edge_weight=None):
        h = x @ self.lin.weight.T
        h = h * norm
        msg = h[src]
        if edge_weight is not None:
            msg = msg * edge_weight[:, None]
        out = torch.zeros_like(h).index_add_(0, dst, msg)
        out = out * norm
        if self.lin.bias is not None:
            out = out + self.lin.bias
        return out


class TorchGCN(torch.nn.Module):
    def __init__(self, f_in: int, hidden: int, classes: int):
        super().__init__()
        self.l1 = TorchGCNLayer(f_in, hidden)
        self.l2 = TorchGCNLayer(hidden, classes)

    def forward(self, src, dst, norm, x):
        h = F.relu(self.l1(src, dst, norm, x))
        return self.l2(src, dst, norm, h)


class TorchGATLayer(torch.nn.Module):
    """Multi-head GAT with stable segment softmax over in-edges (DGL math)."""

    def __init__(self, f_in: int, f_out: int, heads: int, negative_slope=0.2):
        super().__init__()
        self.heads, self.f_out, self.slope = heads, f_out, negative_slope
        self.fc = torch.nn.Linear(f_in, heads * f_out, bias=False)
        # Reference init exactly: (H, F) attn params, xavier_normal with
        # gain = calculate_gain('relu') on fc and both attention vectors
        # (reference gat_conv.py:22-38) — matching stgraph_tpu.nn.GATConv.
        self.attn_l = torch.nn.Parameter(torch.empty(heads, f_out))
        self.attn_r = torch.nn.Parameter(torch.empty(heads, f_out))
        gain = torch.nn.init.calculate_gain("relu")
        torch.nn.init.xavier_normal_(self.fc.weight, gain=gain)
        torch.nn.init.xavier_normal_(self.attn_l, gain=gain)
        torch.nn.init.xavier_normal_(self.attn_r, gain=gain)

    def forward(self, src, dst, n, x):
        z = self.fc(x).view(n, self.heads, self.f_out)
        el = (z * self.attn_l[None]).sum(-1)  # (N, H)
        er = (z * self.attn_r[None]).sum(-1)
        s = F.leaky_relu(el[src] + er[dst], self.slope)  # (E, H)
        smax = torch.full((n, self.heads), -torch.inf).scatter_reduce(
            0, dst[:, None].expand_as(s), s, reduce="amax", include_self=True
        )
        w = torch.exp(s - smax[dst])
        denom = torch.zeros(n, self.heads).index_add_(0, dst, w)
        alpha = w / denom.clamp(min=torch.finfo(torch.float32).tiny)[dst]
        out = torch.zeros_like(z).index_add_(0, dst, z[src] * alpha[:, :, None])
        return out  # (N, H, F)


class TorchGAT(torch.nn.Module):
    """Same stacking as our GAT driver: concat hidden heads, average out heads."""

    def __init__(self, f_in, hidden, classes, heads=8, out_heads=1):
        super().__init__()
        self.l1 = TorchGATLayer(f_in, hidden, heads)
        self.l2 = TorchGATLayer(hidden * heads, classes, out_heads)

    def forward(self, src, dst, n, x):
        h = F.elu(self.l1(src, dst, n, x)).reshape(n, -1)
        return self.l2(src, dst, n, h).mean(dim=1)


class TorchTGCN(torch.nn.Module):
    """GRU-of-GCNs, gate math identical to ``stgraph_tpu.nn.TGCN`` (which
    itself ports the reference ``stgraph/nn/pytorch/temporal/tgcn.py``)."""

    def __init__(self, f_in: int, hidden: int):
        super().__init__()
        self.hidden = hidden
        for g in ("z", "r", "h"):
            setattr(self, f"conv_{g}", TorchGCNLayer(f_in, hidden))
            setattr(self, f"linear_{g}", torch.nn.Linear(2 * hidden, hidden))

    def _gate(self, conv, lin, src, dst, norm, x, ew, state):
        h = conv(src, dst, norm, x, ew).clamp(-1e6, 1e6)
        return lin(torch.cat([h, state], dim=1))

    def forward(self, src, dst, norm, x, ew=None, hidden=None):
        if hidden is None:
            hidden = torch.zeros(x.shape[0], self.hidden)
        z = torch.sigmoid(
            self._gate(self.conv_z, self.linear_z, src, dst, norm, x, ew, hidden)
        )
        r = torch.sigmoid(
            self._gate(self.conv_r, self.linear_r, src, dst, norm, x, ew, hidden)
        )
        h_t = torch.tanh(
            self._gate(self.conv_h, self.linear_h, src, dst, norm, x, ew, hidden * r)
        )
        return z * hidden + (1 - z) * h_t


def edges_to_torch(edges: np.ndarray):
    e = np.asarray(edges, np.int64)
    return torch.from_numpy(e[:, 0].copy()), torch.from_numpy(e[:, 1].copy())
