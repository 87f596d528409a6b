"""Distributed layer functions: GCN conv and TGCN cell over a device mesh.

Functional (not flax) building blocks for edge-partitioned multi-chip
training: parameters are replicated, node arrays are sharded by destination
range, and aggregation is the halo-exchange ``dist_spmm``. These compose
under ``jax.jit`` / ``jax.lax.scan`` exactly like their single-chip
equivalents (``nn.GCNConv`` / ``nn.TGCN``).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from stgraph_tpu.parallel.halo import dist_gat_attention, dist_spmm
from stgraph_tpu.parallel.partition import DistGraph

__all__ = [
    "dist_gcn_conv",
    "dist_tgcn_cell",
    "dist_gat_conv",
    "dist_gcn_params",
    "dist_tgcn_params",
    "dist_gat_params",
]


def dist_gcn_params(key, in_feats: int, out_feats: int, dtype=jnp.float32) -> Dict:
    """Xavier-initialized replicated GCN parameters."""
    scale = (6.0 / (in_feats + out_feats)) ** 0.5
    w = jax.random.uniform(key, (in_feats, out_feats), dtype, -scale, scale)
    return {"weight": w, "bias": jnp.zeros((out_feats,), dtype)}


def dist_gcn_conv(
    mesh: Mesh,
    dg: DistGraph,
    params: Dict,
    h: jnp.ndarray,
    norm: jnp.ndarray,
    activation=None,
) -> jnp.ndarray:
    """One GCN layer: ``act(norm · A · norm · (h W) + b)``, mesh-parallel.

    The dense projection is sharded by node rows automatically (h is
    row-sharded, W replicated → XLA keeps the matmul local); aggregation is
    the overlapped halo-exchange SpMM.
    """
    h = jnp.dot(h, params["weight"], preferred_element_type=jnp.float32).astype(
        h.dtype
    )
    h = dist_spmm(mesh, dg, h * norm) * norm
    h = h + params["bias"]
    return activation(h) if activation is not None else h


def dist_gat_params(
    key, in_feats: int, out_feats: int, num_heads: int, dtype=jnp.float32
) -> Dict:
    """Xavier-initialized replicated GAT parameters (mirrors nn.GATConv)."""
    k1, k2, k3 = jax.random.split(key, 3)
    scale = (6.0 / (in_feats + num_heads * out_feats)) ** 0.5
    fc = jax.random.uniform(
        k1, (in_feats, num_heads * out_feats), dtype, -scale, scale
    )
    a_scale = (6.0 / (out_feats + 1)) ** 0.5
    attn_l = jax.random.uniform(
        k2, (num_heads, out_feats), dtype, -a_scale, a_scale
    )
    attn_r = jax.random.uniform(
        k3, (num_heads, out_feats), dtype, -a_scale, a_scale
    )
    return {
        "fc": fc,
        "attn_l": attn_l,
        "attn_r": attn_r,
        "bias": jnp.zeros((num_heads * out_feats,), dtype),
    }


def dist_gat_conv(
    mesh: Mesh,
    dg: DistGraph,
    params: Dict,
    h: jnp.ndarray,
    negative_slope: float = 0.2,
    activation=None,
) -> jnp.ndarray:
    """One GAT layer over the mesh: local projection + scores, ONE fused
    halo exchange of [features | el], shard-local segment softmax and
    weighted aggregation (``dist_gat_attention``). Returns (rows, H, F).
    """
    heads, out_feats = params["attn_l"].shape
    fs = jnp.dot(h, params["fc"], preferred_element_type=jnp.float32).astype(
        h.dtype
    )
    fs = fs.reshape(h.shape[0], heads, out_feats)
    el = jnp.sum(fs * params["attn_l"][None], axis=-1)  # (rows, H)
    er = jnp.sum(fs * params["attn_r"][None], axis=-1)
    out = dist_gat_attention(
        mesh, dg, el, er, fs, negative_slope=negative_slope
    )
    out = out + params["bias"].reshape(1, heads, out_feats)
    return activation(out) if activation is not None else out


def dist_tgcn_params(key, in_feats: int, out_feats: int, dtype=jnp.float32) -> Dict:
    """Parameters for the three GCN gates + three dense gates of a TGCN cell."""
    keys = jax.random.split(key, 6)
    p = {}
    for i, gate in enumerate(("z", "r", "h")):
        p[f"conv_{gate}"] = dist_gcn_params(keys[i], in_feats, out_feats, dtype)
        scale = (6.0 / (3 * out_feats)) ** 0.5
        # Gate linear over [conv_out | hidden], matching nn.TGCN._gate.
        p[f"lin_{gate}"] = {
            "weight": jax.random.uniform(
                keys[3 + i], (2 * out_feats, out_feats), dtype, -scale, scale
            ),
            "bias": jnp.zeros((out_feats,), dtype),
        }
    return p


def dist_tgcn_cell(
    mesh: Mesh,
    dg: DistGraph,
    params: Dict,
    x: jnp.ndarray,
    norm: jnp.ndarray,
    hidden: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One TGCN (GRU-of-GCNs) step over the mesh; mirrors ``nn.TGCN``."""
    out_feats = params["conv_z"]["weight"].shape[1]
    if hidden is None:
        hidden = jnp.zeros((x.shape[0], out_feats), x.dtype)

    def gate(name, inp, hid):
        g = dist_gcn_conv(mesh, dg, params[f"conv_{name}"], inp, norm)
        g = jnp.clip(g, -1e6, 1e6)  # nn.TGCN's clamp guard (reference tgcn.py:23)
        lin = params[f"lin_{name}"]
        return (
            jnp.dot(jnp.concatenate([g, hid], axis=1), lin["weight"])
            + lin["bias"]
        )

    z = jax.nn.sigmoid(gate("z", x, hidden))
    r = jax.nn.sigmoid(gate("r", x, hidden))
    h_tilde = jnp.tanh(gate("h", x, hidden * r))
    return z * hidden + (1.0 - z) * h_tilde
