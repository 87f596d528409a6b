"""Tutorial: train a 2-layer GCN on Cora with stgraph_tpu.

The canonical end-user walkthrough, mirroring the reference tutorial
(``/root/reference/tutorials/gcn/cora/main.py``) on the TPU-native stack:

1. load Cora (cached JSON; an offline synthetic fallback keeps the
   tutorial runnable without network);
2. build a ``StaticGraph`` — padded CSR device arrays + transpose;
3. define the model with ``GCNConv``, whose aggregation is the one-line
   vertex program ``sum([nb.h * nb.norm for nb in v.innbs]) * v.norm``;
4. jit a full train step (loss + grads + adam update) and run it.

Run:  python tutorials/gcn/cora/main.py [--epochs 200] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

try:  # installed package (pip install -e .) or raw-checkout fallback
    import stgraph_tpu  # noqa: F401
except ImportError:
    sys.path.insert(
        0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".."))
    )


def main() -> None:
    ap = argparse.ArgumentParser("GCN-on-Cora tutorial")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--weight-decay", type=float, default=5e-4)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from stgraph_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    import flax.linen as fnn
    import jax.numpy as jnp
    import optax

    from stgraph_tpu import StaticGraph
    from stgraph_tpu.dataset import CoraDataLoader
    from stgraph_tpu.nn import GCNConv

    # -- 1. data ---------------------------------------------------------
    cora = CoraDataLoader(verbose=True)
    x = jnp.asarray(cora.get_all_features())
    y = jnp.asarray(cora.get_all_targets())
    num_classes = cora.gdata["num_classes"]

    # -- 2. graph --------------------------------------------------------
    # StaticGraph builds the forward CSR over *in*-edges (dst-major) and
    # its transpose for the backward pass, padded to static shapes so the
    # jitted step never recompiles.
    g = StaticGraph(cora.get_edges(), None, cora.gdata["num_nodes"])

    # -- 3. model --------------------------------------------------------
    class GCN(fnn.Module):
        @fnn.compact
        def __call__(self, h):
            h = GCNConv(h.shape[-1], args.hidden, activation=jax.nn.relu)(g, h)
            return GCNConv(args.hidden, num_classes)(g, h)

    model = GCN()
    # Jitting init matters on remote-TPU setups: eager per-op dispatch is
    # slow, one compiled program is not.
    params = jax.jit(model.init)(jax.random.key(42), x)
    opt = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = jax.jit(opt.init)(params)

    # -- 4. jitted train step -------------------------------------------
    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params):
        return (model.apply(params, x).argmax(-1) == y).mean()

    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        params, opt_state, loss = train_step(params, opt_state)
        loss = float(loss)
        dt = time.perf_counter() - t0
        if epoch % 20 == 0 or epoch == args.epochs - 1:
            print(
                f"epoch {epoch:4d}  loss {loss:.4f}  "
                f"acc {float(accuracy(params)):.4f}  {dt*1e3:.1f} ms"
            )

    print(f"final train accuracy: {float(accuracy(params)):.4f}")


if __name__ == "__main__":
    main()
