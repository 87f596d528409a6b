"""Full-step decomposition of the ogbn-products 3-layer GCN training step.

Round-4 verdict: the measured step costs 9.57 s but its six segmented
SpMMs account for only 4.2 s — the other 56% was never profiled. This
bench times each constituent as its own jitted program so the stage table
must sum (within dispatch noise) to the full step:

  * ``step``        — the full 3-layer fwd+bwd training step (bench.py's
    ``bench_ogbn_step`` program, measured identically);
  * ``fwd_loss``    — forward + loss only (no grad): 3 fwd SpMMs + dense;
  * ``dense_step``  — the same step with every SpMM replaced by identity:
    dense matmuls + norm/relu elementwise + loss, fwd+bwd;
  * ``spmm128_fwd`` / ``spmm128_fb`` — one SpMM at 128 lanes, forward and
    forward+backward (vjp), the unit the 6-SpMM accounting multiplies;
  * ``spmm47_fwd`` / ``spmm47_fb``  — the same at the 47-lane (classes)
    plane the third layer actually runs — the round-4 gather cliff was
    plane-size-specific, so the 47-lane point must be measured, not
    assumed equal to the 128-lane one;
  * ``layer3_fb``   — layer 3 (dense 128->47 + SpMM + loss) fwd+bwd.

Usage: python benchmarking/micro/ogbn_step_profile.py [--scale 1.0]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

try:
    import stgraph_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, __file__.rsplit("/", 3)[0])

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--stages", type=str, default="all")
    args = ap.parse_args()
    only = None if args.stages == "all" else set(args.stages.split(","))

    import jax
    import jax.numpy as jnp
    import optax

    from benchmarking.micro._timing import readback_rtt
    from stgraph_tpu.dataset import OgbNodeDataLoader
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops import spmm_pallas
    from stgraph_tpu.utils.cache import setup_compilation_cache
    from stgraph_tpu.utils.norm import symmetric_norm

    setup_compilation_cache()
    t0 = time.perf_counter()
    d = OgbNodeDataLoader("ogbn-products", scale=args.scale)
    n, e = d.gdata["num_nodes"], d.gdata["num_edges"]
    f, classes = d.gdata["num_feats"], d.gdata["num_classes"]
    ei = d.get_edge_index()
    csr = build_csr(ei[0], ei[1], n)
    csr_t = csr.transpose()
    norm = np.asarray(symmetric_norm(csr))
    _, _, cols_np, _ = csr.host_arrays()
    _, _, cols_t_np, _ = csr_t.host_arrays()
    sids = jax.device_put(np.minimum(cols_np, n - 1))
    sids_t = jax.device_put(np.minimum(cols_t_np, n - 1))
    rng = np.random.default_rng(0)
    hidden = args.hidden
    dims = [f, hidden, hidden, classes]
    params = {
        f"w{i}": jnp.asarray(
            rng.standard_normal((dims[i], dims[i + 1])) * 0.05, jnp.float32
        )
        for i in range(3)
    }
    xd = jax.device_put(d.get_all_features().astype(np.float32))
    yd = jax.device_put(d.get_all_targets())
    h128 = jax.device_put(rng.standard_normal((n, hidden)).astype(np.float32))
    h47 = jax.device_put(
        rng.standard_normal((n, classes)).astype(np.float32)
    )
    print(
        f"load+build: N={n} E={e} in {time.perf_counter()-t0:.0f}s",
        flush=True,
    )

    # Per-edge id arrays are jit ARGUMENTS everywhere below: closing over
    # a device array embeds it as an MLIR constant whose lowering pulls the
    # value device->host — pathological over this tunnel (docs/PERF.md).
    def sp(h, si, st):
        return spmm_pallas.spmm(csr, h, csr_t=csr_t, src_ids=si, src_ids_t=st)

    def make_loss(use_spmm: bool):
        def loss(p, xx, yy, si, st):
            h = xx
            for i in range(3):
                h = (h @ p[f"w{i}"]) * norm
                if use_spmm:
                    h = sp(h, si, st) * norm
                else:
                    h = h * norm
                if i < 2:
                    h = jax.nn.relu(h)
            return optax.softmax_cross_entropy_with_integer_labels(
                h, yy
            ).mean()

        return loss

    def make_step(use_spmm: bool):
        loss = make_loss(use_spmm)

        def step(p, xx, yy, si, st):
            return jax.value_and_grad(loss)(p, xx, yy, si, st)

        return step

    results = {}

    def run(name, fn, *fargs, burst=3):
        if only is not None and name not in only:
            return
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(*fargs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])  # compile + warm + drain
        compile_s = time.perf_counter() - t0
        rtt = readback_rtt()
        t1 = time.perf_counter()
        for _ in range(burst):
            out = jfn(*fargs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        dt = max((time.perf_counter() - t1 - rtt) / burst, 1e-9)
        results[name] = dt
        print(
            f"{name:14s} {dt*1e3:9.1f} ms   (compile+warm {compile_s:.0f}s)",
            flush=True,
        )

    run("step", make_step(True), params, xd, yd, sids, sids_t, burst=1)
    run("fwd_loss", make_loss(True), params, xd, yd, sids, sids_t, burst=2)
    run("dense_step", make_step(False), params, xd, yd, sids, sids_t,
        burst=3)
    # fb probes square the output so the backward cotangent is a real
    # array (grad of a plain sum is a broadcast constant XLA folds into
    # nothing — the bwd SpMM of ones degenerates to a degree count).
    run("spmm128_fwd",
        lambda h, si, st: jnp.sum(sp(h, si, st), dtype=jnp.float32),
        h128, sids, sids_t, burst=3)
    run(
        "spmm128_fb",
        lambda h, si, st: jnp.sum(
            jax.grad(
                lambda hh: jnp.sum(sp(hh, si, st) ** 2, dtype=jnp.float32)
            )(h),
            dtype=jnp.float32,
        ),  # force the GRADIENT (returning the value DCEs the backward)
        h128, sids, sids_t, burst=2,
    )
    run("spmm47_fwd",
        lambda h, si, st: jnp.sum(sp(h, si, st), dtype=jnp.float32),
        h47, sids, sids_t, burst=3)
    run(
        "spmm47_fb",
        lambda h, si, st: jnp.sum(
            jax.grad(
                lambda hh: jnp.sum(sp(hh, si, st) ** 2, dtype=jnp.float32)
            )(h),
            dtype=jnp.float32,
        ),
        h47, sids, sids_t, burst=2,
    )

    def layer3(p, h, yy, si, st):
        def loss_fn(p):
            z = (h @ p["w2"]) * norm
            z = sp(z, si, st) * norm
            return optax.softmax_cross_entropy_with_integer_labels(
                z, yy
            ).mean()

        return jax.value_and_grad(loss_fn)(p)

    run("layer3_fb", layer3, params, h128, yd, sids, sids_t,
        burst=2)

    print(json.dumps({k: round(v, 4) for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
