"""Microbench: where does the large-graph SpMM spend its time?

Breaks the rowmask SpMM (N=100k, E=2M, F=128) into stages on the real TPU:
XLA gather (f32/bf16), the rowmask kernel end-to-end, and variants.
Iterations are chained through a lax.scan whose carry folds jnp.sum(out)
so XLA cannot elide or overlap the work (docs/PERF.md methodology note).
Informs the gather-fusion work (VERDICT round-1 item 1).
"""

import sys

try:  # installed package (pip install -e .) or raw-checkout fallback
    import stgraph_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, __file__.rsplit("/", 3)[0])

import numpy as np

from benchmarking.micro._timing import bench_chained


def main(n=100_000, e=2_000_000, f=128):
    import jax
    import jax.numpy as jnp
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops import segment_pallas as nsp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    rng = np.random.default_rng(0)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    csr = build_csr(src, dst, n)
    h32 = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    h16 = h32.astype(jnp.bfloat16)
    cols = np.minimum(np.asarray(csr.cols), n - 1)

    # 1. XLA gather alone
    for name, h in (("gather_f32", h32), ("gather_bf16", h16)):
        dt = bench_chained(lambda: (lambda x: x[cols]), h)
        gb = e * f * h.dtype.itemsize * 2 / 1e9  # read + write
        print(f"{name}: {dt*1e3:.2f} ms  ({gb/dt:.0f} GB/s r+w)", flush=True)

    # 1c. gather of bf16 from an f32 table (cast fused into gather?)
    dt = bench_chained(lambda: (lambda x: x[cols].astype(jnp.bfloat16)), h32)
    print(f"gather_f32_to_bf16: {dt*1e3:.2f} ms", flush=True)

    # 2. rowmask SpMM end-to-end (includes in-op gather), single head,
    #    unweighted (ones weights still streamed today).
    w = jnp.ones((csr.capacity, 1), jnp.float32)

    def make_rowmask():
        def fn(feats):
            out, _ = nsp.spmm_rowmask(csr, w, feats, heads=1)
            return out

        return fn

    for name, h in (("rowmask_e2e_f32", h32), ("rowmask_e2e_bf16", h16)):
        dt = bench_chained(make_rowmask, h)
        print(f"{name}: {dt*1e3:.2f} ms ({e/dt/1e6:.0f}M edges/s)", flush=True)

    meta = nsp.row_block_meta(csr)
    print(f"meta: blocks={meta.num_blocks} cap_pad={meta.cap_pad}")


if __name__ == "__main__":
    main()
