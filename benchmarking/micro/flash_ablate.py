"""Flash-GAT forward-kernel ablation: where do the milliseconds go?

Runs the REAL forward kernel and three ablated variants that delete one
cost bucket each (the deleted work is replaced by constants so shapes,
DMA, and the main matmuls are unchanged):

  full      — the production kernel
  nomask    — row mask replaced by all-ones (bounds the two range-compares
              + casts bucket)
  noerm     — er/m recovery dot + exp replaced by constants (bounds the
              per-chunk small-dot/transcendental bucket)
  nowlane   — attention weights not applied (bounds the spread-dot +
              per-tile scale bucket); main selection matmul remains

The ablated kernels compute garbage — only their TIME is meaningful.

Usage: python benchmarking/micro/flash_ablate.py [--e 2000000] [--bf16]
"""

from __future__ import annotations

import argparse
import functools
import sys

try:
    import stgraph_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, __file__.rsplit("/", 3)[0])

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--e", type=int, default=2_000_000)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--f", type=int, default=32)
    ap.add_argument("--f32", action="store_true", help="f32 stream (default bf16)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from benchmarking.micro._timing import bench_chained
    from stgraph_tpu.graph.blocked import ROW_BLOCK
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops import flash_gat as FG
    from stgraph_tpu.ops.segment_pallas import _ALIGN, _round_up
    from stgraph_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    n, e, h, f = args.n, args.e, args.heads, args.f
    sdt = jnp.float32 if args.f32 else jnp.bfloat16
    rng = np.random.default_rng(0)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    csr = build_csr(src, dst, n)
    cap = csr.capacity
    f_flat = h * f
    f_pad = _round_up(max(f_flat, 128), 128)
    ftot = f_pad + FG._SIDE
    n_ft = f_pad // 128
    ch = FG._FLASH_CHUNK
    meta = FG.row_block_meta(csr, ch)
    bs3, be3 = FG._common_specs(meta)

    _, _, cols_np, _ = csr.host_arrays()
    cols_pad = np.pad(np.minimum(cols_np, n - 1), (0, meta.cap_pad - cap))
    table = jnp.asarray(
        rng.standard_normal((n, ftot)).astype(np.float32)
    )
    plane = jax.jit(lambda t: t[jnp.asarray(cols_pad)].astype(sdt))(table)
    side = jnp.asarray(
        rng.standard_normal((meta.num_rows_padded, 2 * h)).astype(np.float32)
    )

    def make_kernel(mode):
        def kernel(
            astart_ref, nchunks_ref, bs_ref, be_ref, side_ref, plane_ref,
            out_ref, den_ref, slab, acc, den_acc, sem,
        ):
            rb = pl.program_id(0)
            a0 = astart_ref[rb]
            nck = nchunks_ref[rb]
            prec = (
                jax.lax.Precision.HIGHEST
                if sdt == jnp.float32
                else jax.lax.Precision.DEFAULT
            )

            def dma(slot, i):
                off = pl.multiple_of(a0 + i * ch, _ALIGN)
                return pltpu.make_async_copy(
                    plane_ref.at[pl.ds(off, ch), :], slab.at[slot],
                    sem.at[slot],
                )

            @pl.when(nck > 0)
            def _():
                dma(0, 0).start()

            acc[...] = jnp.zeros_like(acc)
            den_acc[...] = jnp.zeros_like(den_acc)
            pos0 = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, ch), 1)
            spreads = FG._spreads(h, f, n_ft)

            def body(i, _):
                slot = jax.lax.rem(i, 2)

                @pl.when(i + 1 < nck)
                def _():
                    dma(jax.lax.rem(i + 1, 2), i + 1).start()

                dma(slot, i).wait()
                if mode == "nomask":
                    m32 = jnp.ones((ROW_BLOCK, ch), jnp.float32)
                    msd = jnp.ones((ROW_BLOCK, ch), sdt)
                else:
                    mb = FG._mask(bs_ref[0], be_ref[0], pos0, i * ch)
                    m32 = mb.astype(jnp.float32)
                    msd = mb.astype(sdt)
                sl = slab[slot]
                if mode == "noerm":
                    w = jnp.full((ch, h), 0.5, jnp.float32)
                else:
                    el = sl[:, f_pad : f_pad + h].astype(jnp.float32) + sl[
                        :, f_pad + h : f_pad + 2 * h
                    ].astype(jnp.float32)
                    erm = jax.lax.dot_general(
                        m32, side_ref[...], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec,
                    )
                    s = el + erm[:, :h]
                    s = jnp.where(s >= 0, s, 0.2 * s)
                    w = jnp.exp(jnp.minimum(s - erm[:, h:], 0.0))
                if mode != "noden":
                    den_acc[:, :h] += jax.lax.dot_general(
                        m32, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec,
                    )
                if mode == "combined":
                    spread_all = jnp.concatenate(spreads, axis=1)  # (h, 128*n_ft)
                    w_lane_all = jax.lax.dot_general(
                        w, spread_all, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec,
                    )  # (CHUNK, f_pad)
                    scaled_all = sl[:, :f_pad] * w_lane_all.astype(sdt)
                    acc[...] += jnp.dot(
                        msd, scaled_all,
                        preferred_element_type=jnp.float32, precision=prec,
                    )
                    return ()
                for t in range(n_ft):
                    tile = sl[:, t * 128 : (t + 1) * 128]
                    if mode == "nowlane":
                        scaled = tile
                    else:
                        w_lane = jax.lax.dot_general(
                            w, spreads[t], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        )
                        if sdt == jnp.float32:
                            scaled = tile * w_lane
                        else:
                            scaled = tile * w_lane.astype(sdt)
                    acc[:, t * 128 : (t + 1) * 128] += jnp.dot(
                        msd, scaled, preferred_element_type=jnp.float32,
                        precision=prec,
                    )
                return ()

            jax.lax.fori_loop(0, nck, body, (), unroll=False)
            out_ref[...] = acc[...]
            den_ref[...] = den_acc[...]

        return kernel

    def run(mode):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(meta.num_blocks,),
            in_specs=[
                pl.BlockSpec((1, ROW_BLOCK, 1), lambda rb, *_: (rb, 0, 0)),
                pl.BlockSpec((1, ROW_BLOCK, 1), lambda rb, *_: (rb, 0, 0)),
                pl.BlockSpec((ROW_BLOCK, 2 * h), lambda rb, *_: (rb, 0)),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=(
                pl.BlockSpec((ROW_BLOCK, f_pad), lambda rb, *_: (rb, 0)),
                pl.BlockSpec((ROW_BLOCK, 128), lambda rb, *_: (rb, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, ch, ftot), sdt),
                pltpu.VMEM((ROW_BLOCK, f_pad), jnp.float32),
                pltpu.VMEM((ROW_BLOCK, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

        def fn(plane):
            return pl.pallas_call(
                make_kernel(mode),
                out_shape=(
                    jax.ShapeDtypeStruct(
                        (meta.num_rows_padded, f_pad), jnp.float32
                    ),
                    jax.ShapeDtypeStruct(
                        (meta.num_rows_padded, 128), jnp.float32
                    ),
                ),
                grid_spec=grid_spec,
            )(meta.astart, meta.nchunks, bs3, be3, side, plane)[0]

        dt = bench_chained(lambda: fn, plane, iters=20)
        print(
            f"  {mode:8s}: {dt*1e3:8.2f} ms  ({e/dt/1e6:6.1f}M edges/s)",
            flush=True,
        )
        return dt

    print(
        f"flash fwd-kernel ablation: E={e}, H={h}, F={f}, "
        f"stream={'f32' if args.f32 else 'bf16'}",
        flush=True,
    )
    full = run("full")
    run("combined")
    noden = run("noden")
    nomask = run("nomask")
    noerm = run("noerm")
    nowlane = run("nowlane")
    print(f"  mask bucket : {(full-nomask)*1e3:6.2f} ms")
    print(f"  erm/exp     : {(full-noerm)*1e3:6.2f} ms")
    print(f"  wlane/scale : {(full-nowlane)*1e3:6.2f} ms")
    print(f"  den dot     : {(full-noden)*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
