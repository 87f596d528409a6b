"""TPU bench: large-graph GAT layer, fused sparse path vs vertex-program path."""
import sys
try:  # installed package (pip install -e .) or raw-checkout fallback
    import stgraph_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, __file__.rsplit("/", 3)[0])
import time
import numpy as np
import jax
import jax.numpy as jnp

from stgraph_tpu import StaticGraph
from stgraph_tpu.nn import GATConv

N, E, H, F_IN, F_OUT = 100_000, 2_000_000, 8, 64, 32
rng = np.random.default_rng(0)
src = rng.integers(0, N, size=E, dtype=np.int64)
dst = rng.integers(0, N, size=E, dtype=np.int64)
g = StaticGraph(np.stack([src, dst], 1), None, N)
_ = g.blocked_fwd, g.blocked_bwd  # host layout build outside timing
x = jax.device_put(rng.standard_normal((N, F_IN)).astype(np.float32))

def bench(impl, iters=20, do_grad=True):
    conv = GATConv(F_IN, F_OUT, num_heads=H, impl=impl)
    t0 = time.perf_counter()
    params = jax.jit(lambda xx: conv.init(jax.random.key(0), g, xx))(x)
    jax.block_until_ready(params)
    print(f"[{impl}] init+compile: {time.perf_counter()-t0:.1f}s", flush=True)

    def step(carry, _):
        out = conv.apply(params, g, x * carry)
        c = 1.0 + 0.0 * jax.lax.stop_gradient(jnp.sum(out.astype(jnp.float32)))
        return c, ()

    @jax.jit
    def fwd_run():
        c, _ = jax.lax.scan(step, jnp.float32(1.0), None, length=iters)
        return c

    t0 = time.perf_counter(); fwd_run().block_until_ready()
    print(f"[{impl}] fwd compile: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter(); fwd_run().block_until_ready()
    t_fwd = (time.perf_counter()-t0)/iters
    print(f"[{impl}] fwd: {t_fwd*1e3:.2f} ms  ({E/t_fwd/1e6:.0f}M edges/s)", flush=True)

    if not do_grad:
        return
    def gstep(carry, _):
        def loss(p):
            return jnp.sum(conv.apply(p, g, x * carry) ** 2)
        grads = jax.grad(loss)(params)
        c = 1.0 + 0.0 * jax.lax.stop_gradient(jax.tree.leaves(grads)[0].reshape(-1)[0])
        return c, ()

    @jax.jit
    def bwd_run():
        c, _ = jax.lax.scan(gstep, jnp.float32(1.0), None, length=iters)
        return c

    t0 = time.perf_counter(); bwd_run().block_until_ready()
    print(f"[{impl}] fwd+bwd compile: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter(); bwd_run().block_until_ready()
    t = (time.perf_counter()-t0)/iters
    print(f"[{impl}] fwd+bwd: {t*1e3:.2f} ms  ({E/t/1e6:.0f}M edges/s)", flush=True)

bench(sys.argv[1] if len(sys.argv) > 1 else "sparse")
