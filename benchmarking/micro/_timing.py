"""Honest TPU timing over the axon relay.

``block_until_ready()`` on this environment's remote-TPU relay acks small
programs before they execute (measured: an 8192^3-matmul scan "completes"
at 45,000 TFLOP/s for short lengths, then measures a correct ~170 TFLOP/s
once the program is long enough to overflow the relay's queue). The only
reliable fence is a device->host readback of the result. This helper:

  * warms the d2h path once per process (the first readback pays a ~50 s
    path-setup penalty; later readbacks are ~25 ms),
  * times (enqueue + scalar readback) around a jitted scan of ``iters``
    chained iterations, subtracting the measured readback RTT,
  * chains iterations through the carry with a point update (``x.at[0,0]
    .set(c)``) — a broadcast multiply would let XLA's algebraic simplifier
    hoist loop-invariant work (e.g. ``gather(x*c) == gather(x)*c``).
"""

from __future__ import annotations

import time

import numpy as np

_D2H_WARM = False
_RTT = 0.0


def _warm_d2h():
    global _D2H_WARM, _RTT
    if _D2H_WARM:
        return
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(1.0)))  # first readback: pays path setup
    t0 = time.perf_counter()
    for _ in range(3):
        float(f(jnp.float32(2.0)))
    _RTT = (time.perf_counter() - t0) / 3
    _D2H_WARM = True


def readback_rtt() -> float:
    _warm_d2h()
    return _RTT


def bench_chained(make_fn, x0, iters: int = 10) -> float:
    """Seconds per iteration of fn, measured with a drained readback."""
    import jax
    import jax.numpy as jnp

    _warm_d2h()
    fn = make_fn()

    @jax.jit
    def run(x):
        def body(c, _):
            out = fn(x.at[(0,) * x.ndim].set(c.astype(x.dtype)))
            c2 = 1.0 + 0.0 * jax.lax.stop_gradient(
                jnp.sum(out, dtype=jnp.float32)
            )
            return c2, ()

        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    float(run(x0))  # compile + drain
    t0 = time.perf_counter()
    float(run(x0))
    dt = time.perf_counter() - t0 - _RTT
    return max(dt, 1e-9) / iters
