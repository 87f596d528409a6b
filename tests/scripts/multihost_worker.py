"""Two-process ``jax.distributed`` worker: exercises launch.initialize, a
process-spanning mesh, and one distributed SpMM step on CPU devices.

Launched by ``tests/test_multihost.py`` as two subprocesses (one per
"host"), each exposing 2 virtual CPU devices -> a 4-device global mesh
spanning processes. Validates the multi-host wiring the TPU pod path uses
(coordinator handshake, global device enumeration, cross-process
collectives inside shard_map) without TPU hardware.

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:  # cross-process CPU collectives (gloo); name varies across versions
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

import numpy as np


def main() -> None:
    coordinator, num_procs, pid = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
    )
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from stgraph_tpu.parallel import launch

    launch.initialize(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=pid,
    )
    info = launch.process_info()
    assert info["process_count"] == num_procs, info
    assert info["global_devices"] == 2 * num_procs, info
    assert launch.is_multihost(), info
    print(f"[p{pid}] process_info: {info}", flush=True)

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from stgraph_tpu.parallel import dist_spmm, partition_edges

    n_dev = info["global_devices"]
    mesh = Mesh(np.asarray(jax.devices()), ("graph",))

    rng = np.random.default_rng(0)  # same graph on every process
    n, e, f = 32 * n_dev, 64 * n_dev, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, n_dev)
    h_np = rng.standard_normal((dg.padded_nodes, f)).astype(np.float32)
    sharding = NamedSharding(mesh, P("graph"))
    # Every process holds the full host array; each contributes its
    # addressable shards (the standard multi-host data-loading pattern).
    h = jax.make_array_from_callback(
        h_np.shape, sharding, lambda idx: h_np[idx]
    )

    out = jax.jit(lambda h: dist_spmm(mesh, dg, h))(h)
    jax.block_until_ready(out)

    # Oracle on the host; every process checks its addressable shards.
    ref = np.zeros((dg.padded_nodes, f), np.float32)
    np.add.at(ref, dst, h_np[src])
    for shard in out.addressable_shards:
        lo = shard.index[0].start or 0
        got = np.asarray(shard.data)
        np.testing.assert_allclose(
            got, ref[lo : lo + got.shape[0]], rtol=2e-5, atol=2e-5
        )
    print(f"[p{pid}] MULTIHOST OK", flush=True)


if __name__ == "__main__":
    main()
