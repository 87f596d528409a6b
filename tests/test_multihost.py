"""Two-process jax.distributed validation (no TPU hardware needed).

Spawns two subprocesses that each expose 2 virtual CPU devices, form one
4-device mesh spanning both processes via ``parallel.launch.initialize``,
and run a distributed SpMM step whose collectives cross the process
boundary — the wiring a TPU pod slice uses (VERDICT r2 item 7).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(
    os.path.dirname(__file__), "scripts", "multihost_worker.py"
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_spmm():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"[p{pid}] MULTIHOST OK" in out, out
        assert "'process_count': 2" in out, out
        assert "'global_devices': 4" in out, out
