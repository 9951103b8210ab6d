"""Multi-host (DCN) wiring test: a real 2-process CPU slice on localhost.

The reference is strictly single-process (SURVEY.md §2: no distributed code at all);
multi-host data-parallel is net-new TPU capability. This test spawns two actual
processes that join via ``jax.distributed.initialize`` (gloo over localhost), each
feeding its local batch shard through ``device_prefetch``'s
``make_array_from_process_local_data`` path, and checks the data-parallel gradient
equals the single-process value. See tests/multihost_worker.py.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_grad_parity():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [os.path.dirname(os.path.dirname(WORKER)), env.get("PYTHONPATH", "")] if p
    )
    # the workers set their own XLA_FLAGS / platform; scrub any test-harness ones
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
