"""Multi-host (multi-process) distributed execution test.

Spawns 2 OS processes, each owning 4 virtual CPU devices, joined through a
real ``jax.distributed`` coordinator into one 8-device global mesh — the
same topology as 2 hosts of a pod slice (SURVEY.md §5.8). Each worker
(tests/multihost_worker.py) runs the globally-sharded descriptor search and
the edge-sharded pose-graph optimizer and verifies results against numpy.

This validates the `parallel/multihost.py` glue that single-process tests
cannot reach: coordinator handshake, cross-process mesh construction,
`make_array_from_callback` global sharding, and cross-process collectives.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh():
    port = _free_port()
    n_proc = 2
    env_base = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = []
    for pid in range(n_proc):
        env = dict(env_base)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = str(WORKER.parent.parent)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    str(WORKER),
                    "--coordinator",
                    f"127.0.0.1:{port}",
                    "--num-processes",
                    str(n_proc),
                    "--process-id",
                    str(pid),
                ],
                env=env,
                cwd=str(WORKER.parent.parent),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "all multihost checks passed" in out, out
