"""Multi-host (multi-process) distributed execution tests.

Spawns N OS processes, each owning a slice of virtual CPU devices, joined
through a real ``jax.distributed`` coordinator into one global mesh — the
same topology as N hosts of a pod slice (SURVEY.md §5.8). Each worker
(tests/multihost_worker.py) runs the globally-sharded descriptor search and
the edge-sharded pose-graph optimizer and verifies results against numpy.

This validates the `parallel/multihost.py` glue that single-process tests
cannot reach: coordinator handshake, cross-process mesh construction,
`make_array_from_callback` global sharding, cross-process collectives, and
orbax checkpointing of a sharded DB across a process-count change.
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


def _launch(n_proc: int, devices_per_process: int, extra_args=None, expect=None):
    port = _free_port()
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
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num-processes", str(n_proc),
                    "--process-id", str(pid),
                    "--devices-per-process", str(devices_per_process),
                ]
                + (extra_args or []),
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
        if expect:
            assert expect in out, out


def test_two_process_global_mesh():
    _launch(2, 4, expect="all multihost checks passed")


def test_four_process_global_mesh():
    """4 hosts x 2 devices — deeper process fan-out (VERDICT r1 #8)."""
    _launch(4, 2, expect="all multihost checks passed")


def test_sharded_db_checkpoint_across_process_count(tmp_path):
    """Save a sharded DB from a 2-process/8-device job, restore it in a
    4-process/8-device job (different host partitioning): orbax reshards
    on load and the restored DB searches correctly on the new topology."""
    ckpt = str(tmp_path / "sharded_db")
    _launch(2, 4, extra_args=["--save-db", ckpt], expect="db saved")
    _launch(4, 2, extra_args=["--load-db", ckpt], expect="db restored + searched ok")
