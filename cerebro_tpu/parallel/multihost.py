"""Multi-host (pod-slice) initialization glue.

Single entry point for scaling the engine past one host: initialize
`jax.distributed`, build the global mesh, and report the host's shard
coordinates. On a pod slice every host runs the same SPMD program; the
descriptor DB rows shard globally (ICI within a slice, DCN between hosts —
XLA picks the collective implementation from the mesh's device order).

This is the replacement for the reference's multi-process ROS graph
(SURVEY.md §5.8): there is no broker — the processes ARE one program.

Cannot be exercised on single-host CI; the logic is a thin wrapper kept
separate so the testable parts (mesh/sharding) stay in parallel/mesh.py.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from cerebro_tpu.parallel.mesh import make_mesh


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed. With no args, relies on the cluster's
    auto-detected environment (TPU pod metadata / env vars)."""
    kw = {}
    if coordinator_address is not None:
        kw.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kw)


def global_mesh(axis: str = "db") -> Mesh:
    """Mesh over every device in the job (all hosts)."""
    return make_mesh(axis=axis)


def host_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": jax.device_count(),
    }
