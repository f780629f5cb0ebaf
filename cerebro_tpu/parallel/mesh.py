"""Device-mesh construction.

The reference's "distributed backend" is ROS TCP pub/sub between four OS
processes plus one RPC to the GPU server (SURVEY.md §5.8). The TPU-native
replacement is a single SPMD program over a `jax.sharding.Mesh`; this module
owns mesh construction so every stage (descriptor inference, DB search,
verification, pose-graph) shards against the same axis names:

  ``db``  — the descriptor-history axis (sequence-parallel analog) AND the
            data-parallel batch axis for inference/training. One axis, two
            roles: a pipeline stage reshards between them with constraints,
            and on a single host both map onto all chips.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(num_devices: Optional[int] = None, axis: str = "db") -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(
    shape: tuple, axes: tuple = ("dp", "db")
) -> Mesh:
    """2D mesh: batch/data parallelism on one axis, DB-history sharding on
    the other (e.g. hosts x chips on a pod slice: DP across hosts over DCN,
    history sharding within a host over ICI)."""
    n = shape[0] * shape[1]
    devs = np.asarray(jax.devices()[:n]).reshape(shape)
    return Mesh(devs, axes)
