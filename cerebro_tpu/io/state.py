"""Checkpoint / resume: the teach-and-repeat + multi-session mechanism.

Parity target: DataManager::saveStateToDisk / loadStateFromDisk
(src/DataManager.cpp:1098-1353) + ImageDataManager::stashAll — the
reference dumps every DataNode (pose, descriptor, keyframe flag, stamps) to
state.json plus stashed JPGs, and on reload the descriptor thread seeds its
computed-list so the new run's descriptors dot against the loaded map
(src/Cerebro.cpp:138-161; launch wiring
launch/realsense_vinsfusion_ondrone_{teach,repeat}.launch:42-43).

Here: the device-resident descriptor DB is checkpointed with orbax (works
for sharded arrays on a mesh); host-side columnar state goes to one
compressed npz + a json manifest; images via ImageStore.save_to. Reloading
reconstructs a pipeline whose DB is pre-populated — new frames immediately
retrieve against the old map (relocalization).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from cerebro_tpu.db import descriptors as ddb
from cerebro_tpu.db.images import ImageStore
from cerebro_tpu.db.keyframes import KeyframeStore
from cerebro_tpu.runtime.pipeline import CerebroPipeline, LoopEdge


def save_pipeline_state(pipe: CerebroPipeline, directory: str) -> None:
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)

    # device state: descriptor DB via orbax (sharding-aware)
    quantized = isinstance(pipe.db, ddb.QuantizedDB)
    if quantized:
        db_tree = {
            "values": pipe.db.values,
            "scales": pipe.db.scales,
            "global_ids": pipe.db.global_ids,
            "count": pipe.db.count,
            "total": pipe.db.total,
        }
    else:
        db_tree = {
            "vectors": pipe.db.vectors,
            "global_ids": pipe.db.global_ids,
            "count": pipe.db.count,
            "total": pipe.db.total,
        }
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(directory, "descriptor_db"), db_tree, force=True)
    ckpt.wait_until_finished()

    # host state: keyframe columns + mappings
    np.savez_compressed(
        os.path.join(directory, "keyframes.npz"), **pipe.store.to_state_dict()
    )
    manifest = {
        "format_version": 2,  # v2: ring DB (global_ids + total)
        "db_gid_to_store": pipe.db_gid_to_store,
        "kidnap": pipe.kidnap.info(),
        "loop_edges": [e.as_json() for e in pipe.loop_edges],
        "descriptor_dim": int(pipe.db.dim),
        "db_capacity": int(pipe.db.capacity),
        "db_quantized": quantized,
    }
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(manifest, f)

    # images
    pipe.images.save_to(os.path.join(directory, "images"))


def load_pipeline_state(
    directory: str,
    cfg=None,
    rig=None,
    describe_fn=None,
    params=None,
    stash_dir: Optional[str] = None,
) -> CerebroPipeline:
    directory = os.path.abspath(directory)
    with open(os.path.join(directory, "manifest.json")) as f:
        manifest = json.load(f)
    version = manifest.get("format_version", 0)
    if version != 2:
        raise ValueError(
            f"checkpoint format v{version} unsupported (this build reads v2; "
            "v1 ring-less checkpoints predate the released format)"
        )

    pipe = CerebroPipeline(cfg=cfg, rig=rig, describe_fn=describe_fn, params=params)
    assert pipe.db.dim == manifest["descriptor_dim"], (
        f"descriptor dim mismatch: checkpoint {manifest['descriptor_dim']} vs "
        f"config {pipe.db.dim}"
    )

    ckpt = ocp.StandardCheckpointer()
    if manifest.get("db_quantized", False):
        assert isinstance(pipe.db, ddb.QuantizedDB), (
            "checkpoint is quantized; set LoopConfig.quantized=True"
        )
        restored = ckpt.restore(
            os.path.join(directory, "descriptor_db"),
            {
                "values": jnp.zeros_like(pipe.db.values),
                "scales": jnp.zeros_like(pipe.db.scales),
                "global_ids": jnp.zeros_like(pipe.db.global_ids),
                "count": jnp.zeros_like(pipe.db.count),
                "total": jnp.zeros_like(pipe.db.total),
            },
        )
        pipe.db = ddb.QuantizedDB(
            values=restored["values"],
            scales=restored["scales"],
            global_ids=restored["global_ids"],
            count=restored["count"],
            total=restored["total"],
        )
    else:
        restored = ckpt.restore(
            os.path.join(directory, "descriptor_db"),
            {
                "vectors": jnp.zeros_like(pipe.db.vectors),
                "global_ids": jnp.zeros_like(pipe.db.global_ids),
                "count": jnp.zeros_like(pipe.db.count),
                "total": jnp.zeros_like(pipe.db.total),
            },
        )
        pipe.db = ddb.DescriptorDB(
            vectors=restored["vectors"],
            global_ids=restored["global_ids"],
            count=restored["count"],
            total=restored["total"],
        )

    with np.load(os.path.join(directory, "keyframes.npz")) as z:
        pipe.store = KeyframeStore.from_state_dict({k: z[k] for k in z.files})

    pipe.db_gid_to_store = [int(i) for i in manifest["db_gid_to_store"]]
    kid = manifest["kidnap"]
    pipe.kidnap.world_id = int(kid["world_id"])
    pipe.kidnap.intervals = [list(iv) for iv in kid["intervals"]]
    pipe.loop_edges = [
        LoopEdge(
            stamp_curr=e["timestamp1"],
            stamp_prev=e["timestamp0"],
            idx_curr=e["idx1"],
            idx_prev=e["idx0"],
            T_prev_curr=np.asarray(e["pose_1T0"], np.float32),
            weight=e["weight"],
            n_matches=e["n_matches"],
            description=e.get("description", ""),
        )
        for e in manifest["loop_edges"]
    ]

    img_dir = os.path.join(directory, "images")
    if os.path.isdir(img_dir):
        pipe.images = ImageStore.load_from(
            img_dir,
            stash_dir=stash_dir or pipe.cfg.runtime.stash_dir,
            cache_ttl=pipe.cfg.runtime.image_cache_ttl,
        )
    return pipe
