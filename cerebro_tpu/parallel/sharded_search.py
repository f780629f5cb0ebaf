"""Descriptor-DB search sharded over the device mesh.

This is the sequence-parallel content of the build (SURVEY.md §5.7): the
ever-growing descriptor history — the reference's single 29 000-column CPU
matrix (src/Cerebro.cpp:946) — is sharded row-wise across devices. Each
device scores queries against its local shard with the single-chip kernel
(ops/similarity.py), then the (max, argmax) / top-k partials are merged
with one tiny all-gather over ICI. The full (Q, N) score matrix never
exists on any chip, and per-device HBM traffic drops by 1/n_devices.

Implemented with ``shard_map`` so the collective schedule is explicit; the
merge payload is O(Q * n_devices), negligible vs the matmul.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cerebro_tpu.config import LoopConfig
from cerebro_tpu.db.descriptors import DescriptorDB, query_limits
from cerebro_tpu.loop import detector
from cerebro_tpu.ops import similarity


def merge_payload_bytes(n_queries: int, n_devices: int, k: int = 1) -> int:
    """Exact bytes of the cross-device merge for one search step: each
    device all-gathers its (Q, k) f32 partial maxima and (Q, k) i32 global
    ids, so every device ends holding n_dev * Q * k * (4 + 4) bytes. This
    is the ENTIRE inter-chip traffic of the sharded search — O(Q * n), vs
    the O(Q * rows * D) matmul each chip does locally — and is what makes
    the >=80%-at-2-hosts target an engineering certainty rather than a
    hope (see scripts/bench_scaling.py roofline; asserted against the
    compiled HLO in tests/test_sharded_search.py)."""
    return n_queries * n_devices * k * (4 + 4)


def shard_db(db: DescriptorDB, mesh: Mesh, axis: str = "db") -> DescriptorDB:
    """Place the DB with rows (and their global ids) sharded over the mesh
    axis; the count/total scalars are replicated."""
    vec_sharding = NamedSharding(mesh, P(axis, None))
    gid_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return DescriptorDB(
        vectors=jax.device_put(db.vectors, vec_sharding),
        global_ids=jax.device_put(db.global_ids, gid_sharding),
        count=jax.device_put(db.count, rep),
        total=jax.device_put(db.total, rep),
    )


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "use_pallas"))
def sharded_max_and_argmax(
    queries: jax.Array,  # (Q, D) replicated
    db_vectors: jax.Array,  # (N, D) sharded over rows
    limits: jax.Array,  # (Q,) int32 global exclusive gid bounds
    gids: jax.Array,  # (N,) int32 per-row global ids, sharded with the rows
    mesh: Mesh,
    axis: str = "db",
    use_pallas: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Global (max, matched gid) per query over the row-sharded DB.

    Global ids make the shard-local mask trivially correct: every shard
    masks by ``gid < limit`` directly — no offset arithmetic, and ring wrap
    needs no special case."""

    def local(queries, db_shard, limits, gid_shard):
        mx, ar = similarity.max_and_argmax(
            queries, db_shard, limits, gid_shard, use_pallas=use_pallas
        )
        # Shards holding no matchable entries contribute NEG_INF automatically.
        all_mx = jax.lax.all_gather(mx, axis)  # (n_dev, Q)
        all_ar = jax.lax.all_gather(ar, axis)  # gids already global
        best = jnp.argmax(all_mx, axis=0)  # (Q,)
        gmx = jnp.take_along_axis(all_mx, best[None, :], axis=0)[0]
        gar = jnp.take_along_axis(all_ar, best[None, :], axis=0)[0]
        return gmx, gar

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, db_vectors, limits, gids)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "k"))
def sharded_topk(
    queries: jax.Array,  # (Q, D) replicated
    db_vectors: jax.Array,  # (N, D) sharded over rows
    limits: jax.Array,  # (Q,) int32
    gids: jax.Array,  # (N,) int32 sharded with the rows
    mesh: Mesh,
    axis: str = "db",
    k: int = 5,
) -> Tuple[jax.Array, jax.Array]:
    """Distributed top-k retrieval: local top-k per shard, all-gather the
    k*n_dev partials, re-top-k. Exact for any k <= rows_per_shard.
    Returned indices are global ids."""
    n_dev = mesh.shape[axis]

    def local(queries, db_shard, limits, gid_shard):
        s = similarity.scores_xla(queries, db_shard, limits, gid_shard)
        v, i = jax.lax.top_k(s, k)  # (Q, k) local rows
        gi_local = gid_shard[i]  # -> global ids
        av = jax.lax.all_gather(v, axis, axis=1)  # (Q, n_dev, k)
        ai = jax.lax.all_gather(gi_local, axis, axis=1)
        av = av.reshape(queries.shape[0], n_dev * k)
        ai = ai.reshape(queries.shape[0], n_dev * k)
        gv, gi = jax.lax.top_k(av, k)
        return gv, jnp.take_along_axis(ai, gi, axis=1)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, db_vectors, limits, gids)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis", "use_pallas"))
def detect_batch_sharded(
    cfg: LoopConfig,
    db: DescriptorDB,
    state: detector.DetectorState,
    queries: jax.Array,
    global_idx: jax.Array,
    query_valid: jax.Array,
    mesh: Mesh,
    axis: str = "db",
    use_pallas: bool = True,
) -> Tuple[detector.LoopCandidates, detector.DetectorState]:
    """Multi-device variant of loop.detector.detect_batch: sharded search,
    identical temporal-consistency semantics."""
    limits = query_limits(db, global_idx, cfg.exclusion_window)
    mx, ar = sharded_max_and_argmax(
        queries, db.vectors, limits, db.global_ids, mesh, axis=axis,
        use_pallas=use_pallas,
    )
    searchable = (limits > 0) & query_valid
    return detector.temporal_consistency(
        cfg, state, mx, ar, global_idx, searchable, query_valid
    )


# ---------------------------------------------------------------------------
# Int8-quantized DB, sharded: same row-sharding + tiny all-gather merge as
# the float path, with the int8 MXU scoring kernel per shard. Lifts the
# "quantized DB xor mesh" limitation: pod-scale history AND half the HBM
# per row compose.
# ---------------------------------------------------------------------------


def shard_db_quantized(db, mesh: Mesh, axis: str = "db"):
    """Row-shard a db.descriptors.QuantizedDB over the mesh axis."""
    from cerebro_tpu.db.descriptors import QuantizedDB

    return QuantizedDB(
        values=jax.device_put(db.values, NamedSharding(mesh, P(axis, None))),
        scales=jax.device_put(db.scales, NamedSharding(mesh, P(axis))),
        global_ids=jax.device_put(db.global_ids, NamedSharding(mesh, P(axis))),
        count=jax.device_put(db.count, NamedSharding(mesh, P())),
        total=jax.device_put(db.total, NamedSharding(mesh, P())),
    )


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def sharded_max_and_argmax_int8(
    queries: jax.Array,  # (Q, D) replicated float
    db_values: jax.Array,  # (N, D) int8, sharded over rows
    db_scales: jax.Array,  # (N,) f32, sharded with the rows
    limits: jax.Array,  # (Q,) int32 global exclusive gid bounds
    gids: jax.Array,  # (N,) int32, sharded with the rows
    mesh: Mesh,
    axis: str = "db",
) -> Tuple[jax.Array, jax.Array]:
    """Global (max, matched gid) per query over the row-sharded int8 DB."""

    def local(queries, val_shard, scale_shard, limits, gid_shard):
        mx, ar = similarity.max_and_argmax_int8(
            queries, val_shard, scale_shard, limits, gid_shard
        )
        all_mx = jax.lax.all_gather(mx, axis)  # (n_dev, Q)
        all_ar = jax.lax.all_gather(ar, axis)
        best = jnp.argmax(all_mx, axis=0)
        gmx = jnp.take_along_axis(all_mx, best[None, :], axis=0)[0]
        gar = jnp.take_along_axis(all_ar, best[None, :], axis=0)[0]
        return gmx, gar

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, db_values, db_scales, limits, gids)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis"))
def detect_batch_quantized_sharded(
    cfg: LoopConfig,
    db,  # QuantizedDB, row-sharded
    state: detector.DetectorState,
    queries: jax.Array,
    global_idx: jax.Array,
    query_valid: jax.Array,
    mesh: Mesh,
    axis: str = "db",
) -> Tuple[detector.LoopCandidates, detector.DetectorState]:
    """Multi-device detect_batch_quantized: sharded int8 search, identical
    temporal-consistency semantics."""
    limits = query_limits(db, global_idx, cfg.exclusion_window)
    mx, ar = sharded_max_and_argmax_int8(
        queries, db.values, db.scales, limits, db.global_ids, mesh, axis=axis
    )
    searchable = (limits > 0) & query_valid
    return detector.temporal_consistency(
        cfg, state, mx, ar, global_idx, searchable, query_valid
    )
