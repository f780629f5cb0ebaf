"""Device-resident descriptor database as functional state (true ring).

The reference's equivalent is a statically preallocated Eigen matrix of
29 000 descriptor columns guarded by a mutex, appended on each tick and
hard-capped (src/Cerebro.cpp:946,1002-1013). Here the DB is a frozen pytree
holding a fixed-capacity ``(N, D)`` device array plus per-row **global ids**
and a cumulative ``total``; ``append`` is a pure scatter so the whole thing
lives inside jit and donates cleanly. Capacity is static — XLA never
recompiles as the map grows (SURVEY.md §5.7) — and past capacity the buffer
wraps: the oldest rows are evicted, never the newest (the reference would
silently stop at its cap; a ring keeps relocalizing against the recent map).

Masking model: every search masks by ``global_ids[row] < limit`` instead of
``row < limit``. Pre-wrap the two are identical (gid == row); post-wrap the
gid comparison stays correct because ids are monotone in time regardless of
where the ring put them. Rows never written (or written by the invalid tail
of a partial batch) carry ``GID_INVALID`` = int32 max, which no limit ever
exceeds. Search kernels return matches as global ids, so the host-side
``global id -> keyframe store`` map is append-only and never invalidated by
eviction.

For multi-host scale the same container is sharded over the mesh's ``db``
axis by parallel/sharded_search.py; the gid array shards alongside the rows.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

# Rows carrying this id are unmatchable: limits are at most `total`, which
# is always far below int32 max.
GID_INVALID = jnp.iinfo(jnp.int32).max


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DescriptorDB:
    vectors: jax.Array  # (capacity, D) — bf16 or f32 unit descriptors
    global_ids: jax.Array  # (capacity,) int32 — per-row global index, GID_INVALID if empty
    count: jax.Array  # () int32 — number of valid rows (= min(total, capacity))
    total: jax.Array  # () int32 — cumulative appended entries (monotone)

    @property
    def capacity(self) -> int:
        return self.vectors.shape[0]

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]


def create(capacity: int, dim: int, dtype=jnp.bfloat16) -> DescriptorDB:
    return DescriptorDB(
        vectors=jnp.zeros((capacity, dim), dtype),
        global_ids=jnp.full((capacity,), GID_INVALID, jnp.int32),
        count=jnp.zeros((), jnp.int32),
        total=jnp.zeros((), jnp.int32),
    )


@jax.jit
def append(db: DescriptorDB, descs: jax.Array, n_new: jax.Array) -> DescriptorDB:
    """Append the first ``n_new`` rows of ``descs`` (B, D) at the ring head.

    B is static; n_new <= B is dynamic (partial batches at stream end).
    Rows of the batch past ``n_new`` are written with GID_INVALID so they
    stay unmatchable until real entries overwrite them.
    """
    B = descs.shape[0]
    cap = db.capacity
    assert B <= cap, f"batch {B} exceeds DB capacity {cap}"
    j = jnp.arange(B, dtype=jnp.int32)
    rows = (db.total + j) % cap
    gids = jnp.where(j < n_new.astype(jnp.int32), db.total + j, GID_INVALID)
    vectors = db.vectors.at[rows].set(descs.astype(db.vectors.dtype))
    global_ids = db.global_ids.at[rows].set(gids)
    total = db.total + n_new.astype(jnp.int32)
    return DescriptorDB(
        vectors=vectors,
        global_ids=global_ids,
        count=jnp.minimum(total, cap),
        total=total,
    )


@functools.partial(jax.jit, static_argnames=("exclusion",))
def query_limits(db, global_idx: jax.Array, exclusion: int) -> jax.Array:
    """Per-query exclusive bound on matchable GLOBAL ids: query with global
    index g may match entries with id < g - exclusion (ref src/Cerebro.cpp:914
    ``l - 50``), clipped to what has actually been appended."""
    return jnp.clip(global_idx.astype(jnp.int32) - exclusion, 0, db.total)


# ---------------------------------------------------------------------------
# Int8-quantized DB variant: same contract, half the HBM per row (double the
# 29k capacity per byte) and int8 MXU scoring. Descriptors are unit-norm, so
# per-row symmetric quantization costs <2e-2 in dot product — far inside the
# 0.85 detection threshold's margin (see ops/similarity tests).
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantizedDB:
    values: jax.Array  # (capacity, D) int8
    scales: jax.Array  # (capacity,) f32 per-row dequant scale
    global_ids: jax.Array  # (capacity,) int32
    count: jax.Array  # () int32
    total: jax.Array  # () int32

    @property
    def capacity(self) -> int:
        return self.values.shape[0]

    @property
    def dim(self) -> int:
        return self.values.shape[1]


def create_quantized(capacity: int, dim: int) -> QuantizedDB:
    return QuantizedDB(
        values=jnp.zeros((capacity, dim), jnp.int8),
        scales=jnp.zeros((capacity,), jnp.float32),
        global_ids=jnp.full((capacity,), GID_INVALID, jnp.int32),
        count=jnp.zeros((), jnp.int32),
        total=jnp.zeros((), jnp.int32),
    )


@jax.jit
def append_quantized(db: QuantizedDB, descs: jax.Array, n_new: jax.Array) -> QuantizedDB:
    """Quantize the batch per row and append (same ring semantics as the
    float ``append``)."""
    from cerebro_tpu.ops.similarity import quantize_rows

    q, s = quantize_rows(descs.astype(jnp.float32))
    B = descs.shape[0]
    cap = db.capacity
    assert B <= cap, f"batch {B} exceeds DB capacity {cap}"
    j = jnp.arange(B, dtype=jnp.int32)
    rows = (db.total + j) % cap
    gids = jnp.where(j < n_new.astype(jnp.int32), db.total + j, GID_INVALID)
    values = db.values.at[rows].set(q)
    scales = db.scales.at[rows].set(s)
    global_ids = db.global_ids.at[rows].set(gids)
    total = db.total + n_new.astype(jnp.int32)
    return QuantizedDB(
        values=values,
        scales=scales,
        global_ids=global_ids,
        count=jnp.minimum(total, cap),
        total=total,
    )


def from_rows(vectors: jax.Array, n_valid: int | None = None) -> DescriptorDB:
    """Build a pre-wrap DB directly from a row matrix: row i is entry i.
    Rows >= n_valid are unmatchable. Convenience for benches/tests."""
    n = vectors.shape[0]
    if n_valid is None:
        n_valid = n
    gids = jnp.where(
        jnp.arange(n, dtype=jnp.int32) < n_valid,
        jnp.arange(n, dtype=jnp.int32),
        GID_INVALID,
    )
    return DescriptorDB(
        vectors=vectors,
        global_ids=gids,
        count=jnp.asarray(min(n_valid, n), jnp.int32),
        total=jnp.asarray(n_valid, jnp.int32),
    )
