"""Device-resident descriptor database as functional state.

The reference's equivalent is a statically preallocated Eigen matrix of
29 000 descriptor columns guarded by a mutex, appended on each tick
(src/Cerebro.cpp:946,1002-1013). Here the DB is a frozen pytree holding a
fixed-capacity ``(N, D)`` device array plus a scalar count; ``append`` is a
pure function (dynamic_update_slice) so the whole thing lives inside jit
and donates cleanly. Capacity is static — XLA never recompiles as the map
grows (SURVEY.md §5.7: ring buffers + static shapes instead of the
reference's brute-force cap).

For multi-host scale the same container is sharded over the mesh's ``db``
axis by parallel/sharded_search.py; rows beyond ``count`` are invalid and
masked by search limits.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DescriptorDB:
    vectors: jax.Array  # (capacity, D) — bf16 or f32 unit descriptors
    count: jax.Array  # () int32 — number of valid rows

    @property
    def capacity(self) -> int:
        return self.vectors.shape[0]

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]


def create(capacity: int, dim: int, dtype=jnp.bfloat16) -> DescriptorDB:
    return DescriptorDB(
        vectors=jnp.zeros((capacity, dim), dtype),
        count=jnp.zeros((), jnp.int32),
    )


@jax.jit
def append(db: DescriptorDB, descs: jax.Array, n_new: jax.Array) -> DescriptorDB:
    """Append the first ``n_new`` rows of ``descs`` (B, D) at the tail.

    B is static; n_new <= B is dynamic (partial batches at stream end).
    Rows past capacity are dropped (the reference asserts at 29 000;
    we saturate instead).
    """
    B = descs.shape[0]
    cap = db.capacity
    # Write the whole B-row block at offset count, then advance count by
    # n_new — rows [count+n_new, count+B) are beyond count so stay invalid
    # and get overwritten by the next append.
    offset = jnp.minimum(db.count, cap - B)
    vectors = jax.lax.dynamic_update_slice(
        db.vectors, descs.astype(db.vectors.dtype), (offset, 0)
    )
    new_count = jnp.minimum(db.count + n_new.astype(jnp.int32), cap)
    return DescriptorDB(vectors=vectors, count=new_count)


@functools.partial(jax.jit, static_argnames=("exclusion",))
def query_limits(db: DescriptorDB, global_idx: jax.Array, exclusion: int) -> jax.Array:
    """Per-query exclusive row bound: query with global index g may match
    rows < g - exclusion (ref src/Cerebro.cpp:914 ``l - 50``), clipped to
    the valid range."""
    return jnp.clip(global_idx.astype(jnp.int32) - exclusion, 0, db.count)


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
    count: jax.Array  # () int32

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
        count=jnp.zeros((), jnp.int32),
    )


@jax.jit
def append_quantized(db: QuantizedDB, descs: jax.Array, n_new: jax.Array) -> QuantizedDB:
    """Quantize the batch per row and append (same saturation semantics as
    the float ``append``)."""
    from cerebro_tpu.ops.similarity import quantize_rows

    q, s = quantize_rows(descs.astype(jnp.float32))
    B = descs.shape[0]
    cap = db.capacity
    offset = jnp.minimum(db.count, cap - B)
    values = jax.lax.dynamic_update_slice(db.values, q, (offset, 0))
    scales = jax.lax.dynamic_update_slice(db.scales, s, (offset,))
    new_count = jnp.minimum(db.count + n_new.astype(jnp.int32), cap)
    return QuantizedDB(values=values, scales=scales, count=new_count)
