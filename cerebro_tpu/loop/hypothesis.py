"""Multi-hypothesis temporal tracker (the reference's Method D).

Re-implements HypothesisManager (src/HypothesisManager.{h,cpp}; fed by
``faiss_multihypothesis_tracking``, src/Cerebro.cpp:731-885) as a
fixed-shape functional state updated entirely on device:

  * a putative pair (a, b, dot>0.85) JOINS an active hypothesis when (a, b)
    is within ±locality (ref ±7, src/HypothesisManager.cpp:51) of the
    hypothesis tail; otherwise it SPAWNS a new one in a free slot;
  * TTL starts at 20 (ref src/HypothesisManager.h:32), +1 on support with
    acceleration past 100 total support (ref :110-122), −decay per digest
    tick (ref −4, src/HypothesisManager.cpp:74-86);
  * a hypothesis whose TTL reaches 0 dies; one whose support crosses the
    promotion threshold emits a loop-candidate (a_tail, b_tail, mean dot).

The table is a fixed H-slot array; updates are one-hot scatters, so a whole
batch of putative pairs processes as a lax.scan — no Python branching.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from cerebro_tpu.config import LoopConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HypothesisTable:
    a_tail: jax.Array  # (H,) int32 — newest query index in the hypothesis
    b_tail: jax.Array  # (H,) int32 — newest matched history index
    ttl: jax.Array  # (H,) int32
    support: jax.Array  # (H,) int32 — number of joined pairs
    score_sum: jax.Array  # (H,) float32 — sum of dots (mean = sum/support)
    active: jax.Array  # (H,) bool


def create_table(capacity: int = 64) -> HypothesisTable:
    z = jnp.zeros((capacity,), jnp.int32)
    return HypothesisTable(
        a_tail=z,
        b_tail=z,
        ttl=z,
        support=z,
        score_sum=jnp.zeros((capacity,), jnp.float32),
        active=jnp.zeros((capacity,), bool),
    )


def _add_one(table: HypothesisTable, a, b, dot, valid, cfg: LoopConfig):
    """Insert one putative pair (traced; no python control flow)."""
    loc = cfg.hypothesis_locality
    near = (
        (jnp.abs(table.a_tail - a) <= loc)
        & (jnp.abs(table.b_tail - b) <= loc)
        & table.active
    )
    has_match = jnp.any(near)
    join_idx = jnp.argmax(near)  # first matching hypothesis

    # free slot for a spawn: first inactive; if none, lowest-TTL slot
    any_free = jnp.any(~table.active)
    free_idx = jnp.where(
        any_free, jnp.argmax(~table.active), jnp.argmin(table.ttl)
    )
    idx = jnp.where(has_match, join_idx, free_idx)
    onehot = (jnp.arange(table.ttl.shape[0]) == idx) & valid

    # TTL: join -> +1 (accelerated +5 past 100 support, ref :110-122);
    # spawn -> initial TTL
    accel = jnp.where(table.support[idx] > 100, 5, 1)
    new_ttl_val = jnp.where(
        has_match, table.ttl[idx] + accel, cfg.hypothesis_ttl
    )
    new_support = jnp.where(has_match, table.support[idx] + 1, 1)
    new_score = jnp.where(has_match, table.score_sum[idx] + dot, dot)

    new_table = HypothesisTable(
        a_tail=jnp.where(onehot, a, table.a_tail),
        b_tail=jnp.where(onehot, b, table.b_tail),
        ttl=jnp.where(onehot, new_ttl_val, table.ttl),
        support=jnp.where(onehot, new_support, table.support),
        score_sum=jnp.where(onehot, new_score, table.score_sum),
        active=table.active | onehot,
    )
    # spawn = a NEW hypothesis took this slot (fresh or recycled): consumers
    # latching per-slot state (e.g. the pipeline's emitted-mask) must reset.
    spawned = onehot & ~has_match
    return new_table, spawned


@functools.partial(jax.jit, static_argnames=("cfg", "promote_support"))
def update(
    cfg: LoopConfig,
    table: HypothesisTable,
    pairs_a: jax.Array,  # (B,) int32 query indices
    pairs_b: jax.Array,  # (B,) int32 matched history indices
    dots: jax.Array,  # (B,) float32
    pair_valid: jax.Array,  # (B,) bool
    promote_support: int = 8,
) -> Tuple[HypothesisTable, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Feed a batch of putative pairs, then apply one digest (TTL decay).

    Returns (table, promoted (H,) bool, a_tail, b_tail, mean_score, spawned
    (H,) bool) where ``promoted`` marks hypotheses that crossed the support
    threshold this call — the Method-D loop candidates — and ``spawned``
    marks slots a NEW hypothesis claimed this call (including recycled
    slots, ref HypothesisManager slot reuse src/HypothesisManager.cpp:51-86),
    so per-slot latches held by the caller must reset.
    """
    strong = pair_valid & (dots > cfg.dot_threshold)

    def body(carry, inp):
        tbl, sp = carry
        a, b, d, v = inp
        tbl, spawned_one = _add_one(tbl, a, b, d, v, cfg)
        return (tbl, sp | spawned_one), None

    H = table.ttl.shape[0]
    (table, spawned), _ = jax.lax.scan(
        body, (table, jnp.zeros((H,), bool)), (pairs_a, pairs_b, dots, strong)
    )

    # digest: decay TTL, kill dead hypotheses (ref -4/digest)
    ttl = table.ttl - cfg.hypothesis_decay
    alive = table.active & (ttl > 0)

    promoted = alive & (table.support >= promote_support)
    mean_score = table.score_sum / jnp.maximum(
        table.support.astype(jnp.float32), 1.0
    )

    out = HypothesisTable(
        a_tail=table.a_tail,
        b_tail=table.b_tail,
        ttl=jnp.where(alive, ttl, 0),
        support=jnp.where(alive, table.support, 0),
        score_sum=jnp.where(alive, table.score_sum, 0.0),
        active=alive,
    )
    return out, promoted, table.a_tail, table.b_tail, mean_score, spawned
