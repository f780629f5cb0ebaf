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

Digest cadence is anchored to the QUERY index, not the update() call: a
digest fires after every ``cfg.hypothesis_digest_every`` valid queries (the
reference digests once per 10 Hz tick, covering the ≤3 newest descriptors
scored that tick, src/Cerebro.cpp:1019-1032). The query counter, and the
per-slot emitted latch, are carried INSIDE the table, so feeding the stream
one query at a time or sixteen at a time produces identical emissions —
test_hypothesis.py::test_hypothesis_streamed_equals_batched locks this in.

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
    emitted: jax.Array  # (H,) bool — this hypothesis already emitted a
    # candidate (latch; reset when a new hypothesis claims the slot)
    qcount: jax.Array  # () int32 — valid queries seen since the last digest


def create_table(capacity: int = 64) -> HypothesisTable:
    z = jnp.zeros((capacity,), jnp.int32)
    return HypothesisTable(
        a_tail=z,
        b_tail=z,
        ttl=z,
        support=z,
        score_sum=jnp.zeros((capacity,), jnp.float32),
        active=jnp.zeros((capacity,), bool),
        emitted=jnp.zeros((capacity,), bool),
        qcount=jnp.zeros((), jnp.int32),
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

    # spawn = a NEW hypothesis took this slot (fresh or recycled): the
    # emitted latch resets (ref slot reuse, src/HypothesisManager.cpp:51-86)
    spawned = onehot & ~has_match
    return dataclasses.replace(
        table,
        a_tail=jnp.where(onehot, a, table.a_tail),
        b_tail=jnp.where(onehot, b, table.b_tail),
        ttl=jnp.where(onehot, new_ttl_val, table.ttl),
        support=jnp.where(onehot, new_support, table.support),
        score_sum=jnp.where(onehot, new_score, table.score_sum),
        active=table.active | onehot,
        emitted=table.emitted & ~spawned,
    )


def _digest(table: HypothesisTable, cfg: LoopConfig, promote_support: int):
    """One digest tick: decay TTL, kill dead slots, promote + latch."""
    ttl = table.ttl - cfg.hypothesis_decay
    alive = table.active & (ttl > 0)
    promoted = alive & (table.support >= promote_support)
    emit_now = promoted & ~table.emitted
    new = dataclasses.replace(
        table,
        ttl=jnp.where(alive, ttl, 0),
        support=jnp.where(alive, table.support, 0),
        score_sum=jnp.where(alive, table.score_sum, 0.0),
        active=alive,
        emitted=(table.emitted | promoted) & alive,
        qcount=jnp.zeros((), jnp.int32),
    )
    return new, emit_now


@functools.partial(jax.jit, static_argnames=("cfg", "promote_support"))
def update(
    cfg: LoopConfig,
    table: HypothesisTable,
    pairs_a: jax.Array,  # (B,) int32 query indices
    pairs_b: jax.Array,  # (B,) int32 matched history indices
    dots: jax.Array,  # (B,) float32
    pair_valid: jax.Array,  # (B,) bool — the hit exists (query real + scored)
    query_valid: jax.Array | None = None,  # (B,) bool — query slot is real
    # (advances digest time even when its hit is weak); None = all real
    promote_support: int = 8,
) -> Tuple[HypothesisTable, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Feed a batch of putative pairs, digesting at the query cadence.

    Returns ``(table, emits (B, H) bool, a_tails (B, H), b_tails (B, H),
    mean_scores (B, H))``: ``emits[q, h]`` marks hypothesis ``h`` crossing
    the promotion threshold at the digest following query ``q`` — with the
    tails/mean captured AT that digest, so a batched feed emits exactly what
    a one-query-at-a-time feed would.
    """
    strong = pair_valid & (dots > cfg.dot_threshold)
    qv = jnp.ones_like(strong) if query_valid is None else query_valid
    every = max(int(cfg.hypothesis_digest_every), 1)

    def body(tbl, inp):
        a, b, d, v, q = inp
        # insertion gates on the PAIR's validity alone; q only advances
        # the digest clock (with a flattened top-k feed, several pairs
        # share one query and only one slot carries the clock tick)
        tbl = _add_one(tbl, a, b, d, v, cfg)
        tbl = dataclasses.replace(
            tbl, qcount=tbl.qcount + jnp.where(q, 1, 0)
        )
        a_t, b_t = tbl.a_tail, tbl.b_tail
        mean = tbl.score_sum / jnp.maximum(tbl.support.astype(jnp.float32), 1.0)
        digested, emit_now = _digest(tbl, cfg, promote_support)
        do = tbl.qcount >= every
        tbl = jax.tree.map(
            lambda new, old: jnp.where(do, new, old), digested, tbl
        )
        return tbl, (emit_now & do, a_t, b_t, mean)

    table, (emits, a_tails, b_tails, means) = jax.lax.scan(
        body, table, (pairs_a, pairs_b, dots, strong, qv)
    )
    return table, emits, a_tails, b_tails, means
