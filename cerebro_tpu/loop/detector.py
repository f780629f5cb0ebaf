"""Loop-candidate generation: batched similarity + temporal consistency.

Re-implements the behavior of the reference's default candidate generator
``Cerebro::descrip_N__dot__descrip_0_N`` (src/Cerebro.cpp:903-1103):

  per new descriptor v at global index g, score u = v . M[:, 0:g-50];
  a loop is declared at g when the argmaxes of the scores of the 3 newest
  consecutive descriptors (g, g-1, g-2) agree within LOCALITY_THRESH=12
  frames and max(u) > DOT_PROD_THRESH=0.85 (thresholds at
  src/Cerebro.cpp:912-914, decision at :1056-1081); the emitted candidate
  is (t_curr=g, t_prev=argmax, score).

The reference does this for 3 queries per 10 Hz tick, sequentially, on one
CPU. Here an arbitrary batch of new descriptors is scored in one masked MXU
matmul (per-query exclusion limits), and the 3-way agreement is computed
across the batch with a 2-entry carry (argmax/max of the previous two
queries) so batch boundaries behave exactly like the streaming original.

Everything is fixed-shape and jit-compiled: the output is a dense (B,)
candidate set with a validity mask, consumed asynchronously by the
geometric-verification stage.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from cerebro_tpu.config import LoopConfig
from cerebro_tpu.db.descriptors import DescriptorDB, query_limits
from cerebro_tpu.ops import similarity


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DetectorState:
    """Carry across batches: scores of the 2 most recent queries."""

    prev_arg: jax.Array  # (2,) int32 — argmax of queries g-1 (slot 1), g-2 (slot 0)
    prev_max: jax.Array  # (2,) float32
    prev_valid: jax.Array  # (2,) bool — those queries existed (stream warm-up)


def init_state() -> DetectorState:
    return DetectorState(
        prev_arg=jnp.zeros((2,), jnp.int32),
        prev_max=jnp.full((2,), similarity.NEG_INF, jnp.float32),
        prev_valid=jnp.zeros((2,), bool),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LoopCandidates:
    """Dense fixed-shape candidate batch (one slot per query)."""

    curr_idx: jax.Array  # (B,) int32 global frame index of the query
    prev_idx: jax.Array  # (B,) int32 matched history frame index
    score: jax.Array  # (B,) float32 max dot product
    valid: jax.Array  # (B,) bool — passed threshold + 3-way locality test
    agree: jax.Array  # (B,) bool — locality agreement alone (pre-threshold);
    # valid == agree & (score > dot_threshold). Exposed so precision/recall
    # can be swept over the threshold offline without re-running detection.


def temporal_consistency(
    cfg: LoopConfig,
    state: DetectorState,
    mx: jax.Array,  # (B,) max score per query
    ar: jax.Array,  # (B,) argmax index per query
    global_idx: jax.Array,  # (B,)
    searchable: jax.Array,  # (B,) bool
    query_valid: jax.Array,  # (B,) bool
) -> Tuple[LoopCandidates, DetectorState]:
    """The 3-way argmax-locality + threshold rule applied over a batch with
    a 2-entry carry. Shared by the single-chip and sharded search paths."""
    B = mx.shape[0]
    mx = jnp.where(searchable, mx, similarity.NEG_INF)

    # Stack carry in front: args[i] corresponds to query position i-2
    # relative to the batch, so for batch slot j the triple is
    # (args[j+2], args[j+1], args[j]) == (g_j, g_j-1, g_j-2).
    args = jnp.concatenate([state.prev_arg, ar])  # (B+2,)
    maxs = jnp.concatenate([state.prev_max, mx])
    valids = jnp.concatenate([state.prev_valid, searchable])

    a0 = args[2:]  # current query g
    a1 = args[1:-1]  # g-1
    a2 = args[:-2]  # g-2

    # locality agreement over the newest `consistency_frames` queries
    # (ref src/Cerebro.cpp:1056: argmax(u), argmax(um), argmax(umm) within
    # LOCALITY_THRESH of each other; consistency_frames=2 drops the oldest
    # term — a recall/latency trade the threshold sweep can exploit).
    loc = cfg.locality_threshold
    if cfg.consistency_frames <= 2:
        v_all = valids[2:] & valids[1:-1]
        agree = jnp.abs(a0 - a1) < loc
    else:
        v_all = valids[2:] & valids[1:-1] & valids[:-2]
        agree = (
            (jnp.abs(a0 - a1) < loc)
            & (jnp.abs(a0 - a2) < loc)
            & (jnp.abs(a1 - a2) < loc)
        )
    strong = maxs[2:] > cfg.dot_threshold

    cands = LoopCandidates(
        curr_idx=global_idx.astype(jnp.int32),
        prev_idx=a0,
        score=maxs[2:],
        valid=v_all & agree & strong,
        agree=v_all & agree,
    )

    # New carry: last two REAL queries of this batch. With partial batches
    # (query_valid False at the tail) shift correctly using n_valid.
    n_valid = jnp.sum(query_valid.astype(jnp.int32))
    idx_last = jnp.clip(n_valid - 1, 0, B - 1) + 2  # position in stacked arrays
    idx_prev = jnp.clip(n_valid - 2, -1, B - 1) + 2

    # Carry update: n_valid==0 keeps [old0, old1]; n_valid==1 shifts to
    # [old1, new]; n_valid>=2 takes the last two new queries.
    def carry(arr, old):
        slot0 = jnp.where(
            n_valid >= 2, arr[idx_prev], jnp.where(n_valid == 1, old[1], old[0])
        )
        slot1 = jnp.where(n_valid > 0, arr[idx_last], old[1])
        return jnp.stack([slot0, slot1])

    new_state = DetectorState(
        prev_arg=carry(args, state.prev_arg),
        prev_max=carry(maxs, state.prev_max),
        prev_valid=carry(valids, state.prev_valid),
    )
    return cands, new_state


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TopKState:
    """Carry for the top-k detector: the top-k hit ids of the 2 newest
    queries (the locality rule needs the neighbors' hit sets)."""

    prev_idx: jax.Array  # (2, K) int32 global ids
    prev_ok: jax.Array  # (2,) bool — those queries existed and were searchable


def init_topk_state(k: int) -> TopKState:
    return TopKState(
        prev_idx=jnp.zeros((2, k), jnp.int32),
        prev_ok=jnp.zeros((2,), bool),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def temporal_consistency_topk(
    cfg: LoopConfig,
    state: TopKState,
    vals: jax.Array,  # (B, K) top-k scores per query, queries consecutive
    idx: jax.Array,  # (B, K) top-k history global ids
    global_idx: jax.Array,  # (B,)
    searchable: jax.Array,  # (B,) bool
    query_valid: jax.Array,  # (B,) bool
) -> Tuple[LoopCandidates, TopKState]:
    """Method A's locality rule generalized to k hits per query: hit (q, r)
    agrees when ANY hit of query q-1 (and q-2 for consistency_frames=3)
    lies within locality_threshold on the history axis. Near-duplicate hits
    within one query (same ±locality neighborhood) are deduplicated to the
    best-scoring one, so the verifier sees k DISTINCT revisit hypotheses —
    the widened frontier the reference's faiss methods trade for
    (src/Cerebro.cpp:366-722). Flattened (B*K,) candidates, row-major by
    query.

    Cross-batch carry mirrors temporal_consistency's 2-entry scheme, so
    streamed and batched feeds emit identical candidates."""
    B, K = vals.shape
    loc = cfg.locality_threshold
    vals = jnp.where(searchable[:, None], vals, similarity.NEG_INF)

    all_idx = jnp.concatenate([state.prev_idx, idx])  # (B+2, K)
    all_ok = jnp.concatenate([state.prev_ok, searchable])  # (B+2,)
    p1, p2 = all_idx[1:-1], all_idx[:-2]  # (B, K) neighbors' hit sets
    ok1, ok2 = all_ok[1:-1], all_ok[:-2]

    def any_near(a, b):  # (B, K) x (B, K) -> (B, K): min over b's hits
        return jnp.any(jnp.abs(a[:, :, None] - b[:, None, :]) < loc, axis=-1)

    if cfg.consistency_frames <= 2:
        agree = any_near(idx, p1) & ok1[:, None]
        v_all = ok1
    else:
        agree = any_near(idx, p1) & any_near(idx, p2)
        v_all = ok1 & ok2
    agree = agree & v_all[:, None]

    # within-query dedup: drop hit r when a strictly better hit (higher
    # score, or equal score at a lower rank) sits within ±loc of it
    near = jnp.abs(idx[:, :, None] - idx[:, None, :]) <= loc  # (B, K, K)
    r = jnp.arange(K)
    better = (vals[:, None, :] > vals[:, :, None]) | (
        (vals[:, None, :] == vals[:, :, None]) & (r[None, None, :] < r[None, :, None])
    )
    dominated = jnp.any(near & better, axis=-1)  # (B, K)
    keep = ~dominated & searchable[:, None]

    strong = vals > cfg.dot_threshold
    cands = LoopCandidates(
        curr_idx=jnp.repeat(global_idx.astype(jnp.int32), K),
        prev_idx=idx.reshape(-1),
        score=vals.reshape(-1),
        valid=(agree & keep & strong).reshape(-1),
        agree=(agree & keep).reshape(-1),
    )

    # carry: hit sets of the last two REAL queries (partial-batch safe)
    n_valid = jnp.sum(query_valid.astype(jnp.int32))
    pos_last = jnp.clip(n_valid - 1, 0, B - 1) + 2
    pos_prev = jnp.clip(n_valid - 2, -1, B - 1) + 2
    slot0 = jnp.where(
        n_valid >= 2,
        all_idx[pos_prev],
        jnp.where(n_valid == 1, state.prev_idx[1], state.prev_idx[0]),
    )
    slot1 = jnp.where(n_valid > 0, all_idx[pos_last], state.prev_idx[1])
    ok0 = jnp.where(
        n_valid >= 2,
        all_ok[pos_prev],
        jnp.where(n_valid == 1, state.prev_ok[1], state.prev_ok[0]),
    )
    okl = jnp.where(n_valid > 0, all_ok[pos_last], state.prev_ok[1])
    new_state = TopKState(
        prev_idx=jnp.stack([slot0, slot1]), prev_ok=jnp.stack([ok0, okl])
    )
    return cands, new_state


@functools.partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def detect_batch(
    cfg: LoopConfig,
    db: DescriptorDB,
    state: DetectorState,
    queries: jax.Array,  # (B, D) newest descriptors, consecutive
    global_idx: jax.Array,  # (B,) int32 their global frame indices
    query_valid: jax.Array,  # (B,) bool — slots holding real descriptors
    use_pallas: bool = True,
) -> Tuple[LoopCandidates, DetectorState]:
    """Score a batch of consecutive new descriptors and apply the 3-way
    temporal-consistency rule. Returns candidates + updated carry."""
    limits = query_limits(db, global_idx, cfg.exclusion_window)
    mx, ar = similarity.max_and_argmax(
        queries, db.vectors, limits, db.global_ids, use_pallas=use_pallas
    )  # (B,), (B,) — ar is a GLOBAL id (ring-safe, db/descriptors.py)
    searchable = (limits > 0) & query_valid
    return temporal_consistency(cfg, state, mx, ar, global_idx, searchable, query_valid)


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_batch_quantized(
    cfg: LoopConfig,
    db,  # QuantizedDB
    state: DetectorState,
    queries: jax.Array,  # (B, D)
    global_idx: jax.Array,  # (B,) int32
    query_valid: jax.Array,  # (B,) bool
) -> Tuple[LoopCandidates, DetectorState]:
    """detect_batch over an int8-quantized DB (db/descriptors.QuantizedDB):
    identical temporal-consistency semantics, int8 MXU scoring."""
    from cerebro_tpu.db.descriptors import query_limits
    from cerebro_tpu.ops.similarity import max_and_argmax_int8

    limits = query_limits(db, global_idx, cfg.exclusion_window)
    mx, ar = max_and_argmax_int8(
        queries, db.values, db.scales, limits, db.global_ids
    )
    searchable = (limits > 0) & query_valid
    return temporal_consistency(cfg, state, mx, ar, global_idx, searchable, query_valid)
