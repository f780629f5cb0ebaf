"""Top-k (faiss-style) candidate generators: the reference's Methods B & C.

Method B — ``faiss__naive_loopcandidate_generator`` (src/Cerebro.cpp:366-
492): k-NN (k=5) retrieval per query, accept the best neighbor when its dot
exceeds 0.9 and the per-query argmaxes of consecutive queries agree within
a locality window — the same temporal rule as Method A, so it shares
detector.temporal_consistency INCLUDING its 2-entry cross-batch carry:
streaming one frame at a time and batching are equivalent (the reference is
purely streaming, so batch boundaries must not change behavior).

Method C — ``faiss_clique_loopcandidate_generator`` (src/Cerebro.cpp:506-
722): accumulate k-NN hits over W consecutive queries (ref W=4), merge
neighbors within ±merge_locality into cliques, score each clique by hit
count, and keep the best clique(s) — subsampling when more than one
survives so the pose-compute stage is not flooded (ref random subsampling
:668-702; here: deterministic top-1 by support, the strongest clique).
Cross-batch behavior: the hits of the last W-1 queries are carried so a
clique can span a batch boundary.

Both are pure functions over the top-k results of ops.similarity.search_
topk / parallel.sharded_topk, so they run unmodified on the sharded DB.
All history indices are GLOBAL ids (ring-safe, db/descriptors.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from cerebro_tpu.config import LoopConfig
from cerebro_tpu.loop.detector import (
    DetectorState,
    LoopCandidates,
    init_state,
    temporal_consistency,
)

# ref accumulates hits over 4 consecutive frames (src/Cerebro.cpp:506-722)
CLIQUE_WINDOW = 4


@functools.partial(jax.jit, static_argnames=("cfg", "threshold"))
def naive_topk_candidates(
    cfg: LoopConfig,
    state: DetectorState,
    topk_vals: jax.Array,  # (Q, k) scores, queries consecutive
    topk_idx: jax.Array,  # (Q, k) history global ids
    query_idx: jax.Array,  # (Q,) global indices of the queries
    query_valid: jax.Array,  # (Q,) bool
    searchable: jax.Array,  # (Q,) bool — query has a non-empty window
    threshold: float = 0.9,  # ref faiss variant uses 0.9 (src/Cerebro.cpp:375)
) -> Tuple[LoopCandidates, DetectorState]:
    """Method B. Same 3-consecutive-argmax rule as Method A applied to the
    best top-k hit, with the cross-batch 2-entry carry."""
    cfg_b = dataclasses.replace(cfg, dot_threshold=threshold)
    return temporal_consistency(
        cfg_b,
        state,
        topk_vals[:, 0],
        topk_idx[:, 0],
        query_idx,
        searchable & query_valid,
        query_valid,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CliqueState:
    """Carry for Method C: the top-k hits of the last W-1 queries."""

    idx: jax.Array  # (W-1, k) int32 global ids
    val: jax.Array  # (W-1, k) float32
    ok: jax.Array  # (W-1, k) bool


def init_clique_state(k: int, window: int = CLIQUE_WINDOW) -> CliqueState:
    w1 = max(window - 1, 0)
    return CliqueState(
        idx=jnp.zeros((w1, k), jnp.int32),
        val=jnp.full((w1, k), -jnp.inf, jnp.float32),
        ok=jnp.zeros((w1, k), bool),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "threshold", "min_support"))
def clique_topk_candidates(
    cfg: LoopConfig,
    state: CliqueState,
    topk_vals: jax.Array,  # (Q, k)
    topk_idx: jax.Array,  # (Q, k)
    query_idx: jax.Array,  # (Q,)
    query_valid: jax.Array,  # (Q,)
    threshold: float = 0.85,
    min_support: int | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, CliqueState]:
    """Method C, PER QUERY: for each query q, merge the top-k hits of the W
    newest queries ending at q (carry + this batch) into history-axis
    cliques of width ±hypothesis_locality and emit the best-supported
    clique's center — one candidate slot per query, like the reference's
    per-tick digest over its 4-frame accumulation window
    (src/Cerebro.cpp:506-722). A clique fires when its hit count reaches
    ``min_support`` (default cfg.hypothesis_promote, mirroring Method A's
    3-consecutive rule) and its best dot beats ``threshold``.

    Streaming-equivalent: row q's window sees exactly the hits a streamed
    run would hold in its carry; invalid (padded) queries contribute no
    hits. Returns (curr (Q,), prev (Q,), score (Q,), valid (Q,), state)."""
    Q, k = topk_vals.shape
    loc = cfg.hypothesis_locality
    ms = cfg.hypothesis_promote if min_support is None else min_support
    W = state.idx.shape[0] + 1  # carry holds W-1 rows

    batch_ok = (topk_vals > threshold) & query_valid[:, None]
    all_idx = jnp.concatenate([state.idx, topk_idx])  # (W-1+Q, k)
    all_val = jnp.concatenate([state.val, topk_vals])
    all_ok = jnp.concatenate([state.ok, batch_ok])

    # (Q, W*k) rolling windows: row q sees queries q-W+1 .. q
    wi = jnp.stack([all_idx[i : i + Q] for i in range(W)], 1).reshape(Q, W * k)
    wv = jnp.stack([all_val[i : i + Q] for i in range(W)], 1).reshape(Q, W * k)
    wo = jnp.stack([all_ok[i : i + Q] for i in range(W)], 1).reshape(Q, W * k)

    # support of hit h = number of window hits within ±loc on the history axis
    near = jnp.abs(wi[:, :, None] - wi[:, None, :]) <= loc
    support = jnp.sum(near & wo[:, None, :] & wo[:, :, None], axis=-1)
    support = jnp.where(wo, support, 0)  # (Q, W*k)

    best = jnp.argmax(support, axis=-1)  # (Q,)
    center = jnp.take_along_axis(wi, best[:, None], 1)[:, 0]
    supp = jnp.take_along_axis(support, best[:, None], 1)[:, 0]
    in_clique = (jnp.abs(wi - center[:, None]) <= loc) & wo
    score = jnp.max(jnp.where(in_clique, wv, -jnp.inf), axis=-1)
    valid = (supp >= ms) & (score > threshold) & query_valid

    # Carry the newest W-1 REAL queries' hits across the batch boundary.
    w1 = W - 1
    n_valid = jnp.sum(query_valid.astype(jnp.int32))
    take = jnp.clip(n_valid, 0, None) + jnp.arange(w1)  # last w1 real rows
    take = jnp.clip(take, 0, w1 + Q - 1)
    new_state = CliqueState(
        idx=all_idx[take], val=all_val[take], ok=all_ok[take]
    )
    return query_idx, center, score, valid, new_state
