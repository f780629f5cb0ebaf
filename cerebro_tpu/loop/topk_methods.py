"""Top-k (faiss-style) candidate generators: the reference's Methods B & C.

Method B — ``faiss__naive_loopcandidate_generator`` (src/Cerebro.cpp:366-
492): k-NN (k=5) retrieval per query, accept the best neighbor when its dot
exceeds 0.9 and the per-query argmaxes of consecutive queries agree within
a locality window (same temporal rule as Method A but on top-k hits).

Method C — ``faiss_clique_loopcandidate_generator`` (src/Cerebro.cpp:506-
722): accumulate k-NN hits over W consecutive queries, merge neighbors
within ±merge_locality into cliques, score each clique by hit count, and
keep the best clique(s) — subsampling when more than one survives so the
pose-compute stage is not flooded (ref random subsampling :668-702; here:
deterministic top-1 by support, the strongest clique).

Both are pure functions over the top-k results of ops.similarity.search_
topk / parallel.sharded_topk, so they run unmodified on the sharded DB.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from cerebro_tpu.config import LoopConfig


@functools.partial(jax.jit, static_argnames=("cfg",))
def naive_topk_candidates(
    cfg: LoopConfig,
    topk_vals: jax.Array,  # (Q, k) scores, queries consecutive
    topk_idx: jax.Array,  # (Q, k) history indices
    query_idx: jax.Array,  # (Q,) global indices of the queries
    query_valid: jax.Array,  # (Q,) bool
    threshold: float = 0.9,  # ref faiss variant uses 0.9 (src/Cerebro.cpp:375)
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Method B. Returns (curr (Q,), prev (Q,), score (Q,), valid (Q,))."""
    best = topk_idx[:, 0]
    score = topk_vals[:, 0]
    # consecutive-query agreement (locality rule on the best hits)
    loc = cfg.locality_threshold
    prev_best = jnp.roll(best, 1).at[0].set(best[0])
    prev2_best = jnp.roll(best, 2).at[:2].set(best[:2][0])
    agree = (jnp.abs(best - prev_best) < loc) & (jnp.abs(best - prev2_best) < loc)
    ok = query_valid & (score > threshold) & agree
    return query_idx, best, score, ok


@functools.partial(jax.jit, static_argnames=("cfg", "n_cliques"))
def clique_topk_candidates(
    cfg: LoopConfig,
    topk_vals: jax.Array,  # (Q, k)
    topk_idx: jax.Array,  # (Q, k)
    query_idx: jax.Array,  # (Q,)
    query_valid: jax.Array,  # (Q,)
    threshold: float = 0.85,
    n_cliques: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Method C. Merge all (query-window x k) hits into history-axis
    cliques of width ±hypothesis_locality; return the top clique center(s).

    Returns (curr (n,), prev (n,), score (n,), valid (n,))."""
    Q, k = topk_vals.shape
    loc = cfg.hypothesis_locality

    flat_idx = topk_idx.reshape(-1)
    flat_val = topk_vals.reshape(-1)
    flat_ok = (flat_val > threshold) & jnp.repeat(query_valid, k)

    # support of hit h = number of other hits within +-loc on the history axis
    d = jnp.abs(flat_idx[:, None] - flat_idx[None, :]) <= loc
    d = d & flat_ok[None, :] & flat_ok[:, None]
    support = jnp.sum(d.astype(jnp.int32), axis=1)

    # greedy top-n clique extraction with suppression
    def pick(carry, _):
        sup, = carry
        c = jnp.argmax(sup)
        c_ok = sup[c] > 0
        center = flat_idx[c]
        # suppress the clique's hits
        in_clique = jnp.abs(flat_idx - center) <= loc
        sup = jnp.where(in_clique, 0, sup)
        # clique score = max dot within it
        score = jnp.max(jnp.where(in_clique & flat_ok, flat_val, -jnp.inf))
        return (sup,), (center, score, c_ok)

    (_,), (centers, scores, oks) = jax.lax.scan(
        pick, (support,), None, length=n_cliques
    )
    # attribute cliques to the newest VALID query (partial batches pad
    # query_idx past the appended rows — indexing [-1] blindly would point
    # at a frame that does not exist yet)
    last_valid = jnp.max(jnp.where(query_valid, query_idx, -1))
    curr = jnp.broadcast_to(last_valid, centers.shape)
    return curr, centers, scores, oks & (scores > threshold) & (last_valid >= 0)
