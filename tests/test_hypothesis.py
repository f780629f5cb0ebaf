"""HypothesisManager (Method D) + top-k methods B/C behavior tests."""

import jax.numpy as jnp
import numpy as np

from cerebro_tpu.config import LoopConfig
from cerebro_tpu.loop import hypothesis as hyp
from cerebro_tpu.loop.topk_methods import clique_topk_candidates, naive_topk_candidates

CFG = LoopConfig()


def feed(table, pairs, promote_support=4):
    """pairs: list of (a, b, dot)."""
    B = len(pairs)
    a = jnp.asarray([p[0] for p in pairs], jnp.int32)
    b = jnp.asarray([p[1] for p in pairs], jnp.int32)
    d = jnp.asarray([p[2] for p in pairs], jnp.float32)
    v = jnp.ones((B,), bool)
    return hyp.update(CFG, table, a, b, d, v, promote_support=promote_support)


def test_consistent_pairs_build_one_hypothesis():
    t = hyp.create_table(16)
    # a drifting consistent track: (100,10), (101,11), ... all strong
    t, prom, a, b, s = feed(t, [(100 + i, 10 + i, 0.95) for i in range(5)])
    act = np.asarray(t.active)
    assert act.sum() == 1
    i = int(np.argmax(act))
    assert int(t.support[i]) == 5
    assert np.asarray(prom)[i]  # crossed promote_support=4
    assert abs(float(s[i]) - 0.95) < 1e-5


def test_scattered_pairs_spawn_many_and_die():
    t = hyp.create_table(16)
    # far-apart pairs never join (locality 7)
    t, prom, *_ = feed(t, [(100, 10, 0.9), (100, 200, 0.9), (100, 400, 0.9)])
    assert int(np.asarray(t.active).sum()) == 3
    assert not np.any(np.asarray(prom))
    # decay with no support: TTL 20 - 4/digest -> dead after 5 digests
    for _ in range(5):
        t, prom, *_ = feed(t, [(999, 999, 0.0)])  # weak pair, only digests
    assert int(np.asarray(t.active).sum()) <= 1  # only the weak-spawn slot at most


def test_weak_dots_ignored():
    t = hyp.create_table(8)
    t, prom, *_ = feed(t, [(100, 10, 0.5), (101, 11, 0.6)])  # below 0.85
    assert int(np.asarray(t.active).sum()) == 0


def test_naive_topk_method():
    # 5 consecutive queries all retrieving ~history index 40
    vals = jnp.asarray(np.tile([[0.95, 0.5, 0.4, 0.3, 0.2]], (5, 1)), jnp.float32)
    idx = jnp.asarray(
        np.stack([[40 + i, 500, 600, 700, 800] for i in range(5)]), jnp.int32
    )
    q = jnp.arange(100, 105, dtype=jnp.int32)
    curr, prev, score, ok = naive_topk_candidates(
        CFG, vals, idx, q, jnp.ones(5, bool)
    )
    assert bool(ok[2]) and bool(ok[4])
    assert int(prev[4]) == 44
    # weak scores -> rejected
    curr, prev, score, ok = naive_topk_candidates(
        CFG, vals * 0.5, idx, q, jnp.ones(5, bool)
    )
    assert not np.any(np.asarray(ok))


def test_clique_topk_method():
    # hits cluster around history 40 with stragglers elsewhere
    vals = jnp.asarray(
        np.stack([[0.9, 0.88, 0.3, 0.2, 0.1]] * 4), jnp.float32
    )
    idx = jnp.asarray(
        np.stack([[40 + i, 41 + i, 900, 500, 700] for i in range(4)]), jnp.int32
    )
    q = jnp.arange(200, 204, dtype=jnp.int32)
    curr, prev, score, ok = clique_topk_candidates(
        CFG, vals, idx, q, jnp.ones(4, bool), n_cliques=1
    )
    assert bool(ok[0])
    assert abs(int(prev[0]) - 42) <= CFG.hypothesis_locality
    assert int(curr[0]) == 203
