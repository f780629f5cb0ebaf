"""HypothesisManager (Method D) + top-k methods B/C behavior tests."""

import jax.numpy as jnp
import numpy as np

from cerebro_tpu.config import LoopConfig
from cerebro_tpu.loop import hypothesis as hyp
from cerebro_tpu.loop.topk_methods import clique_topk_candidates, naive_topk_candidates

# cadence pinned at 3: these tests document the digest-every-3-queries
# behavior (engine default is the sweep frontier, digest_every=1)
CFG = LoopConfig(hypothesis_digest_every=3)


def feed(table, pairs, promote_support=4):
    """pairs: list of (a, b, dot). Returns (table, emits (B,H), a, b, mean)."""
    B = len(pairs)
    a = jnp.asarray([p[0] for p in pairs], jnp.int32)
    b = jnp.asarray([p[1] for p in pairs], jnp.int32)
    d = jnp.asarray([p[2] for p in pairs], jnp.float32)
    v = jnp.ones((B,), bool)
    t, emits, aa, bb, ss = hyp.update(
        CFG, table, a, b, d, v, promote_support=promote_support
    )
    return t, emits, aa, bb, ss


def test_consistent_pairs_build_one_hypothesis():
    t = hyp.create_table(16)
    # a drifting consistent track: (100,10), (101,11), ... all strong.
    # digest_every=3: promotion is checked at digests after queries 3 and 6;
    # support crosses 4 at query 4, so the query-6 digest emits.
    t, emits, a, b, s = feed(t, [(100 + i, 10 + i, 0.95) for i in range(6)])
    act = np.asarray(t.active)
    assert act.sum() == 1
    i = int(np.argmax(act))
    assert int(t.support[i]) == 6
    emits = np.asarray(emits)
    q, h = np.nonzero(emits)
    assert list(h) == [i] and list(q) == [5]  # emitted at the query-6 digest
    assert abs(float(s[5, i]) - 0.95) < 1e-5
    # tails captured at emission: the newest pair at that digest
    assert int(a[5, i]) == 105 and int(b[5, i]) == 15


def test_scattered_pairs_spawn_many_and_die():
    t = hyp.create_table(16)
    # far-apart pairs never join (locality 7)
    t, emits, *_ = feed(t, [(100, 10, 0.9), (100, 200, 0.9), (100, 400, 0.9)])
    assert int(np.asarray(t.active).sum()) == 3
    assert not np.any(np.asarray(emits))
    # decay with no support: TTL 20 − 4 per digest (1 digest / 3 queries)
    # -> dead after 5 digests = 15 further queries
    for _ in range(15):
        t, emits, *_ = feed(t, [(999, 999, 0.0)])  # weak pair, advances time
    assert int(np.asarray(t.active).sum()) == 0


def test_weak_dots_ignored():
    t = hyp.create_table(8)
    t, emits, *_ = feed(t, [(100, 10, 0.5), (101, 11, 0.6)])  # below 0.85
    assert int(np.asarray(t.active).sum()) == 0


def test_hypothesis_streamed_equals_batched():
    """Method D must emit identical candidates fed 1 query at a time vs one
    big batch: digest cadence is anchored to the query index inside the
    table, not to update() calls (VERDICT r2 weak #4 — TTL used to decay
    once per call, so behavior depended on descriptor_batch)."""
    rng = np.random.default_rng(7)
    Q = 24
    a_idx = np.arange(200, 200 + Q, dtype=np.int32)
    # a supported revisit track with noise hits sprinkled in
    b_idx = np.where(
        np.arange(Q) % 3 == 2,
        rng.integers(400, 900, Q),
        40 + np.arange(Q) // 2,
    ).astype(np.int32)
    dots = rng.uniform(0.86, 0.97, Q).astype(np.float32)
    dots[Q // 2] = 0.2  # one weak hit: advances time, no insertion

    def collect(emits, a_t, b_t, q_off=0):
        e = np.asarray(emits)
        return sorted(
            (q + q_off, int(np.asarray(a_t)[q, h]), int(np.asarray(b_t)[q, h]))
            for q, h in zip(*np.nonzero(e))
        )

    tb = hyp.create_table(16)
    tb, emits, a_t, b_t, _ = hyp.update(
        CFG, tb, jnp.asarray(a_idx), jnp.asarray(b_idx), jnp.asarray(dots),
        jnp.ones(Q, bool), promote_support=4,
    )
    batched = collect(emits, a_t, b_t)

    ts = hyp.create_table(16)
    streamed = []
    for j in range(Q):
        ts, emits, a_t, b_t, _ = hyp.update(
            CFG, ts, jnp.asarray(a_idx[j : j + 1]), jnp.asarray(b_idx[j : j + 1]),
            jnp.asarray(dots[j : j + 1]), jnp.ones(1, bool), promote_support=4,
        )
        streamed.extend(collect(emits, a_t, b_t, q_off=j))
    assert batched == sorted(streamed)
    assert batched, "scenario must actually emit something"
    # and the final tables agree
    for f in ("a_tail", "b_tail", "ttl", "support", "active", "emitted", "qcount"):
        np.testing.assert_array_equal(
            np.asarray(getattr(tb, f)), np.asarray(getattr(ts, f)), err_msg=f
        )


def test_naive_topk_method():
    from cerebro_tpu.loop.detector import init_state

    # 5 consecutive queries all retrieving ~history index 40
    vals = jnp.asarray(np.tile([[0.95, 0.5, 0.4, 0.3, 0.2]], (5, 1)), jnp.float32)
    idx = jnp.asarray(
        np.stack([[40 + i, 500, 600, 700, 800] for i in range(5)]), jnp.int32
    )
    q = jnp.arange(100, 105, dtype=jnp.int32)
    ones = jnp.ones(5, bool)
    cands, _ = naive_topk_candidates(CFG, init_state(), vals, idx, q, ones, ones)
    ok, prev = np.asarray(cands.valid), np.asarray(cands.prev_idx)
    # warm-up: slots 0-1 have no carried triple, so they must NOT fire
    assert not ok[0] and not ok[1]
    assert ok[2] and ok[4]
    assert prev[4] == 44
    # weak scores -> rejected
    cands, _ = naive_topk_candidates(CFG, init_state(), vals * 0.5, idx, q, ones, ones)
    assert not np.any(np.asarray(cands.valid))


def test_naive_topk_streamed_equals_batched():
    """Method B must produce identical detections streamed 1 query at a time
    vs one 6-query batch (VERDICT r1 weak #2: the old roll-based version
    pinned slots 0-1 and lost agreement across batch boundaries)."""
    from cerebro_tpu.loop.detector import init_state

    rng = np.random.default_rng(3)
    Q = 6
    vals = np.clip(rng.uniform(0.88, 0.97, (Q, 5)), 0, 1).astype(np.float32)
    vals.sort(axis=1)
    vals = vals[:, ::-1].copy()
    # best hits drift within locality for the middle run, jump at the end
    best = np.array([40, 42, 44, 45, 300, 47], np.int32)
    idx = np.stack([[b, 500, 600, 700, 800] for b in best]).astype(np.int32)
    ones1 = jnp.ones(1, bool)

    batched, _ = naive_topk_candidates(
        CFG, init_state(), jnp.asarray(vals), jnp.asarray(idx),
        jnp.arange(100, 100 + Q, dtype=jnp.int32), jnp.ones(Q, bool), jnp.ones(Q, bool),
    )
    st = init_state()
    streamed_valid, streamed_prev = [], []
    for j in range(Q):
        c, st = naive_topk_candidates(
            CFG, st, jnp.asarray(vals[j : j + 1]), jnp.asarray(idx[j : j + 1]),
            jnp.asarray([100 + j], jnp.int32), ones1, ones1,
        )
        streamed_valid.append(bool(c.valid[0]))
        streamed_prev.append(int(c.prev_idx[0]))
    np.testing.assert_array_equal(np.asarray(batched.valid), streamed_valid)
    np.testing.assert_array_equal(np.asarray(batched.prev_idx), streamed_prev)


def test_clique_topk_method():
    from cerebro_tpu.loop.topk_methods import init_clique_state

    # hits cluster around history 40 with stragglers elsewhere
    vals = jnp.asarray(
        np.stack([[0.9, 0.88, 0.3, 0.2, 0.1]] * 4), jnp.float32
    )
    idx = jnp.asarray(
        np.stack([[40 + i, 41 + i, 900, 500, 700] for i in range(4)]), jnp.int32
    )
    q = jnp.arange(200, 204, dtype=jnp.int32)
    curr, prev, score, ok, _ = clique_topk_candidates(
        CFG, init_clique_state(5), vals, idx, q, jnp.ones(4, bool)
    )
    # per-query emission: the first query has no window support yet
    # (min_support = hypothesis_promote = 3); later queries fire
    assert not bool(ok[0])
    assert bool(ok[-1])
    assert abs(int(prev[-1]) - 42) <= CFG.hypothesis_locality
    assert int(curr[-1]) == 203


def test_clique_carry_spans_batch_boundary():
    """A clique whose support is split across two batches must still fire:
    the carry holds the last W-1 queries' hits."""
    from cerebro_tpu.loop.topk_methods import init_clique_state

    # batch 1: two hits near 40 (not enough alone to beat stragglers)
    vals1 = jnp.asarray([[0.9, 0.3, 0.2, 0.1, 0.05]] * 2, jnp.float32)
    idx1 = jnp.asarray([[40, 900, 500, 700, 300], [41, 901, 501, 701, 301]], jnp.int32)
    st = init_clique_state(5)
    *_, st = clique_topk_candidates(
        CFG, st, vals1, idx1, jnp.asarray([200, 201], jnp.int32), jnp.ones(2, bool)
    )
    # batch 2: two more hits near 40
    vals2 = jnp.asarray([[0.9, 0.3, 0.2, 0.1, 0.05]] * 2, jnp.float32)
    idx2 = jnp.asarray([[42, 902, 502, 702, 302], [43, 903, 503, 703, 303]], jnp.int32)
    curr, prev, score, ok, st = clique_topk_candidates(
        CFG, st, vals2, idx2, jnp.asarray([202, 203], jnp.int32), jnp.ones(2, bool)
    )
    assert bool(ok[0])
    # the clique center must sit in the 40-43 run, supported by BOTH batches
    assert 40 <= int(prev[0]) <= 43


def test_hypothesis_slot_reuse_resets_emitted_latch():
    """When a new hypothesis claims a slot whose previous occupant already
    emitted, the in-table emitted latch must reset so the newcomer can emit
    too (VERDICT r1 weak #3; ref slot reuse src/HypothesisManager.cpp:51-86)."""
    t = hyp.create_table(1)  # single slot: every spawn recycles it
    # first hypothesis: enough support to emit at a digest
    t, emits, *_ = feed(t, [(100 + i, 10 + i, 0.95) for i in range(6)], 4)
    assert np.asarray(emits).any()
    assert bool(np.asarray(t.emitted)[0])
    # a far-away strong track recycles the slot (latch must clear), then
    # builds support and must emit AGAIN
    t, emits2, *_ = feed(t, [(300 + i, 900 + i, 0.95) for i in range(6)], 4)
    assert np.asarray(emits2).any(), "recycled slot failed to re-emit"


def test_clique_streamed_vs_batched_equivalence():
    """Per-query Method C must emit the same candidates whether hits arrive
    one query at a time or in one batch (the reference streams; batch
    boundaries must be invisible)."""
    from cerebro_tpu.loop.topk_methods import clique_topk_candidates, init_clique_state

    rng = np.random.default_rng(3)
    Q, k = 12, 5
    idx = rng.integers(0, 120, (Q, k)).astype(np.int32)
    idx[4:9, 0] = [40, 41, 43, 40, 42]  # persistent near-40 clique
    vals = rng.uniform(0.2, 0.6, (Q, k)).astype(np.float32)
    vals[4:9, 0] = 0.92
    q = jnp.arange(300, 300 + Q, dtype=jnp.int32)

    curr_b, prev_b, score_b, ok_b, _ = clique_topk_candidates(
        CFG, init_clique_state(k), jnp.asarray(vals), jnp.asarray(idx),
        q, jnp.ones(Q, bool),
    )
    ok_s, prev_s = [], []
    st = init_clique_state(k)
    ones1 = jnp.ones(1, bool)
    for j in range(Q):
        _, p, _, o, st = clique_topk_candidates(
            CFG, st, jnp.asarray(vals[j : j + 1]), jnp.asarray(idx[j : j + 1]),
            q[j : j + 1], ones1,
        )
        ok_s.append(bool(o[0]))
        prev_s.append(int(p[0]))
    np.testing.assert_array_equal(np.asarray(ok_b), ok_s)
    # centers must agree wherever a candidate fired
    for j in range(Q):
        if ok_s[j]:
            assert int(prev_b[j]) == prev_s[j], (j, int(prev_b[j]), prev_s[j])
    assert any(ok_s), "fixture never fired"
