"""Detector behavior tests mirroring the reference's Method A semantics
(src/Cerebro.cpp:903-1103): 3-way argmax locality agreement + 0.85 dot
threshold + 50-frame exclusion window."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from cerebro_tpu.config import LoopConfig
from cerebro_tpu.db import descriptors as ddb
from cerebro_tpu.loop import detector

CFG = LoopConfig()
D = 128


def unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def make_stream(rng, n, loop_at=None, loop_to=None, loop_span=6):
    """Random near-orthogonal descriptors; frames [loop_at, loop_at+span)
    revisit [loop_to, loop_to+span) (same descriptors + tiny noise)."""
    descs = unit(rng.normal(size=(n, D))).astype(np.float32)
    if loop_at is not None:
        for i in range(loop_span):
            descs[loop_at + i] = unit(
                descs[loop_to + i] + 0.02 * rng.normal(size=D)
            ).astype(np.float32)
    return descs


def run_stream(descs, batch=4, cfg=CFG):
    n, d = descs.shape
    db = ddb.create(1024, d, dtype=jnp.float32)
    state = detector.init_state()
    found = []
    for start in range(0, n, batch):
        chunk = descs[start : start + batch]
        nb = len(chunk)
        pad = np.zeros((batch - nb, d), np.float32)
        q = jnp.asarray(np.concatenate([chunk, pad]))
        gidx = jnp.arange(start, start + batch, dtype=jnp.int32)
        qvalid = jnp.asarray(np.arange(batch) < nb)
        # search BEFORE appending the same batch (matches reference order:
        # M grows, then newest query scans M[:, :l-50] which excludes them
        # anyway via the limit)
        db = ddb.append(db, q, jnp.asarray(nb))
        cands, state = detector.detect_batch(cfg, db, state, q, gidx, qvalid)
        for j in range(nb):
            if bool(cands.valid[j]):
                found.append(
                    (int(cands.curr_idx[j]), int(cands.prev_idx[j]), float(cands.score[j]))
                )
    return found


def test_no_false_positives_on_random_stream(rng):
    descs = make_stream(rng, 160)
    found = run_stream(descs)
    assert found == []


def test_detects_planted_loop(rng):
    # revisit frames 10..16 at frames 120..126 — far outside the 50-frame
    # exclusion window
    descs = make_stream(rng, 140, loop_at=120, loop_to=10)
    found = run_stream(descs)
    assert len(found) >= 1
    for curr, prev, score in found:
        assert 120 <= curr < 126
        assert abs(prev - (10 + (curr - 120))) <= CFG.locality_threshold
        assert score > CFG.dot_threshold


def test_exclusion_window_blocks_recent_matches(rng):
    # revisit frames 60..66 at 80..86 — inside the exclusion window (gap 20
    # < 50): queries may not match them; no candidates should fire
    descs = make_stream(rng, 100, loop_at=80, loop_to=60)
    found = run_stream(descs)
    assert found == []


def test_single_spike_rejected_by_consistency(rng):
    # only ONE frame matches history (no 3 consecutive agreeing argmaxes)
    descs = make_stream(rng, 140)
    descs[120] = descs[10]
    found = run_stream(descs)
    assert found == []


def test_batch_boundary_carry(rng):
    # loop spans a batch boundary: batch=4, loop at 121..127 hits carry path
    descs = make_stream(rng, 140, loop_at=121, loop_to=15)
    found_b4 = run_stream(descs, batch=4)
    found_b8 = run_stream(descs, batch=8)
    # same detections regardless of batching
    assert {c for c, _, _ in found_b4} == {c for c, _, _ in found_b8}
    assert len(found_b4) >= 1


def test_higher_threshold_suppresses(rng):
    descs = make_stream(rng, 140, loop_at=120, loop_to=10)
    cfg = dataclasses.replace(CFG, dot_threshold=0.999)
    # tiny noise keeps scores ~0.99x < 0.999
    found = run_stream(descs, cfg=cfg)
    assert found == []


def test_empty_and_single_query_batches_preserve_carry(rng):
    """Regression: an all-padded batch must leave the carry untouched, and a
    single-valid-query batch must shift it by exactly one."""
    import jax.numpy as jnp
    from cerebro_tpu.db import descriptors as ddb2

    descs = make_stream(rng, 60)
    db = ddb.create(512, D, dtype=jnp.float32)
    db = ddb.append(db, jnp.asarray(descs[:8]), jnp.asarray(8))
    state = detector.init_state()
    q = jnp.asarray(descs[:8])
    g = jnp.arange(8, dtype=jnp.int32)
    _, st = detector.detect_batch(CFG, db, state, q, g, jnp.ones((8,), bool))

    _, st_empty = detector.detect_batch(CFG, db, st, q, g, jnp.zeros((8,), bool))
    assert bool(jnp.all(st_empty.prev_arg == st.prev_arg))
    assert bool(jnp.all(st_empty.prev_max == st.prev_max))
    assert bool(jnp.all(st_empty.prev_valid == st.prev_valid))

    _, st_one = detector.detect_batch(
        CFG, db, st, q, g, jnp.asarray(np.arange(8) < 1)
    )
    assert int(st_one.prev_arg[0]) == int(st.prev_arg[1])


# ---------------------------------------------------------------------------
# Top-k Method A (candidates_per_query > 1): k distinct locality-consistent
# hits per query go to the verifier (VERDICT r2 #3 — widen the frontier)
# ---------------------------------------------------------------------------


def run_stream_topk(descs, batch=4, cfg=CFG, k=4):
    from cerebro_tpu.db.descriptors import query_limits
    from cerebro_tpu.ops.similarity import search_topk

    n, d = descs.shape
    db = ddb.create(1024, d, dtype=jnp.float32)
    state = detector.init_topk_state(k)
    found = []
    for start in range(0, n, batch):
        chunk = descs[start : start + batch]
        nb = len(chunk)
        pad = np.zeros((batch - nb, d), np.float32)
        q = jnp.asarray(np.concatenate([chunk, pad]))
        gidx = jnp.arange(start, start + batch, dtype=jnp.int32)
        qvalid = jnp.asarray(np.arange(batch) < nb)
        db = ddb.append(db, q, jnp.asarray(nb))
        limits = query_limits(db, gidx, cfg.exclusion_window)
        vals, idx = search_topk(q, db.vectors, limits, db.global_ids, k=k)
        searchable = (limits > 0) & qvalid
        cands, state = detector.temporal_consistency_topk(
            cfg, state, vals, idx, gidx, searchable, qvalid
        )
        for j in range(nb * k):
            if bool(cands.valid[j]):
                found.append(
                    (int(cands.curr_idx[j]), int(cands.prev_idx[j]),
                     float(cands.score[j]))
                )
    return found


def test_topk_no_false_positives_on_random_stream(rng):
    descs = make_stream(rng, 160)
    assert run_stream_topk(descs) == []


def test_topk_batch_invariance(rng):
    """Streamed (batch=1) and batched (batch=8) feeds emit identical
    candidate sets — the carry crosses batch boundaries correctly."""
    descs = make_stream(rng, 140, loop_at=121, loop_to=15)
    f1 = run_stream_topk(descs, batch=1)
    f8 = run_stream_topk(descs, batch=8)
    assert {(c, p) for c, p, _ in f1} == {(c, p) for c, p, _ in f8}
    assert len(f1) >= 1


def test_topk_finds_multiple_laps(rng):
    """A place visited on TWO prior laps: the argmax detector emits one
    candidate per query (one lap); top-k emits candidates on both laps, so
    the verifier sees both revisit hypotheses."""
    descs = make_stream(rng, 240, loop_at=200, loop_to=10)
    # second prior lap of the same place at frames 100..106
    for i in range(6):
        descs[100 + i] = unit(
            descs[10 + i] + 0.02 * rng.normal(size=D)
        ).astype(np.float32)
    found = run_stream_topk(descs, k=4)
    prevs = {p for c, p, _ in found if 200 <= c < 206}
    hits_lap1 = any(5 <= p <= 22 for p in prevs)
    hits_lap2 = any(95 <= p <= 112 for p in prevs)
    assert hits_lap1 and hits_lap2, sorted(prevs)
    # argmax-only run for contrast: at most one lap per query
    found_a = run_stream(descs)
    prevs_a = {p for c, p, _ in found_a if 200 <= c < 206}
    assert not (
        any(5 <= p <= 22 for p in prevs_a) and any(95 <= p <= 112 for p in prevs_a)
    )


def test_topk_dedups_within_neighborhood(rng):
    """Hits of one query within ±locality collapse to the best one: the
    verifier must see distinct hypotheses, not k copies of the same place."""
    descs = make_stream(rng, 140, loop_at=120, loop_to=10)
    found = run_stream_topk(descs, k=4)
    by_query = {}
    for c, p, s in found:
        by_query.setdefault(c, []).append(p)
    for c, ps in by_query.items():
        ps = sorted(ps)
        for a, b in zip(ps, ps[1:]):
            assert b - a > CFG.locality_threshold, (c, ps)
