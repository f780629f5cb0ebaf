"""Sharded search must agree exactly with the single-chip path on the
8-device virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cerebro_tpu.config import LoopConfig
from cerebro_tpu.db import descriptors as ddb
from cerebro_tpu.loop import detector
from cerebro_tpu.ops import similarity
from cerebro_tpu.parallel import (
    detect_batch_sharded,
    make_mesh,
    shard_db,
    sharded_max_and_argmax,
    sharded_topk,
)

D = 256
N = 4096  # 512 rows per device on 8 devices


def _make_db(vecs, n_valid):
    """Pre-wrap ring DB: rows are their own global ids up to n_valid."""
    n = vecs.shape[0]
    gids = np.where(np.arange(n) < n_valid, np.arange(n), int(ddb.GID_INVALID))
    return ddb.DescriptorDB(
        vectors=jnp.asarray(vecs),
        global_ids=jnp.asarray(gids, jnp.int32),
        count=jnp.asarray(n_valid, jnp.int32),
        total=jnp.asarray(n_valid, jnp.int32),
    )


def _setup(rng, n_valid=3000):
    vecs = rng.normal(size=(N, D)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    db = _make_db(vecs, n_valid)
    q = rng.normal(size=(8, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return db, jnp.asarray(q)


def test_sharded_argmax_matches_single_device(rng):
    mesh = make_mesh()
    assert mesh.shape["db"] == 8
    db, q = _setup(rng)
    limits = jnp.asarray([0, 100, 511, 512, 513, 1024, 2999, 3000], jnp.int32)

    mx_ref, ar_ref = similarity.max_and_argmax(
        q, db.vectors, limits, db.global_ids, use_pallas=False
    )
    sdb = shard_db(db, mesh)
    mx, ar = sharded_max_and_argmax(q, sdb.vectors, limits, sdb.global_ids, mesh)

    np.testing.assert_array_equal(np.asarray(ar)[1:], np.asarray(ar_ref)[1:])
    np.testing.assert_allclose(np.asarray(mx)[1:], np.asarray(mx_ref)[1:], rtol=1e-5)
    assert float(mx[0]) <= similarity.NEG_INF  # empty window


def test_sharded_topk_matches_single_device(rng):
    mesh = make_mesh()
    db, q = _setup(rng)
    limits = jnp.full((8,), 3000, jnp.int32)
    v_ref, i_ref = similarity.search_topk(q, db.vectors, limits, db.global_ids, k=5)
    sdb = shard_db(db, mesh)
    v, i = sharded_topk(q, sdb.vectors, limits, sdb.global_ids, mesh, k=5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=1e-5)


def test_detect_batch_sharded_matches_single(rng):
    mesh = make_mesh()
    cfg = LoopConfig()
    # plant a loop: rows 120..123 match rows 10..13
    vecs = rng.normal(size=(N, D)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    for i in range(4):
        vecs[120 + i] = vecs[10 + i]
    db = _make_db(vecs, 124)
    q = jnp.asarray(vecs[120:124])
    gidx = jnp.arange(120, 124, dtype=jnp.int32)
    qvalid = jnp.ones((4,), bool)

    c_ref, s_ref = detector.detect_batch(
        cfg, db, detector.init_state(), q, gidx, qvalid, use_pallas=False
    )
    sdb = shard_db(db, mesh)
    c, s = detect_batch_sharded(
        cfg, sdb, detector.init_state(), q, gidx, qvalid, mesh, use_pallas=False
    )
    np.testing.assert_array_equal(np.asarray(c.valid), np.asarray(c_ref.valid))
    np.testing.assert_array_equal(np.asarray(c.prev_idx), np.asarray(c_ref.prev_idx))
    assert bool(c.valid[2]) and bool(c.valid[3])  # 3rd+4th queries have full triples
    assert int(c.prev_idx[3]) == 13


def test_int8_search_matches_f32(rng):
    """Quantized search must agree with f32 on unit descriptors: same
    argmax, scores within 2e-2."""
    from cerebro_tpu.ops.similarity import max_and_argmax_int8, quantize_rows

    vecs = rng.normal(size=(2048, D)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    # plant strong matches so argmax is meaningful
    q = rng.normal(size=(8, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    for i in range(8):
        vecs[100 + 7 * i] = q[i] + 0.05 * rng.normal(size=D)
        vecs[100 + 7 * i] /= np.linalg.norm(vecs[100 + 7 * i])

    limits = jnp.full((8,), 2048, jnp.int32)
    mx_ref, ar_ref = similarity.max_and_argmax(
        jnp.asarray(q), jnp.asarray(vecs), limits, use_pallas=False
    )
    dbq, dbs = quantize_rows(jnp.asarray(vecs))
    mx, ar = max_and_argmax_int8(jnp.asarray(q), dbq, dbs, limits)
    np.testing.assert_array_equal(np.asarray(ar), np.asarray(ar_ref))
    np.testing.assert_allclose(np.asarray(mx), np.asarray(mx_ref), atol=2e-2)


def test_streaming_topk_matches_dense(rng):
    from cerebro_tpu.ops.similarity import search_topk_streaming

    vecs = rng.normal(size=(2048, D)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    q = rng.normal(size=(8, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    limits = jnp.asarray([0, 100, 512, 1024, 2048, 2048, 1500, 3], jnp.int32)
    v_ref, i_ref = similarity.search_topk(jnp.asarray(q), jnp.asarray(vecs), limits, k=5)
    v, i = search_topk_streaming(jnp.asarray(q), jnp.asarray(vecs), limits, k=5)
    # where the window has >= 5 rows the results must agree exactly
    for qi in range(8):
        n_win = int(limits[qi])
        kk = min(5, n_win)
        np.testing.assert_array_equal(np.asarray(i[qi, :kk]), np.asarray(i_ref[qi, :kk]))
        np.testing.assert_allclose(
            np.asarray(v[qi, :kk]), np.asarray(v_ref[qi, :kk]), rtol=1e-5
        )


def test_sharded_search_on_wrapped_ring(rng):
    """After the ring wraps, the sharded path must still agree with the
    single-device path and return GLOBAL ids."""
    mesh = make_mesh()
    cap = 1024
    vecs = rng.normal(size=(1536, D)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    db = ddb.create(cap, D, dtype=jnp.float32)
    for i in range(0, 1536, 128):
        db = ddb.append(db, jnp.asarray(vecs[i : i + 128]), jnp.asarray(128))
    assert int(db.total) == 1536  # wrapped: oldest 512 evicted

    # queries equal to entries 600 and 1400 (both survive the wrap)
    q = jnp.asarray(vecs[[600, 1400]])
    limits = jnp.asarray([1536, 1536], jnp.int32)
    mx_ref, ar_ref = similarity.max_and_argmax(
        q, db.vectors, limits, db.global_ids, use_pallas=False
    )
    sdb = shard_db(db, mesh)
    mx, ar = sharded_max_and_argmax(q, sdb.vectors, limits, sdb.global_ids, mesh)
    np.testing.assert_array_equal(np.asarray(ar), np.asarray(ar_ref))
    np.testing.assert_allclose(np.asarray(mx), np.asarray(mx_ref), rtol=1e-5)
    assert int(ar[0]) == 600 and int(ar[1]) == 1400


def test_merge_payload_matches_compiled_hlo():
    """The analytic scaling roofline (scripts/bench_scaling.py) rests on
    merge_payload_bytes being the TOTAL cross-device traffic of one search
    step. Assert it against the compiled program: every all-gather in the
    HLO, summed over output bytes, must equal exactly Q * n_dev * 8."""
    import re

    from cerebro_tpu.parallel.sharded_search import merge_payload_bytes

    mesh = make_mesh(8)
    Q = 8
    q = jnp.zeros((Q, D), jnp.bfloat16)
    db = jnp.zeros((N, D), jnp.bfloat16)
    lim = jnp.full((Q,), N, jnp.int32)
    gid = jnp.arange(N, dtype=jnp.int32)
    txt = sharded_max_and_argmax.lower(q, db, lim, gid, mesh).compile().as_text()

    sizes = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
             "s8": 1, "u8": 1, "pred": 1}
    total = 0
    for line in txt.splitlines():
        if "all-gather(" not in line:
            continue
        m = re.search(r"=\s*(\w+)\[([\d,]*)\]", line)
        assert m, line
        dtype, dims = m.group(1), m.group(2)
        n_elems = int(np.prod([int(d) for d in dims.split(",") if d] or [1]))
        total += n_elems * sizes[dtype]
    assert total == merge_payload_bytes(Q, 8) == Q * 8 * 8, total
    # no other collectives hide in the program
    for op in ("all-reduce(", "all-to-all(", "collective-permute("):
        assert op not in txt, op


def test_quantized_sharded_matches_single_device(rng):
    """Sharded int8 search == single-device int8 search, exactly: the
    per-shard int8 row math is identical, the all-gather merge is exact.
    (Lifts the r4 'quantized DB + mesh not supported' limitation.)"""
    from cerebro_tpu.parallel import (
        detect_batch_quantized_sharded,
        shard_db_quantized,
    )

    vecs = rng.normal(size=(N, D)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    qdb = ddb.create_quantized(N, D)
    for i in range(0, N, 512):
        qdb = ddb.append_quantized(qdb, jnp.asarray(vecs[i : i + 512]),
                                   jnp.asarray(512))
    cfg = LoopConfig(db_capacity=N, quantized=True, dot_threshold=0.2,
                     exclusion_window=4)
    B = 8
    q = vecs[rng.integers(0, N, B)] + 0.01 * rng.normal(size=(B, D)).astype(
        np.float32)
    q = (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)
    gidx = jnp.arange(N, N + B, dtype=jnp.int32)
    qvalid = jnp.ones((B,), bool)

    single, st1 = detector.detect_batch_quantized(
        cfg, qdb, detector.init_state(), jnp.asarray(q), gidx, qvalid
    )

    mesh = make_mesh(8)
    sq = shard_db_quantized(qdb, mesh)
    shard, st2 = detect_batch_quantized_sharded(
        cfg, sq, detector.init_state(), jnp.asarray(q), gidx, qvalid, mesh
    )
    np.testing.assert_array_equal(np.asarray(single.valid), np.asarray(shard.valid))
    np.testing.assert_array_equal(np.asarray(single.prev_idx), np.asarray(shard.prev_idx))
    np.testing.assert_allclose(np.asarray(single.score), np.asarray(shard.score), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st1.prev_max), np.asarray(st2.prev_max), atol=1e-5)


def test_pipeline_quantized_with_mesh(rng, tmp_path):
    """CerebroPipeline composes the quantized DB with a mesh end-to-end."""
    from cerebro_tpu.config import (
        CerebroConfig,
        DescriptorConfig,
        LoopConfig as LC,
        RuntimeConfig,
    )
    from cerebro_tpu.runtime import CerebroPipeline

    d0 = rng.normal(size=64).astype(np.float32)
    d0 /= np.linalg.norm(d0)

    def describe(imgs):
        return jnp.asarray(np.tile(d0, (imgs.shape[0], 1)))

    cfg = CerebroConfig(
        descriptor=DescriptorConfig(image_hw=(24, 32)),
        loop=LC(db_capacity=512, quantized=True, dot_threshold=0.5,
                exclusion_window=2, locality_threshold=64),
        runtime=RuntimeConfig(descriptor_batch=4, stash_dir=str(tmp_path / "s")),
    )
    mesh = make_mesh(8)
    pipe = CerebroPipeline(cfg, describe_fn=describe, describe_dim=64, mesh=mesh)
    img = rng.integers(0, 255, (24, 32), dtype=np.uint8)
    for t in range(30):
        pipe.ingest_frame(float(t), img, n_tracked=50, is_keyframe=True)
    pipe.flush_descriptors()
    assert len(pipe.candidates) > 0  # identical descriptors -> loops flow
