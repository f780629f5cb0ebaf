"""Full-pipeline integration test: synthetic stereo stream -> descriptors ->
loop candidates -> geometric verification -> pose-graph correction, plus
kidnap segmentation and the tiered image store. This is the bag-replay
integration harness of SURVEY.md §4, with exact ground truth."""

import dataclasses

import numpy as np
import pytest

from cerebro_tpu.config import (
    CerebroConfig,
    DescriptorConfig,
    KidnapConfig,
    LoopConfig,
    PoseGraphConfig,
    RuntimeConfig,
    VerifyConfig,
)
from cerebro_tpu.db.images import ImageStore
from cerebro_tpu.runtime import CerebroPipeline

import jax.numpy as jnp
from cerebro_tpu.geometry import se3, stereo
from test_verify import big_texture, render, make_rig, BASELINE, H, W


def small_config(tmp_path):
    return CerebroConfig(
        descriptor=DescriptorConfig(
            image_hw=(H, W), trunk_dim=64, num_clusters=4, kind="gist"
        ),
        loop=LoopConfig(db_capacity=1024, exclusion_window=6, dot_threshold=0.85),
        # training-free gist descriptor: discriminative without weights
        verify=dataclasses.replace(
            VerifyConfig(),
            max_features=1024,
            ransac_hypotheses=128,
            gms_factor=4.0,
            min_matches_accept=200,
            min_pair_dt_s=2.0,
        ),
        kidnap=KidnapConfig(),
        posegraph=PoseGraphConfig(max_gn_iters=10, cg_iters=60),
        runtime=RuntimeConfig(
            descriptor_batch=4, stash_dir=str(tmp_path / "stash"), image_ram_window_s=1e9
        ),
    )


def camera_pose(i):
    """Poses along a line with slight yaw; every index has a distinct view."""
    yaw = 0.02 * i
    t = jnp.asarray([0.35 * i, 0.05 * i, 0.0])
    return np.asarray(
        se3.make_pose(se3.ypr_to_rot(jnp.asarray([yaw, 0.0, 0.0])), t)
    ).astype(np.float32)


def stereo_images(tex, w_T_c):
    right_pose = w_T_c.copy()
    right_pose[:3, 3] += w_T_c[:3, :3] @ np.array([BASELINE, 0, 0], np.float32)
    la = np.asarray(render(tex, w_T_c))
    ra = np.asarray(render(tex, right_pose))
    to8 = lambda x: np.clip(x * 255, 0, 255).astype(np.uint8)
    return to8(la), to8(ra)


@pytest.fixture(scope="module")
def scene(rng_mod=np.random.default_rng(11)):
    tex = big_texture(rng_mod, n=4096)
    frames = {}
    for i in range(14):
        frames[i] = stereo_images(tex, camera_pose(i))
    return frames


def test_pipeline_end_to_end(tmp_path, scene):
    cfg = small_config(tmp_path)
    pipe = CerebroPipeline(cfg, rig=make_rig())

    # 14 distinct frames at 1 Hz, then revisit frames 2..5 (same images) at
    # t=20.. — far beyond the exclusion window (6) and Δt gate (2 s)
    t = 0.0
    for i in range(14):
        la, ra = scene[i]
        pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i), right_img=ra)
        t += 1.0
    t = 20.0
    for i in range(2, 6):
        la, ra = scene[i]
        pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(14 + (i - 2)), right_img=ra)
        t += 1.0
    pipe.flush_descriptors()

    st = pipe.status()
    assert st["described"] == 18
    assert st["pending_candidates"] >= 1, f"no loop candidates: {st}"
    # candidates must point from the revisit block back to frames 2..5
    for c in pipe.candidates:
        assert c.idx_curr >= 14
        assert 1 <= c.idx_prev <= 6
        assert c.score > 0.95  # identical images -> near-perfect dot

    n_acc = pipe.verify_pending()
    assert n_acc >= 1, f"no verified loops: {pipe.status()}"
    for e in pipe.loop_edges:
        # identical viewpoint revisit: relative pose should be ~identity
        ang, trans = se3.pose_delta_metrics(
            jnp.eye(4), jnp.asarray(e.T_prev_curr.astype(np.float32))
        )
        assert float(ang) < 1.5 and float(trans) < 0.1
        assert e.stamp_curr - e.stamp_prev >= cfg.verify.min_pair_dt_s

    # trajectory optimization runs and returns a full set of poses
    out = pipe.optimize_trajectory()
    assert out is not None and out.shape == (18, 4, 4)
    assert np.all(np.isfinite(out))

    # observability surfaces
    j = pipe.found_loops_json()
    assert isinstance(j, list)
    assert pipe.status()["loop_edges"] == len(pipe.loop_edges)


def test_pipeline_kidnap_segments_worlds(tmp_path, scene):
    cfg = small_config(tmp_path)
    pipe = CerebroPipeline(cfg, rig=make_rig())
    t = 0.0
    for i in range(5):
        la, ra = scene[i]
        pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i), right_img=ra)
        t += 1.0
    # kidnap: 4 s of feature collapse
    for _ in range(8):
        la, ra = scene[5]
        pipe.ingest_frame(t, la, n_tracked=3, pose=None, right_img=ra, is_keyframe=False)
        t += 0.5
    # recovery
    for i in range(6, 10):
        la, ra = scene[i]
        pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i), right_img=ra)
        t += 1.0
    pipe.flush_descriptors()
    info = pipe.kidnap.info()
    assert info["world_id"] == 1
    assert len(info["intervals"]) == 1
    # store world ids reflect the split
    ws = pipe.store.world_id[: pipe.store.size]
    assert ws[0] == 0 and ws[pipe.store.size - 1] == 1


def test_image_store_ram_disk_cycle(tmp_path):
    # synchronous writes: the TTL reload cycle is deterministic
    store = ImageStore(stash_dir=str(tmp_path / "s"), cache_ttl=3,
                       async_writes=False)
    img = np.random.default_rng(0).integers(0, 255, (32, 32)).astype(np.uint8)
    store.put("left", 0, img)
    assert store.state_of("left", 0) == "ram"
    store.stash("left", 0)
    assert store.state_of("left", 0) == "disk"
    out = store.get("left", 0)
    np.testing.assert_array_equal(out, img)
    assert store.state_of("left", 0) == "ram_hit"
    for _ in range(3):  # TTL decrements back to disk
        store.get("left", 0)
    assert store.state_of("left", 0) == "disk"
    store.remove("left", 0)
    assert store.get("left", 0) is None


def test_image_store_async_stash_readable(tmp_path):
    """Async stash (the default): the image stays readable while the write
    is in flight, lands after flush, and remove() cancels queued writes."""
    store = ImageStore(stash_dir=str(tmp_path / "sa"), cache_ttl=3)
    img = np.random.default_rng(1).integers(0, 255, (16, 16)).astype(np.uint8)
    store.put("left", 0, img)
    store.stash("left", 0)
    assert store.state_of("left", 0) == "disk"
    np.testing.assert_array_equal(store.get("left", 0), img)  # any stage
    store.flush_writes()
    np.testing.assert_array_equal(store.get("left", 0), img)
    store.remove("left", 0)
    assert store.get("left", 0) is None
    # cancel path: stash then remove before flushing
    store.put("right", 1, img)
    store.stash("right", 1)
    store.remove("right", 1)
    store.flush_writes()
    assert store.get("right", 1) is None


def test_image_store_save_load_roundtrip(tmp_path):
    store = ImageStore(stash_dir=str(tmp_path / "s1"))
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    store.put("left", 7, img)
    store.save_to(str(tmp_path / "ckpt"))
    store2 = ImageStore.load_from(
        str(tmp_path / "ckpt"), stash_dir=str(tmp_path / "s2")
    )
    np.testing.assert_array_equal(store2.get("left", 7), img)


def test_dump_debug_writes_artifacts(tmp_path, scene):
    cfg = small_config(tmp_path)
    pipe = CerebroPipeline(cfg, rig=make_rig())
    t = 0.0
    for i in range(14):
        la, ra = scene[i]
        pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i), right_img=ra)
        t += 1.0
    t = 20.0
    for i in range(2, 4):
        la, ra = scene[i]
        pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(14 + i - 2), right_img=ra)
        t += 1.0
    pipe.flush_descriptors()
    pipe.verify_pending()

    out = tmp_path / "debug"
    pipe.dump_debug(str(out))
    import os

    files = set(os.listdir(out))
    assert "status.json" in files and "loop_edges.json" in files
    assert "rejections.json" in files
    assert "trajectory.npy" in files and "trajectory_render.npy" in files
    # operator-viewable PNGs, not just .npy blobs (VERDICT r2 #8)
    assert "trajectory_render.png" in files
    if pipe.loop_edges:
        assert any(f.startswith("pair_") and f.endswith(".png") for f in files)
    if pipe.rejected_candidates:
        assert any(f.startswith("reject_") and f.endswith(".png") for f in files)
        import json as _json

        rej = _json.load(open(out / "rejections.json"))
        assert all(r["reason"] for r in rej)


def test_pipeline_depth_camera_mode(tmp_path, scene):
    """Depth-camera rig: no right images; per-pixel depth drives
    verification (the reference's realsense path)."""
    from test_verify import FX, CX, CY, Z_NEAR, Z_FAR, X_SPLIT, H as IH, W as IW

    cfg = small_config(tmp_path)
    pipe = CerebroPipeline(cfg, rig=make_rig())

    def depth_map(w_T_c):
        # analytic depth of the two-plane scene from this viewpoint
        R, tvec = w_T_c[:3, :3], w_T_c[:3, 3]
        u, v = np.meshgrid(np.arange(IW, dtype=np.float32), np.arange(IH, dtype=np.float32))
        rays = np.stack([(u - CX) / 300.0, (v - CY) / 300.0, np.ones_like(u)], -1)
        dirs = rays @ R.T
        s_near = (Z_NEAR - tvec[2]) / dirs[..., 2]
        p_near = tvec[None, None, :] + s_near[..., None] * dirs
        use_near = p_near[..., 0] < X_SPLIT
        s = np.where(use_near, s_near, (Z_FAR - tvec[2]) / dirs[..., 2])
        return (s * rays[..., 2] * np.linalg.norm([1.0])).astype(np.float32) * 1.0

    t = 0.0
    for i in range(14):
        la, _ = scene[i]
        pipe.ingest_frame(
            t, la, n_tracked=100, pose=camera_pose(i),
            depth_img=depth_map(camera_pose(i)),
        )
        t += 1.0
    t = 20.0
    for i in range(2, 6):
        la, _ = scene[i]
        pipe.ingest_frame(
            t, la, n_tracked=100, pose=camera_pose(14 + (i - 2)),
            depth_img=depth_map(camera_pose(i)),
        )
        t += 1.0
    pipe.flush_descriptors()
    assert pipe.status()["pending_candidates"] >= 1
    n = pipe.verify_pending()
    assert n >= 1, pipe.status()
    for e in pipe.loop_edges:
        ang, trans = se3.pose_delta_metrics(
            jnp.eye(4), jnp.asarray(e.T_prev_curr.astype(np.float32))
        )
        assert float(ang) < 1.5 and float(trans) < 0.1


def test_pipeline_method_selection(tmp_path, scene):
    """Methods B and D must also find the planted revisit (ref Cerebro::run
    dispatches between 4 candidate-generation strategies)."""
    for method in ["B", "C", "D"]:
        cfg = small_config(tmp_path)
        cfg = dataclasses.replace(
            cfg, loop=dataclasses.replace(cfg.loop, method=method)
        )
        pipe = CerebroPipeline(cfg, rig=make_rig())
        t = 0.0
        for i in range(14):
            la, ra = scene[i]
            pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i), right_img=ra)
            t += 1.0
        t = 20.0
        for i in range(2, 6):
            la, ra = scene[i]
            pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(14 + (i - 2)), right_img=ra)
            t += 1.0
        pipe.flush_descriptors()
        assert pipe.status()["pending_candidates"] >= 1, (method, pipe.status())
        for c in pipe.candidates:
            assert c.idx_curr >= 14 and c.idx_prev <= 6, (method, c)


def test_pipeline_with_mesh_matches_single_device(tmp_path, scene):
    """A mesh-backed pipeline (DB sharded over 8 virtual devices, sharded
    search) must produce identical candidates to the single-device one."""
    from cerebro_tpu.parallel import make_mesh

    def run(mesh):
        cfg = small_config(tmp_path)
        cfg = dataclasses.replace(
            cfg, loop=dataclasses.replace(cfg.loop, db_capacity=1024)
        )
        pipe = CerebroPipeline(cfg, rig=make_rig(), mesh=mesh)
        t = 0.0
        for i in range(14):
            la, ra = scene[i]
            pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i), right_img=ra)
            t += 1.0
        t = 20.0
        for i in range(2, 6):
            la, ra = scene[i]
            pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(14 + (i - 2)), right_img=ra)
            t += 1.0
        pipe.flush_descriptors()
        return sorted((c.idx_curr, c.idx_prev) for c in pipe.candidates)

    single = run(None)
    sharded = run(make_mesh())
    assert single == sharded and len(single) >= 1


def test_score_history_and_render(tmp_path, scene):
    cfg = small_config(tmp_path)
    pipe = CerebroPipeline(cfg, rig=make_rig())
    t = 0.0
    for i in range(14):
        la, ra = scene[i]
        pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i), right_img=ra)
        t += 1.0
    t = 20.0
    for i in range(2, 6):
        la, ra = scene[i]
        pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(14 + (i - 2)), right_img=ra)
        t += 1.0
    pipe.flush_descriptors()
    assert len(pipe.score_history) == 18
    assert len(pipe.detection_marks) >= 1
    # marks point at high-score entries
    for m in pipe.detection_marks:
        assert pipe.score_history[m] > cfg.loop.dot_threshold
    img = pipe.render_scores()
    assert img.shape[2] == 3 and img.std() > 0


def test_pipeline_quantized_db_matches_f32(tmp_path, scene):
    """Int8-quantized DB mode finds the same candidates as float mode."""

    def run(quantized):
        cfg = small_config(tmp_path)
        cfg = dataclasses.replace(
            cfg, loop=dataclasses.replace(cfg.loop, quantized=quantized)
        )
        pipe = CerebroPipeline(cfg, rig=make_rig())
        t = 0.0
        for i in range(14):
            la, ra = scene[i]
            pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i), right_img=ra)
            t += 1.0
        t = 20.0
        for i in range(2, 6):
            la, ra = scene[i]
            pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(14 + (i - 2)), right_img=ra)
            t += 1.0
        pipe.flush_descriptors()
        return sorted((c.idx_curr, c.idx_prev) for c in pipe.candidates)

    assert run(True) == run(False) != []


def test_ingestion_past_db_capacity(tmp_path):
    """Ring-DB correctness through the full pipeline (VERDICT r1 weak #1):
    ingest far past db_capacity, then revisit frames that are still in the
    ring — detections must map to the CORRECT keyframe-store indices.

    Descriptors are injected via describe_fn (frame id encoded in pixel
    [0,0]), so detection behavior is fully controlled: unique random unit
    vectors per frame, with frames 80..83 duplicating frames 60..63."""
    D = 256
    n_frames = 84
    # one-hot descriptors: distinct frames are exactly orthogonal, so the
    # only strong matches are the planted revisits (deterministic test)
    desc = np.eye(D, dtype=np.float32)[:n_frames].copy()
    desc[80:84] = desc[60:64]  # planted revisit, still inside the 64-slot ring

    def describe(imgs):
        ids = np.asarray(imgs)[:, 0, 0, 0].astype(int)
        return jnp.asarray(desc[ids])

    cfg = CerebroConfig(
        descriptor=DescriptorConfig(image_hw=(8, 8), trunk_dim=64, num_clusters=4),
        loop=LoopConfig(db_capacity=64, exclusion_window=6, dot_threshold=0.85),
        verify=dataclasses.replace(VerifyConfig(), min_pair_dt_s=2.0),
        runtime=RuntimeConfig(
            descriptor_batch=4, stash_dir=str(tmp_path / "stash"),
            image_ram_window_s=1e9,
        ),
    )
    pipe = CerebroPipeline(cfg, describe_fn=describe)
    for i in range(n_frames):
        img = np.full((8, 8), i, np.uint8)
        pipe.ingest_frame(float(i), img, n_tracked=100, pose=camera_pose(i))
    pipe.flush_descriptors()

    assert len(pipe.db_gid_to_store) == n_frames
    assert int(pipe.db.total) == n_frames
    assert int(pipe.db.count) == 64

    assert pipe.candidates, "revisit inside the ring was not detected"
    for c in pipe.candidates:
        # exact mapping: frame i revisits frame i-20. (Revisit frames 80/81
        # may fire too: zero-score ties among the orthogonal frames produce
        # agreeing argmaxes, and the reference's rule only requires the
        # CURRENT query to be strong, src/Cerebro.cpp:1056.)
        assert c.idx_curr >= 80, c
        assert c.idx_prev == c.idx_curr - 20, c
        assert c.score > 0.99, c
    assert {c.idx_curr for c in pipe.candidates} >= {82, 83}

    # revisiting an EVICTED frame (gid < 20) must NOT produce a candidate:
    # its descriptor row has been overwritten
    pipe.candidates.clear()
    for j, src in enumerate([2, 3, 4]):
        img = np.full((8, 8), src, np.uint8)
        pipe.ingest_frame(float(n_frames + j), img, n_tracked=100,
                          pose=camera_pose(n_frames + j))
    pipe.flush_descriptors()
    for c in pipe.candidates:
        assert c.idx_prev >= 20, f"matched an evicted row: {c}"


def test_pipeline_topk_candidates(tmp_path, scene):
    """Method A with candidates_per_query>1 (the 'A+' drain path): the
    verifier sees multiple locality-consistent hypotheses per query, the
    score history stays one entry per query, and verification still
    accepts the true revisit."""
    cfg = small_config(tmp_path)
    cfg = dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, candidates_per_query=3)
    )
    pipe = CerebroPipeline(cfg, rig=make_rig())
    t = 0.0
    for i in range(14):
        la, ra = scene[i]
        pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i), right_img=ra)
        t += 1.0
    t = 20.0
    for i in range(2, 6):
        la, ra = scene[i]
        pipe.ingest_frame(
            t, la, n_tracked=100, pose=camera_pose(14 + (i - 2)), right_img=ra
        )
        t += 1.0
    pipe.flush_descriptors()

    st = pipe.status()
    assert st["described"] == 18
    cands = pipe.candidates
    assert len(cands) >= 1, st
    for c in cands:
        assert c.idx_curr >= 14
        assert c.idx_prev < 14
    # score history: exactly one (rank-0) entry per described query
    assert len(pipe.score_history) == 18
    n_acc = pipe.verify_pending()
    assert n_acc >= 1, pipe.status()


def test_verify_cascade_escalates_scale_change(tmp_path):
    """Two-tier verification: a same-scale pair verifies in the cheap
    single-scale pass; an approach-distance (1.54x) revisit fails it on
    match count and is escalated to the scale-bank matcher, which accepts
    it (VerifyConfig.cascade; measured 13 vs 276 ms/pair on a v5e)."""
    from test_verify import big_texture, stereo_pair
    from cerebro_tpu.runtime.pipeline import RawCandidate

    cfg = small_config(tmp_path)
    # uint8 quantization costs a few matches vs the float render used in
    # test_verify (141 here vs 157 there); gates scaled accordingly
    cfg = dataclasses.replace(
        cfg, verify=dataclasses.replace(
            cfg.verify, min_matches_attempt=110, min_matches_accept=120,
            # uint8 stereo depth is noisier at the close range the approach
            # introduces (2.6 m); the 0.1 m ICP inlier gate is for 4-7 m
            icp_inlier_error=0.2,
            # pin the gather matcher: its single-scale tier 1 genuinely
            # fails this pair, which is what exercises the escalation path
            # (the default steerable tier 1 accepts it directly)
            matcher="gather",
        )
    )
    assert cfg.verify.cascade  # default on
    pipe = CerebroPipeline(cfg, rig=make_rig())

    rng = np.random.default_rng(5)
    tex = big_texture(rng)
    Ta = np.eye(4, dtype=np.float32)
    Tb = np.eye(4, dtype=np.float32)
    Tb[2, 3] = 1.4  # 1.54x closer to the near plane
    to8 = lambda x: np.clip(np.asarray(x) * 255, 0, 255).astype(np.uint8)
    la, ra = (to8(x) for x in stereo_pair(tex, Ta))
    lb, rb = (to8(x) for x in stereo_pair(tex, Tb))
    pipe.ingest_frame(0.0, la, n_tracked=100, pose=Ta, right_img=ra)
    pipe.ingest_frame(30.0, lb, n_tracked=100, pose=Tb, right_img=rb)
    pipe.flush_descriptors()
    pipe._drain_detections()
    # inject the candidate directly: this test drives VERIFICATION, not
    # detection (the gist descriptor's scale robustness is not under test)
    pipe._candidates = [RawCandidate(idx_curr=1, idx_prev=0, score=0.9)]
    assert pipe.verify_pending() == 1
    assert len(pipe.loop_edges) == 1
    # ~pure-z approach: recovered pose must show the forward translation
    T = pipe.loop_edges[0].T_prev_curr
    assert abs(T[2, 3] - 1.4) < 0.15, T

    # without the scale banks the same pair must be rejected on match count
    cfg1 = dataclasses.replace(
        cfg, verify=dataclasses.replace(
            cfg.verify, min_matches_attempt=110, min_matches_accept=120,
            icp_inlier_error=0.2, scale_banks=(1.0,), cascade=False,
            matcher="gather",
        ),
        runtime=dataclasses.replace(cfg.runtime, stash_dir=str(tmp_path / "s2")),
    )
    pipe1 = CerebroPipeline(cfg1, rig=make_rig())
    pipe1.ingest_frame(0.0, la, n_tracked=100, pose=Ta, right_img=ra)
    pipe1.ingest_frame(30.0, lb, n_tracked=100, pose=Tb, right_img=rb)
    pipe1.flush_descriptors()
    pipe1._drain_detections()
    pipe1._candidates = [RawCandidate(idx_curr=1, idx_prev=0, score=0.9)]
    assert pipe1.verify_pending() == 0
    assert len(pipe1.rejected_candidates) == 1
    assert "matches" in pipe1.rejected_candidates[0].reason


def test_stamped_pixels_ordered_lookup():
    """O(log n) stamp index (VERDICT r3 Weak #9/#6): exact hit, nearest
    within tolerance, out-of-tolerance miss, and logarithmic prune must
    all behave like the old full-dict scan."""
    from cerebro_tpu.runtime.pipeline import _StampedPixels

    px = _StampedPixels()
    for s in [5_000_000, 1_000_000, 3_000_000]:  # out-of-order pushes
        px.add(s, f"img{s}")
    assert len(px) == 3
    assert px.pop_near(3_000_000) == "img3000000"  # exact
    assert px.pop_near(1_400_000) == "img1000000"  # within 1 ms tol
    assert px.pop_near(8_000_000) is None  # out of tolerance
    assert len(px) == 1
    # nearest of two candidates wins
    px.add(10_000_000, "a")
    px.add(10_600_000, "b")
    assert px.pop_near(10_500_000) == "b"
    # prune drops strictly-older entries and reports the count
    px.add(20_000_000, "c")
    assert px.prune_older(20_000_000) == 2  # 5ms + 10ms entries
    assert len(px) == 1 and 20_000_000 in px


def test_point_feature_storage_and_shared_track_gate():
    """DataNode parity (VERDICT r3 #7): per-keyframe uv/id/xyz tracks are
    stored, survive the state roundtrip, and candidates between frames
    that still share live tracker ids are rejected (odometrically
    connected pairs are re-observation, not loop closures — the robust
    companion of the Δt gate, ref src/DataNode.h:49-190)."""
    import jax.numpy as jnp

    from cerebro_tpu.config import CerebroConfig, DescriptorConfig, LoopConfig
    from cerebro_tpu.db.keyframes import KeyframeStore
    from cerebro_tpu.runtime import CerebroPipeline

    # -- store roundtrip ------------------------------------------------
    st = KeyframeStore(feature_slots=8)
    i = st.add_frame(1.0, is_keyframe=True)
    st.set_point_features(
        i, np.array([[3.0, 4.0], [5.0, 6.0]]), np.array([7, 9]),
        xyz=np.array([[0.1, 0.2, 2.0], [0.3, 0.1, 3.0]]),
    )
    j = st.add_frame(2.0, is_keyframe=True)
    st.set_point_features(j, np.array([[1.0, 1.0]]), np.array([9]))
    k = st.add_frame(3.0, is_keyframe=True)
    st.set_point_features(k, np.array([[2.0, 2.0]]), np.array([42]))
    assert st.shared_track_count(i, j) == 1  # id 9 tracked through
    assert st.shared_track_count(i, k) == 0
    back = KeyframeStore.from_state_dict(st.to_state_dict())
    assert back.feature_slots == 8
    assert back.shared_track_count(i, j) == 1
    np.testing.assert_array_equal(back.feat_xyz[i, :2], st.feat_xyz[i, :2])
    # r3-era checkpoints without feature columns still load
    old = {n: c for n, c in st.to_state_dict().items()
           if not n.startswith("feat") and n != "n_feat"}
    legacy = KeyframeStore.from_state_dict(old)
    assert legacy.size == 3 and legacy.shared_track_count(i, j) == 0

    # -- pipeline gate --------------------------------------------------
    rng_ = np.random.default_rng(3)
    d0 = rng_.normal(size=64).astype(np.float32)
    d0 /= np.linalg.norm(d0)

    def describe(imgs):  # every frame maps to the SAME descriptor
        return jnp.asarray(np.tile(d0, (imgs.shape[0], 1)))

    def run_one(share_ids: bool):
        cfg = CerebroConfig(
            descriptor=DescriptorConfig(image_hw=(24, 32)),
            loop=LoopConfig(db_capacity=512, dot_threshold=0.5,
                            exclusion_window=2, locality_threshold=64),
        )
        pipe = CerebroPipeline(cfg, describe_fn=describe, describe_dim=64)
        img = rng_.integers(0, 255, (24, 32), dtype=np.uint8)
        for t in range(30):
            ids = np.array([5, 6]) if share_ids else np.array([100 + t, 200 + t])
            pipe.ingest_frame(
                float(t), img, n_tracked=50, is_keyframe=True,
                feat_uv=np.zeros((2, 2)), feat_ids=ids,
            )
        pipe.flush_descriptors()
        return len(pipe.candidates)

    assert run_one(share_ids=False) > 0  # distinct tracks: loops flow
    assert run_one(share_ids=True) == 0  # continuously-tracked: all gated


def test_warmup_compiles_without_touching_state(tmp_path, scene):
    """CerebroPipeline.warmup pre-compiles the live programs from the
    caller's thread (a production engine compiles once at startup; on
    remote-TPU relays a program first compiled on a spawned thread can
    wedge). It must not change ANY engine state: a warmed pipeline and a
    cold one fed the same stream emit identical candidates."""
    import dataclasses as dc

    def run(warm: bool):
        cfg = small_config(tmp_path)
        pipe = CerebroPipeline(cfg, rig=make_rig())
        if warm:
            detail = pipe.warmup(optimize_node_buckets=(32,))
            assert set(detail) >= {"describe", "detect", "optimize_n32_l32"}
            assert pipe.store.size == 0
            assert len(pipe.db_gid_to_store) == 0
            assert int(np.asarray(pipe.db.count)) == 0
        t = 0.0
        for i in range(14):
            la, ra = scene[i]
            pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i),
                              right_img=ra)
            t += 1.0
        t = 20.0
        for i in range(2, 6):
            la, ra = scene[i]
            pipe.ingest_frame(t, la, n_tracked=100,
                              pose=camera_pose(14 + (i - 2)),
                              right_img=ra)
            t += 1.0
        pipe.flush_descriptors()
        return [(c.idx_curr, c.idx_prev, round(c.score, 5))
                for c in pipe.candidates]

    assert run(warm=True) == run(warm=False)


def test_image_store_isolation_by_default():
    """Two default-config stores must never share stash files: a discarded
    store's ASYNC writer thread can land delayed writes that clobber a
    newer store's same-keyed file with stale pixels — the order-dependent
    accuracy flake (consecutive bench_e2e runs shared one stash dir)."""
    a, b = ImageStore(), ImageStore()
    assert a.stash_dir != b.stash_dir
    a.put("left", 0, np.full((4, 4), 1, np.uint8))
    b.put("left", 0, np.full((4, 4), 2, np.uint8))
    a.stash("left", 0)
    b.stash("left", 0)
    a.flush_writes()
    b.flush_writes()
    # same key, different stores -> each reads back its OWN pixels
    assert (a.get("left", 0) == 1).all()
    assert (b.get("left", 0) == 2).all()


def test_pipeline_default_stash_dirs_are_private():
    from cerebro_tpu.config import CerebroConfig
    from cerebro_tpu.runtime import CerebroPipeline

    cfg = CerebroConfig()
    p1 = CerebroPipeline(cfg)
    p2 = CerebroPipeline(cfg)
    assert p1.images.stash_dir != p2.images.stash_dir


def test_shared_track_gate_scoped_to_world():
    """Tracker id counters RESET across kidnap sessions, so equal ids on
    opposite sides of a world boundary are coincidental collisions — and
    cross-world candidates are exactly the loop closures that merge
    worlds. The shared-track gate must only fire within one world."""
    import jax.numpy as jnp

    from cerebro_tpu.config import (
        CerebroConfig,
        DescriptorConfig,
        KidnapConfig,
        LoopConfig,
    )
    from cerebro_tpu.runtime import CerebroPipeline

    rng_ = np.random.default_rng(3)
    d0 = rng_.normal(size=64).astype(np.float32)
    d0 /= np.linalg.norm(d0)

    def describe(imgs):  # every frame maps to the SAME descriptor
        return jnp.asarray(np.tile(d0, (imgs.shape[0], 1)))

    cfg = CerebroConfig(
        descriptor=DescriptorConfig(image_hw=(24, 32)),
        loop=LoopConfig(db_capacity=512, dot_threshold=0.5,
                        exclusion_window=2, locality_threshold=64),
        kidnap=KidnapConfig(sustain_s=2.0),
    )
    pipe = CerebroPipeline(cfg, describe_fn=describe, describe_dim=64)
    img = rng_.integers(0, 255, (24, 32), dtype=np.uint8)
    shared = np.array([5, 6])  # same ids BOTH sessions (counter reset)
    t = 0.0
    for _ in range(15):
        pipe.ingest_frame(t, img, n_tracked=50, is_keyframe=True,
                          feat_uv=np.zeros((2, 2)), feat_ids=shared)
        t += 1.0
    for _ in range(4):  # tracking collapse -> kidnap -> new world
        pipe.ingest_frame(t, img, n_tracked=0, is_keyframe=False)
        t += 1.0
    for _ in range(15):
        pipe.ingest_frame(t, img, n_tracked=50, is_keyframe=True,
                          feat_uv=np.zeros((2, 2)), feat_ids=shared)
        t += 1.0
    pipe.flush_descriptors()
    cands = pipe.candidates
    assert pipe.kidnap.world_id == 1, "kidnap must have opened world 1"
    cross = [c for c in cands
             if pipe.store.world_id[c.idx_curr] != pipe.store.world_id[c.idx_prev]]
    assert cross, "cross-world candidates must survive the shared-id gate"
    same_world = [c for c in cands
                  if pipe.store.world_id[c.idx_curr] == pipe.store.world_id[c.idx_prev]]
    assert not same_world, "within-world shared-track pairs must stay gated"
