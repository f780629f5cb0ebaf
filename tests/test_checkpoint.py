"""Teach-and-repeat: save pipeline state, reload, relocalize a new run
against the loaded map (SURVEY.md §3.6 / §5.4 parity)."""

import numpy as np

from cerebro_tpu.io import load_pipeline_state, save_pipeline_state
from cerebro_tpu.runtime import CerebroPipeline

from test_pipeline import camera_pose, scene, small_config  # noqa: F401
from test_verify import make_rig


def test_teach_and_repeat(tmp_path, scene):
    cfg = small_config(tmp_path)

    # ---- teach run: 10 frames, save state ----
    teach = CerebroPipeline(cfg, rig=make_rig())
    t = 0.0
    for i in range(10):
        la, ra = scene[i]
        teach.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i), right_img=ra)
        t += 1.0
    teach.flush_descriptors()
    assert teach.status()["described"] == 10
    ckpt = str(tmp_path / "teach_state")
    save_pipeline_state(teach, ckpt)

    # ---- repeat run: fresh pipeline from checkpoint ----
    repeat = load_pipeline_state(
        ckpt, cfg=cfg, rig=make_rig(), stash_dir=str(tmp_path / "stash2")
    )
    st = repeat.status()
    assert st["described"] == 10  # map preloaded
    assert int(repeat.db.count) == 10
    assert repeat.store.size == 10

    # new session frames revisit taught places 3..5 (same viewpoints)
    t = 100.0
    for i in range(3, 6):
        la, ra = scene[i]
        repeat.ingest_frame(t, la, n_tracked=100, pose=None, right_img=ra)
        t += 1.0
    repeat.flush_descriptors()

    # relocalization: candidates from the new session into the old map
    assert repeat.status()["pending_candidates"] >= 1, repeat.status()
    for c in repeat.candidates:
        assert c.idx_curr >= 10  # new-session frame
        assert c.idx_prev < 10  # matched into the taught map
        assert c.score > 0.9

    # verification against reloaded (disk-stashed) images works too
    n = repeat.verify_pending()
    assert n >= 1


def test_checkpoint_preserves_loop_edges_and_worlds(tmp_path, scene):
    cfg = small_config(tmp_path)
    pipe = CerebroPipeline(cfg, rig=make_rig())
    t = 0.0
    for i in range(8):
        la, ra = scene[i]
        pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i), right_img=ra)
        t += 1.0
    # force a kidnap (stream gap)
    pipe.ingest_frame(t + 50.0, scene[9][0], n_tracked=100, pose=camera_pose(9), right_img=scene[9][1])
    pipe.flush_descriptors()
    assert pipe.kidnap.world_id == 1

    ckpt = str(tmp_path / "state2")
    save_pipeline_state(pipe, ckpt)
    again = load_pipeline_state(
        ckpt, cfg=cfg, rig=make_rig(), stash_dir=str(tmp_path / "stash3")
    )
    assert again.kidnap.world_id == 1
    assert len(again.kidnap.intervals) == 1
    assert again.store.world_id[again.store.size - 1] == 1
    np.testing.assert_array_equal(
        again.store.stamps[: again.store.size], pipe.store.stamps[: pipe.store.size]
    )


def test_quantized_teach_and_repeat(tmp_path, scene):
    """Teach with an int8-quantized map; reload and relocalize."""
    import dataclasses

    base = small_config(tmp_path)
    cfg = dataclasses.replace(base, loop=dataclasses.replace(base.loop, quantized=True))
    teach = CerebroPipeline(cfg, rig=make_rig())
    t = 0.0
    for i in range(10):
        la, ra = scene[i]
        teach.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i), right_img=ra)
        t += 1.0
    teach.flush_descriptors()
    ck = str(tmp_path / "qstate")
    save_pipeline_state(teach, ck)

    repeat = load_pipeline_state(ck, cfg=cfg, rig=make_rig(), stash_dir=str(tmp_path / "qs2"))
    assert int(repeat.db.count) == 10
    t = 100.0
    for i in range(3, 6):
        la, ra = scene[i]
        repeat.ingest_frame(t, la, n_tracked=100, pose=None, right_img=ra)
        t += 1.0
    repeat.flush_descriptors()
    assert any(c.idx_prev < 10 <= c.idx_curr for c in repeat.candidates)
