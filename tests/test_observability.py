import time

import numpy as np

from cerebro_tpu.utils import StageTimer
from cerebro_tpu.utils.plot import plot_scores, side_by_side_matches, trajectory_topdown


def test_stage_timer_stats():
    t = StageTimer()
    for _ in range(5):
        with t.stage("descriptor"):
            time.sleep(0.002)
    s = t.stats()
    assert s["descriptor"]["count"] == 5
    assert s["descriptor"]["mean_ms"] >= 1.5
    assert t.estimated_ms("descriptor") >= 1.5
    assert t.estimated_ms("missing") is None


def test_plot_scores_renders():
    scores = np.sin(np.linspace(0, 6, 200)) * 0.9
    img = plot_scores(scores, marks=[50, 120], threshold=0.85)
    assert img.shape == (240, 640, 3) and img.dtype == np.uint8
    assert img.std() > 0  # actually drew something
    empty = plot_scores(np.zeros(0))
    assert empty.shape == (240, 640, 3)


def test_side_by_side_matches_renders():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (120, 160)).astype(np.uint8)
    b = rng.integers(0, 255, (120, 160)).astype(np.uint8)
    xy = rng.uniform(10, 100, (30, 2))
    img = side_by_side_matches(a, b, xy, xy, np.ones(30, bool), accepted=True)
    assert img.shape[1] == 320 and img.dtype == np.uint8
    np.testing.assert_array_equal(img[0, 0], [40, 180, 60])  # accept banner
    img2 = side_by_side_matches(a, b, xy, xy, np.ones(30, bool), accepted=False)
    np.testing.assert_array_equal(img2[0, 0], [200, 50, 50])


def test_trajectory_topdown_renders():
    n = 50
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    ang = np.linspace(0, 2 * np.pi, n)
    poses[:, 0, 3] = 10 * np.cos(ang)
    poses[:, 1, 3] = 10 * np.sin(ang)
    world = np.zeros(n, np.int32)
    world[25:] = 1
    img = trajectory_topdown(poses, world_id=world, loop_pairs=[(0, 49)])
    assert img.shape == (480, 480, 3)
    assert img.std() > 0


def test_run_sequence_emits_device_trace(tmp_path):
    """run_sequence(trace_dir=...) captures a jax.profiler device trace
    (SURVEY §5.1 parity: per-run tracing, VERDICT r1 #10)."""
    import dataclasses

    from cerebro_tpu.config import CerebroConfig, DescriptorConfig, RuntimeConfig
    from cerebro_tpu.eval import run_sequence
    from cerebro_tpu.runtime import CerebroPipeline

    cfg = CerebroConfig(
        descriptor=DescriptorConfig(image_hw=(32, 32), kind="gist"),
        runtime=RuntimeConfig(descriptor_batch=4, stash_dir=str(tmp_path / "stash")),
    )
    pipe = CerebroPipeline(cfg)
    rng = np.random.default_rng(0)

    class _F:
        def __init__(self, i):
            self.stamp = 1.0 + i
            self.pose = None
            self._img = rng.integers(0, 255, (32, 32), np.uint8)

        def left(self):
            return self._img

        def right(self):
            return None

    trace_dir = str(tmp_path / "trace")
    report = run_sequence(pipe, [_F(i) for i in range(6)], trace_dir=trace_dir)
    assert report.n_frames == 6
    import glob
    traces = glob.glob(trace_dir + "/**/*.trace*", recursive=True) + glob.glob(
        trace_dir + "/**/*.xplane*", recursive=True
    )
    assert traces, f"no trace artifacts under {trace_dir}"
