"""Evaluation: ATE metrics and sequence runners.

The reference ships no automated eval (SURVEY.md §4 — inspection via rviz
and offline JSON dumps); the BASELINE targets require EuRoC ATE parity and
throughput numbers, so this module provides:

  * ``ate_rmse``            — absolute trajectory error with optional
                              Umeyama (rigid/similarity) alignment;
  * ``run_sequence``        — drive a CerebroPipeline over any frame
                              iterator (EuRoC via io/euroc.py, or synthetic)
                              collecting per-stage timings and outputs;
  * ``evaluate_against_gt`` — before/after-optimization ATE report.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterable, Optional

import jax.numpy as jnp
import numpy as np

from cerebro_tpu.geometry import se3
from cerebro_tpu.ops.umeyama import umeyama_rigid
from cerebro_tpu.runtime import CerebroPipeline
from cerebro_tpu.utils import StageTimer


def ate_rmse(
    est_xyz: np.ndarray,  # (N, 3) estimated positions
    gt_xyz: np.ndarray,  # (N, 3) ground-truth positions
    align: bool = True,
) -> float:
    """Absolute trajectory error (RMSE of positions), optionally after a
    rigid Umeyama alignment (the standard ATE protocol)."""
    est = np.asarray(est_xyz, np.float64)
    gt = np.asarray(gt_xyz, np.float64)
    if align and len(est) >= 3:
        T, _ = umeyama_rigid(
            jnp.asarray(est, jnp.float32),
            jnp.asarray(gt, jnp.float32),
            jnp.ones(len(est), jnp.float32),
        )
        T = np.asarray(T, np.float64)
        est = est @ T[:3, :3].T + T[:3, 3]
    return float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=-1))))


@dataclasses.dataclass
class RunReport:
    n_frames: int
    n_keyframes: int
    n_candidates: int
    n_loop_edges: int
    keyframes_per_s: float
    timings: dict
    ate_before: Optional[float] = None
    ate_after: Optional[float] = None

    def as_json(self) -> dict:
        return dataclasses.asdict(self)


def run_sequence(
    pipe: CerebroPipeline,
    frames: Iterable,  # yields objects with .stamp, .left(), .right(), .pose
    n_tracked_default: int = 100,
    verify: bool = True,
    max_frames: Optional[int] = None,
    trace_dir: Optional[str] = None,  # emit a jax.profiler device trace here
) -> RunReport:
    if trace_dir is not None:
        # per-run device trace (SURVEY §5.1: the reference's pervasive
        # ElapsedTime tic/toc becomes host StageTimer + an XLA device trace)
        from cerebro_tpu.utils.timing import device_trace

        with device_trace(trace_dir):
            report = run_sequence(
                pipe, frames, n_tracked_default, verify, max_frames, None
            )
        return report
    timer = StageTimer()
    n = 0
    t0 = time.perf_counter()
    for f in frames:
        if max_frames is not None and n >= max_frames:
            break
        with timer.stage("ingest"):
            pipe.ingest_frame(
                f.stamp,
                f.left(),
                n_tracked=getattr(f, "n_tracked", n_tracked_default),
                pose=f.pose,
                right_img=f.right() if hasattr(f, "right") else None,
            )
        n += 1
    with timer.stage("flush"):
        pipe.flush_descriptors()
    if verify and pipe.rig is not None:
        with timer.stage("verify"):
            pipe.verify_pending()
    wall = time.perf_counter() - t0
    st = pipe.status()
    return RunReport(
        n_frames=st["frames"],
        n_keyframes=st["keyframes"],
        n_candidates=st["pending_candidates"],
        n_loop_edges=st["loop_edges"],
        keyframes_per_s=st["described"] / max(wall, 1e-9),
        timings=timer.stats(),
    )


def evaluate_against_gt(
    pipe: CerebroPipeline,
    report: RunReport,
    gt_positions: np.ndarray,  # (K, 3) ground truth for keyframes with poses
    align: bool = True,
) -> RunReport:
    """Fill in ATE before (raw ingested odometry) and after (pose-graph
    optimized) against ground-truth keyframe positions."""
    kf = np.nonzero(pipe.store.pose_valid[: pipe.store.size])[0]
    if len(kf) < 3 or len(gt_positions) != len(kf):
        return report
    before = pipe.store.poses[kf][:, :3, 3]
    report.ate_before = ate_rmse(before, gt_positions, align=align)
    out = pipe.optimize_trajectory()
    if out is not None:
        report.ate_after = ate_rmse(out[:, :3, 3], gt_positions, align=align)
    return report
