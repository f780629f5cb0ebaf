#!/usr/bin/env python
"""Run the full engine over a EuRoC sequence (ASL folder layout).

The offline equivalent of the reference's
``roslaunch cerebro euroc_vinsfusion.launch`` + ``rosbag play``
(ref launch/euroc_vinsfusion.launch): loads the rig from the EuRoC cam
yamls, streams frames through the pipeline, verifies candidates, optimizes
the trajectory, and writes a JSON report (+ optional renders).

Usage:
  python scripts/run_euroc.py /data/MH_01_easy/mav0 --out /tmp/mh01 \
      [--descriptor ported|gist|netvlad] [--stride 2] [--max-frames N] \
      [--ate [--odom-drift D]] [--save-state DIR | --load-state DIR]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mav0")
    ap.add_argument("--out", default="/tmp/cerebro_run")
    ap.add_argument(
        "--descriptor", default="ported",
        choices=["ported", "gist", "netvlad"],
        help="'ported' runs the reference's own trained flagship weights "
             "(artifacts/descriptor_ported)",
    )
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save-state", default=None, help="teach: save map here")
    ap.add_argument("--load-state", default=None, help="repeat: load map from here")
    ap.add_argument(
        "--trace", default=None, help="emit a jax.profiler device trace to this dir"
    )
    ap.add_argument(
        "--ate", action="store_true",
        help="report ATE RMSE before (fed odometry) and after pose-graph "
             "optimization against the sequence ground truth "
             "(state_groundtruth_estimate0)",
    )
    ap.add_argument(
        "--odom-drift", type=float, default=0.0,
        help="with --ate: per-frame random-walk drift (metres std) injected "
             "into the fed odometry, simulating VINS drift so the "
             "loop-closure correction is visible (ground truth stays clean)",
    )
    ap.add_argument(
        "--config",
        default=os.path.join(
            os.path.dirname(__file__), "..", "configs", "euroc", "euroc_stereo_config.yaml"
        ),
        help="opencv-yaml rig config (VINS-Fusion format, ref config/vinsfusion/**)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    from cerebro_tpu.config import CerebroConfig, DescriptorConfig
    from cerebro_tpu.eval import ate_rmse, evaluate_against_gt, run_sequence
    from cerebro_tpu.geometry import cameras, stereo
    from cerebro_tpu.io import load_pipeline_state, save_pipeline_state
    from cerebro_tpu.io.euroc import EurocSequence
    from cerebro_tpu.runtime import CerebroPipeline
    from cerebro_tpu.utils.plot import trajectory_topdown

    # Rig from the opencv-yaml config front-end (the reference boots from
    # the same format: cam yamls + extrinsic, src/cerebro_node.cpp:105-373)
    from cerebro_tpu.io.rig_config import load_rig_config

    spec = load_rig_config(args.config)
    assert spec.cam1 is not None and spec.c1_T_c0 is not None, "stereo rig required"
    rect = stereo.StereoRectifier(
        spec.cam0, spec.cam1, spec.c1_T_c0.astype(np.float32), out_hw=spec.image_hw
    )
    rig = rect.rig

    cfg = CerebroConfig(
        descriptor=DescriptorConfig(image_hw=spec.image_hw, kind=args.descriptor)
    )
    seq = EurocSequence(args.mav0)
    print(f"sequence: {len(seq)} cam0 frames", flush=True)

    if args.load_state:
        pipe = load_pipeline_state(args.load_state, cfg=cfg, rig=rig)
    else:
        pipe = CerebroPipeline(cfg, rig=rig)

    class _RectFrame:
        """Loader frame undistorted+rectified into the verification rig."""

        __slots__ = ("stamp", "pose", "_l", "_r")

        def __init__(self, stamp, pose, l, r):
            self.stamp, self.pose, self._l, self._r = stamp, pose, l, r

        def left(self):
            return self._l

        def right(self):
            return self._r

    gt_positions = []  # clean ground truth per pose-carrying frame
    drift_rng = np.random.default_rng(0)
    drift_t = np.zeros(3, np.float32)

    def RectifiedFrames(frames):
        nonlocal drift_t
        for f in frames:
            left, right = rect.rectify(f.left(), f.right())
            pose = f.pose
            if pose is not None and args.ate:
                gt_positions.append(np.asarray(pose)[:3, 3].copy())
                if args.odom_drift > 0:
                    # translation random walk — the dominant VINS error
                    # mode loop closure exists to correct
                    drift_t = drift_t + drift_rng.normal(
                        0, args.odom_drift, 3
                    ).astype(np.float32)
                    pose = np.array(pose, np.float32)
                    pose[:3, 3] += drift_t
            yield _RectFrame(f.stamp, pose, left, right)

    report = run_sequence(
        pipe,
        RectifiedFrames(seq.frames(stride=args.stride)),
        max_frames=args.max_frames,
        trace_dir=args.trace,
    )
    if args.ate and gt_positions:
        # the generator may have yielded one frame past max_frames before
        # run_sequence stopped consuming — truncate gt to the rows stored
        n_posed = int(pipe.store.pose_valid[: pipe.store.size].sum())
        report = evaluate_against_gt(
            pipe, report, np.asarray(gt_positions[:n_posed], np.float32)
        )

    os.makedirs(args.out, exist_ok=True)
    traj = pipe.optimize_trajectory()
    if traj is not None:
        np.save(os.path.join(args.out, "trajectory.npy"), traj)
        img = trajectory_topdown(
            traj,
            world_id=pipe.store.world_id[: pipe.store.size],
            loop_pairs=[(e.idx_prev, e.idx_curr) for e in pipe.loop_edges],
        )
        np.save(os.path.join(args.out, "trajectory_render.npy"), img)

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(
            {
                "report": report.as_json(),
                "status": pipe.status(),
                "loop_edges": [e.as_json() for e in pipe.loop_edges],
                "found_loops": pipe.found_loops_json(),
            },
            f,
            indent=2,
        )
    print(json.dumps(report.as_json()), flush=True)

    if args.save_state:
        save_pipeline_state(pipe, args.save_state)
        print(f"state saved to {args.save_state}", flush=True)


if __name__ == "__main__":
    main()
