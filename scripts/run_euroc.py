#!/usr/bin/env python
"""Run the full engine over a EuRoC sequence (ASL folder layout).

The offline equivalent of the reference's
``roslaunch cerebro euroc_vinsfusion.launch`` + ``rosbag play``
(ref launch/euroc_vinsfusion.launch): loads the rig from the EuRoC cam
yamls, streams frames through the pipeline, verifies candidates, optimizes
the trajectory, and writes a JSON report (+ optional renders).

Usage:
  python scripts/run_euroc.py /data/MH_01_easy/mav0 --out /tmp/mh01 \
      [--descriptor gist|netvlad] [--params ckpt] [--stride 2] [--max-frames N]
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
    ap.add_argument("--descriptor", default="gist", choices=["gist", "netvlad"])
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save-state", default=None, help="teach: save map here")
    ap.add_argument("--load-state", default=None, help="repeat: load map from here")
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

    # EuRoC cam0/cam1 intrinsics + extrinsics (the values in the reference's
    # config/vinsfusion/euroc yamls)
    cam0 = cameras.make_pinhole(
        458.654, 457.296, 367.215, 248.375,
        (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05),
        width=752, height=480,
    )
    cam1 = cameras.make_pinhole(
        457.587, 456.134, 379.999, 255.238,
        (-0.28368365, 0.07451284, -0.00010473, -3.55590700e-05),
        width=752, height=480,
    )
    # cam1_T_cam0 from the EuRoC sensor yamls (body_T_cam products)
    c1_T_c0 = np.array(
        [
            [0.999997, 0.002312, -0.000760, -0.110074],
            [-0.002317, 0.999898, -0.014090, 0.000399],
            [0.000727, 0.014091, 0.999900, -0.000853],
            [0.0, 0.0, 0.0, 1.0],
        ],
        np.float32,
    )
    rect = stereo.StereoRectifier(cam0, cam1, c1_T_c0, out_hw=(480, 752))
    rig = rect.rig

    cfg = CerebroConfig(
        descriptor=DescriptorConfig(image_hw=(480, 752), kind=args.descriptor)
    )
    seq = EurocSequence(args.mav0)
    print(f"sequence: {len(seq)} cam0 frames", flush=True)

    if args.load_state:
        pipe = load_pipeline_state(args.load_state, cfg=cfg, rig=rig)
    else:
        pipe = CerebroPipeline(cfg, rig=rig)

    class RectifiedFrames:
        """Wrap loader frames: undistort+rectify before the pipeline (the
        raw EuRoC images are distorted; verification assumes the rig)."""

        def __init__(self, frames):
            self._frames = frames

        def __iter__(self):
            for f in self._frames:
                left, right = rect.rectify(f.left(), f.right())

                class _F:
                    stamp = f.stamp
                    pose = f.pose

                    def left(self_inner):
                        return left

                    def right(self_inner):
                        return right

                yield _F()

    report = run_sequence(
        pipe, RectifiedFrames(seq.frames(stride=args.stride)), max_frames=args.max_frames
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
