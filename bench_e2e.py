#!/usr/bin/env python
"""Scaled end-to-end accuracy benchmark (VERDICT r1 #2).

Streams a procedurally rendered long survey (cerebro_tpu.synthworld:
>=1000 stereo frames, multiple planted revisit laps, one kidnap with
teleport, VINS-like drifting odometry) through the full engine —
descriptors -> loop detection -> geometric verification -> multi-world
pose-graph — and reports:

  * loop-candidate precision / recall against planted revisits,
  * accepted-edge precision,
  * ATE (RMSE, aligned) before vs after the pose-graph correction,
  * ingest throughput (keyframes/s).

The reference's corresponding evidence is live EuRoC rviz runs
(README.md:17-60); this harness gives the same scenario exact ground truth.

Emits one JSON line; use --out to also write the full report file.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def run(n_frames: int, laps: float, cpu: bool, descriptor: str, out: str | None,
        verify_batch: int = 8):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from cerebro_tpu import synthworld as sw
    from cerebro_tpu.config import (
        CerebroConfig,
        DescriptorConfig,
        RuntimeConfig,
        VerifyConfig,
    )
    from cerebro_tpu.eval import ate_rmse
    from cerebro_tpu.runtime import CerebroPipeline

    world = sw.CircuitWorld.create(seed=0)
    ren = sw.Renderer(world)
    seq = sw.make_sequence(n_frames=n_frames, laps=laps)

    from cerebro_tpu.config import LoopConfig

    # DB sized to the run (multiple of the pallas history tile, TILE_N=512)
    cap = ((n_frames + 511) // 512 + 1) * 512
    cfg = CerebroConfig(
        descriptor=DescriptorConfig(image_hw=(sw.IMG_H, sw.IMG_W), kind=descriptor),
        loop=LoopConfig(db_capacity=cap),
        runtime=RuntimeConfig(descriptor_batch=16, stash_dir="/tmp/bench_e2e_stash"),
        # match-count gates rescaled for 240x320 synthetic texture density
        # (the reference's 150/800 assume ORB x 5000 on 752x480; same ratio)
        verify=dataclasses.replace(
            VerifyConfig(),
            max_features=1024,
            ransac_hypotheses=128,
            gms_factor=4.0,
            min_matches_accept=200,
        ),
    )
    pipe = CerebroPipeline(cfg, rig=ren.rig(), body_T_cam=sw.body_T_cam())

    # --- stream ---------------------------------------------------------
    t0 = time.perf_counter()
    k0, k1 = seq.kidnap_span
    for i in range(n_frames):
        left, right = ren.stereo(seq.xy[i, 0], seq.xy[i, 1])
        in_kidnap = k0 <= i < k1
        pipe.ingest_frame(
            float(seq.stamps[i]),
            left,
            n_tracked=int(seq.n_tracked[i]),
            pose=None if in_kidnap else seq.odom_poses[i],
            right_img=right,
            is_keyframe=bool(seq.is_keyframe[i]),
        )
    pipe.flush_descriptors()
    stream_wall = time.perf_counter() - t0

    # --- candidate precision / recall ------------------------------------
    cands = [(c.idx_curr, c.idx_prev) for c in pipe.candidates]
    xy = seq.xy

    def pair_dist(a, b):
        return float(np.linalg.norm(xy[a] - xy[b]))

    correct = [c for c in cands if pair_dist(*c) < 1.5]
    precision = len(correct) / max(len(cands), 1)
    gt_revisit = sw.revisit_ground_truth(seq)
    detected_frames = {a for a, b in correct}
    n_opportunities = int(gt_revisit.sum())
    recall = len(detected_frames & set(np.nonzero(gt_revisit)[0])) / max(
        n_opportunities, 1
    )

    # --- geometric verification ------------------------------------------
    t1 = time.perf_counter()
    accepted = pipe.verify_pending(device_batch=verify_batch)
    verify_wall = time.perf_counter() - t1
    edge_pairs = [(e.idx_curr, e.idx_prev) for e in pipe.loop_edges]
    edge_correct = [p for p in edge_pairs if pair_dist(*p) < 1.0]
    edge_precision = len(edge_correct) / max(len(edge_pairs), 1)

    # --- ATE before/after -------------------------------------------------
    kf = np.nonzero(pipe.store.pose_valid[: pipe.store.size])[0]
    world_id = pipe.store.world_id[kf]
    gt_pos = seq.gt_poses[kf][:, :3, 3]
    odo_pos = pipe.store.poses[kf][:, :3, 3]
    w0 = world_id == 0
    ate_before_w0 = ate_rmse(odo_pos[w0], gt_pos[w0])
    opt = pipe.optimize_trajectory()
    ate_after = ate_rmse(opt[:, :3, 3], gt_pos) if opt is not None else float("nan")
    ate_after_w0 = (
        ate_rmse(opt[w0][:, :3, 3], gt_pos[w0]) if opt is not None else float("nan")
    )

    st = pipe.status()
    report = {
        "n_frames": int(st["frames"]),
        "n_keyframes": int(st["keyframes"]),
        "n_candidates": len(cands),
        "candidate_precision": round(precision, 4),
        "candidate_recall": round(recall, 4),
        "revisit_opportunities": n_opportunities,
        "n_loop_edges": len(edge_pairs),
        "edge_precision": round(edge_precision, 4),
        "kidnap_intervals": st["kidnap"]["intervals"],
        "worlds": int(st["kidnap"]["world_id"]) + 1,
        "ate_before_m_world0": round(ate_before_w0, 4),
        "ate_after_m_world0": round(ate_after_w0, 4),
        "ate_after_m_all": round(ate_after, 4),
        "ate_improvement_x": round(ate_before_w0 / max(ate_after_w0, 1e-9), 2),
        "keyframes_per_s": round(st["described"] / stream_wall, 2),
        "verify_pairs_per_s": round(len(cands) / max(verify_wall, 1e-9), 2),
        "timings_ms": st["timings_ms"],
        "descriptor": descriptor,
        "device": str(jax.devices()[0].platform),
    }
    if out:
        with open(out, "w") as f:
            json.dump(report, f, indent=2)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--laps", type=float, default=3.5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--descriptor", default="ported", choices=["gist", "netvlad", "ported"],
        help="'ported' = the reference's trained NetVLAD weights run natively",
    )
    ap.add_argument("--out", default=None, help="write the full report JSON here")
    args = ap.parse_args()
    report = run(args.frames, args.laps, args.cpu, args.descriptor, args.out)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
