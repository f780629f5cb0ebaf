#!/usr/bin/env python
"""Self-contained full-system demo on a synthetic world (no dataset needed).

Renders a textured two-plane scene from a loopy multi-session trajectory
(including a kidnap + mis-anchored second session), streams it through the
complete engine — batched descriptors, loop detection, geometric
verification, multi-world pose-graph merge — and writes the report +
renders. This is the runnable equivalent of the reference's
rosbag-replay integration test (SURVEY.md §4.3), with ground truth.

  python scripts/run_synthetic.py --out /tmp/demo [--cpu] [--frames 24]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def fractal_texture(rng, n=4096):
    out = np.zeros((n, n), np.float32)
    for scale, amp in [(4, 0.5), (16, 1.0), (64, 2.0)]:
        small = rng.normal(size=(n // scale, n // scale)).astype(np.float32)
        big = np.kron(small, np.ones((scale, scale), np.float32))
        for _ in range(3):
            big = 0.25 * (
                np.roll(big, 1, 0) + np.roll(big, -1, 0)
                + np.roll(big, 1, 1) + np.roll(big, -1, 1)
            )
        out += amp * big
    return (out - out.min()) / (out.max() - out.min())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/cerebro_synth")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=14)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    from cerebro_tpu.config import (
        CerebroConfig, DescriptorConfig, LoopConfig, PoseGraphConfig,
        RuntimeConfig, VerifyConfig,
    )
    from cerebro_tpu.eval import ate_rmse
    from cerebro_tpu.geometry import se3, stereo
    from cerebro_tpu.runtime import CerebroPipeline
    from cerebro_tpu.utils import StageTimer
    from cerebro_tpu.utils.plot import trajectory_topdown

    H, W, FX = 240, 320, 300.0
    CX, CY, BASE = W / 2, H / 2, 0.11
    Z_NEAR, Z_FAR, X_SPLIT = 4.0, 7.0, 0.0
    rig = stereo.RectifiedRig(
        R0=jnp.eye(3), R1=jnp.eye(3),
        fx=jnp.asarray(FX), fy=jnp.asarray(FX),
        cx=jnp.asarray(CX), cy=jnp.asarray(CY), baseline=jnp.asarray(BASE),
    )

    rng = np.random.default_rng(11)
    tex = fractal_texture(rng)

    def cam_pose(i):
        return np.asarray(
            se3.make_pose(
                se3.ypr_to_rot(jnp.asarray([0.02 * i, 0.0, 0.0])),
                jnp.asarray([0.35 * i, 0.05 * i, 0.0]),
            )
        ).astype(np.float32)

    def render(w_T_c):
        R, tv = w_T_c[:3, :3], w_T_c[:3, 3]
        u, v = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
        rays = np.stack([(u - CX) / FX, (v - CY) / FX, np.ones_like(u)], -1)
        dirs = rays @ R.T
        s_near = (Z_NEAR - tv[2]) / dirs[..., 2]
        p_near = tv[None, None] + s_near[..., None] * dirs
        s = np.where(p_near[..., 0] < X_SPLIT, s_near, (Z_FAR - tv[2]) / dirs[..., 2])
        p = tv[None, None] + s[..., None] * dirs
        tx = p[..., 0] * 150.0 + tex.shape[1] / 2
        ty = p[..., 1] * 150.0 + tex.shape[0] / 2
        img = np.asarray(
            stereo.remap_bilinear(jnp.asarray(tex), jnp.asarray(np.stack([tx, ty], -1)))
        )
        return np.clip(img * 255, 0, 255).astype(np.uint8)

    def stereo_pair(T):
        Tr = T.copy()
        Tr[:3, 3] += T[:3, :3] @ np.array([BASE, 0, 0], np.float32)
        return render(T), render(Tr)

    cfg = CerebroConfig(
        descriptor=DescriptorConfig(image_hw=(H, W), trunk_dim=64, num_clusters=4, kind="gist"),
        loop=LoopConfig(db_capacity=1024, exclusion_window=6),
        verify=dataclasses.replace(
            VerifyConfig(), max_features=1024, ransac_hypotheses=128,
            gms_factor=4.0, min_matches_accept=200, min_pair_dt_s=2.0,
        ),
        posegraph=PoseGraphConfig(max_gn_iters=10, cg_iters=60),
        runtime=RuntimeConfig(descriptor_batch=4, stash_dir=os.path.join(args.out, "stash"),
                              image_ram_window_s=1e9),
    )
    pipe = CerebroPipeline(cfg, rig=rig)
    timer = StageTimer()

    print("session 1: mapping...", flush=True)
    t = 0.0
    n = args.frames
    for i in range(n):
        la, ra = stereo_pair(cam_pose(i))
        with timer.stage("ingest"):
            pipe.ingest_frame(t, la, n_tracked=100, pose=cam_pose(i), right_img=ra)
        t += 1.0

    print("kidnap + session 2 (mis-anchored): revisiting...", flush=True)
    off = np.asarray(
        se3.make_pose(se3.ypr_to_rot(jnp.asarray([0.35, 0.0, 0.0])), jnp.asarray([4.0, 0.0, 0.0]))
    ).astype(np.float32)
    t += 50.0
    revisit = list(range(2, min(6, n - 1)))
    for i in revisit:
        la, ra = stereo_pair(cam_pose(i))
        with timer.stage("ingest"):
            pipe.ingest_frame(t, la, n_tracked=100, pose=(off @ cam_pose(i)), right_img=ra)
        t += 1.0

    with timer.stage("flush"):
        pipe.flush_descriptors()
    with timer.stage("verify"):
        n_acc = pipe.verify_pending()
    with timer.stage("optimize"):
        traj = pipe.optimize_trajectory()

    gt = np.stack([cam_pose(i)[:3, 3] for i in revisit])
    est = traj[n : n + len(revisit), :3, 3]
    ate = ate_rmse(est, gt, align=False)

    os.makedirs(args.out, exist_ok=True)
    pipe.dump_debug(os.path.join(args.out, "debug"))
    img = trajectory_topdown(
        traj, world_id=pipe.store.world_id[: pipe.store.size],
        loop_pairs=[(e.idx_prev, e.idx_curr) for e in pipe.loop_edges],
    )
    np.save(os.path.join(args.out, "trajectory_render.npy"), img)

    result = {
        "status": pipe.status(),
        "verified_edges": n_acc,
        "session2_merged_ate_m": round(ate, 4),
        "session2_anchor_error_m": 4.0,
        "timings_ms": timer.stats(),
    }
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "timings_ms"}, indent=2))
    print("OK" if (n_acc >= 1 and ate < 0.3) else "DEGRADED", flush=True)


if __name__ == "__main__":
    main()
