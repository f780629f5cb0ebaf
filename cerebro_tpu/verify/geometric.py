"""Geometric verification of loop candidates: the consumer stage.

Re-implements the behavior of the reference's
``loopcandiate_consumer_thread`` + ``process_loop_candidate_imagepair_
consistent_pose_compute`` (src/Cerebro.cpp:1185-2213) and
``ProcessedLoopCandidate::makeLoopEdgeMsgWithConsistencyCheck``
(src/ProcessedLoopCandidate.cpp:40-116) as ONE jitted program per
candidate pair (vmap-able over batches):

  stereo depth for both frames         (geometry/stereo.py — StereoBM parity)
  point matches between the two lefts  (ops/features.py — GMS-ORB parity)
  reject if matches < min_matches_attempt            (ref :1487  >=150)
  pose three independent ways, all RANSAC:
    Option A:  PnP( 3D of a -> 2D of b )             (ref :1509-1529)
    Option B:  PnP( 3D of b -> 2D of a ), inverted   (ref :1563-1586)
    Option C:  3D-3D Umeyama ICP                     (ref :1620-1643)
  consistency: pairwise delta-poses within 5 deg / 0.2 m   (ref :77-87)
  accept iff consistent AND matches > min_matches_accept   (ref :112 >800)
  final pose := Option A, confidence := max goodness       (ref :114-116)

The reference runs this at 1 Hz on one CPU core per pair; here all RANSAC
hypotheses for all three options solve as batched kernels inside a single
XLA program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from cerebro_tpu.config import VerifyConfig
from cerebro_tpu.geometry import se3, stereo
from cerebro_tpu.ops import features, ransac


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VerifiedLoop:
    """ProcessedLoopCandidate equivalent (src/ProcessedLoopCandidate.h)."""

    T_b_a: jax.Array  # (4,4) final relative pose (Option A)
    poses: jax.Array  # (3,4,4) options A, B(inverted), C
    option_success: jax.Array  # (3,) bool per-option RANSAC success
    confidences: jax.Array  # (3,) float32 inlier ratios ("goodness")
    n_matches: jax.Array  # () int32 GMS match count
    consistent: jax.Array  # () bool 3-way pose agreement
    accepted: jax.Array  # () bool final gate

    @property
    def confidence(self) -> jax.Array:
        return jnp.max(self.confidences)


def _gather_3d(pts: jax.Array, ok: jax.Array, xy: jax.Array):
    """3D point + validity at (rounded) pixel coords."""
    x = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, pts.shape[1] - 1)
    y = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, pts.shape[0] - 1)
    return pts[y, x], ok[y, x]


def _normalized(xy: jax.Array, rig: stereo.RectifiedRig) -> jax.Array:
    """Pixel -> ideal coords in the rectified pinhole (the K^-1 normalization
    of ref src/utils/PointFeatureMatching.cpp:95-153)."""
    return jnp.stack(
        [(xy[:, 0] - rig.cx) / rig.fx, (xy[:, 1] - rig.cy) / rig.fy], axis=-1
    )


def _verify_pair_impl(
    cfg: VerifyConfig,
    key: jax.Array,
    left_a: jax.Array,  # (H, W) rectified grayscale float32
    right_a: jax.Array,
    left_b: jax.Array,
    right_b: jax.Array,
    rig: stereo.RectifiedRig,
) -> VerifiedLoop:
    # --- stereo depth both frames (ref :1455-1474) ---
    pts_a, ok_a, _ = stereo.depth_pipeline_rectified(
        left_a, right_a, rig, num_disp=cfg.num_disparities, block=cfg.block_size
    )
    pts_b, ok_b, _ = stereo.depth_pipeline_rectified(
        left_b, right_b, rig, num_disp=cfg.num_disparities, block=cfg.block_size
    )
    return _verify_from_points(cfg, key, left_a, pts_a, ok_a, left_b, pts_b, ok_b, rig)


def _verify_pair_depth_impl(
    cfg: VerifyConfig,
    key: jax.Array,
    left_a: jax.Array,  # (H, W) grayscale float32
    depth_a: jax.Array,  # (H, W) metres
    left_b: jax.Array,
    depth_b: jax.Array,
    rig: stereo.RectifiedRig,
) -> VerifiedLoop:
    """Depth-camera variant: 3D structure from the depth images directly
    (the reference's realsense/depth-topic rigs) — same matching, same
    3-way pose compute, same gates."""
    pts_a, ok_a = stereo.depth_to_points(depth_a, rig, cfg.min_depth, cfg.max_depth)
    pts_b, ok_b = stereo.depth_to_points(depth_b, rig, cfg.min_depth, cfg.max_depth)
    return _verify_from_points(cfg, key, left_a, pts_a, ok_a, left_b, pts_b, ok_b, rig)


def _verify_from_points(
    cfg: VerifyConfig,
    key: jax.Array,
    left_a: jax.Array,
    pts_a: jax.Array,
    ok_a: jax.Array,
    left_b: jax.Array,
    pts_b: jax.Array,
    ok_b: jax.Array,
    rig: stereo.RectifiedRig,
) -> VerifiedLoop:
    # --- point matches between the two left images (ref :1484-1493) ---
    if cfg.matcher == "steerable":
        m = features.match_image_pair_steerable(
            left_a, left_b, max_kp=cfg.max_features,
            gms_factor=cfg.gms_factor, oriented=cfg.oriented_matching,
            scales=cfg.scale_banks,
        )
    else:
        m = features.match_image_pair(
            left_a, left_b, max_kp=cfg.max_features, gms_factor=cfg.gms_factor,
            oriented=cfg.oriented_matching, scales=cfg.scale_banks,
        )
    n_matches = m.count()
    attempt = n_matches >= cfg.min_matches_attempt

    X_a, d_ok_a = _gather_3d(pts_a, ok_a, m.xy_a)
    X_b, d_ok_b = _gather_3d(pts_b, ok_b, m.xy_b)
    x_a = _normalized(m.xy_a, rig)
    x_b = _normalized(m.xy_b, rig)

    depth_ok_a = d_ok_a & (X_a[:, 2] > cfg.min_depth) & (X_a[:, 2] < cfg.max_depth)
    depth_ok_b = d_ok_b & (X_b[:, 2] > cfg.min_depth) & (X_b[:, 2] < cfg.max_depth)

    k1, k2, k3 = jax.random.split(key, 3)

    # Option A: 3D(a) -> 2D(b): returns b_T_a (ref :1509-1529)
    res_a = ransac.ransac_pnp(
        k1, X_a, x_b, m.valid & depth_ok_a,
        n_hyp=cfg.ransac_hypotheses,
        sample_size=cfg.pnp_sample_size,
        inlier_thresh=cfg.pnp_inlier_error,
        min_inlier_ratio=cfg.min_inlier_ratio,
        min_points=cfg.min_points_for_solve,
    )
    # Option B: 3D(b) -> 2D(a): returns a_T_b, invert (ref :1563-1586)
    res_b = ransac.ransac_pnp(
        k2, X_b, x_a, m.valid & depth_ok_b,
        n_hyp=cfg.ransac_hypotheses,
        sample_size=cfg.pnp_sample_size,
        inlier_thresh=cfg.pnp_inlier_error,
        min_inlier_ratio=cfg.min_inlier_ratio,
        min_points=cfg.min_points_for_solve,
    )
    T_b_inv = se3.pose_inverse(res_b.T)
    # Option C: 3D-3D (ref :1620-1643). The inlier threshold is
    # depth-adaptive (per correspondence): stereo depth noise grows as
    # Z^2, so a fixed metre threshold rejects every far point regardless
    # of pose correctness (see VerifyConfig.icp_depth_relative).
    icp_thresh = jnp.maximum(
        cfg.icp_inlier_error,
        cfg.icp_depth_relative * jnp.maximum(X_a[:, 2], X_b[:, 2]),
    )
    res_c = ransac.ransac_icp(
        k3, X_a, X_b, m.valid & depth_ok_a & depth_ok_b,
        n_hyp=cfg.ransac_hypotheses,
        sample_size=cfg.icp_sample_size,
        inlier_thresh=icp_thresh,
        min_inlier_ratio=cfg.min_inlier_ratio,
        min_points=cfg.min_points_for_solve,
    )

    poses = jnp.stack([res_a.T, T_b_inv, res_c.T])
    successes = jnp.stack([res_a.success, res_b.success, res_c.success])
    confs = jnp.stack([res_a.confidence, res_b.confidence, res_c.confidence])

    # --- 3-way consistency (ref ProcessedLoopCandidate.cpp:63-87):
    # pairwise delta-poses within consistency_deg / consistency_m ---
    ang_ab, t_ab = se3.pose_delta_metrics(poses[0], poses[1])
    ang_ac, t_ac = se3.pose_delta_metrics(poses[0], poses[2])
    ang_bc, t_bc = se3.pose_delta_metrics(poses[1], poses[2])
    ang_ok = jnp.maximum(jnp.maximum(ang_ab, ang_ac), ang_bc) < cfg.consistency_deg
    t_ok = jnp.maximum(jnp.maximum(t_ab, t_ac), t_bc) < cfg.consistency_m
    nan_free = jnp.all(jnp.isfinite(poses))  # ref NaN guard :1678-1681
    consistent = ang_ok & t_ok & nan_free & jnp.all(successes)

    accepted = attempt & consistent & (n_matches > cfg.min_matches_accept)

    return VerifiedLoop(
        T_b_a=poses[0],
        poses=poses,
        option_success=successes,
        confidences=confs,
        n_matches=n_matches,
        consistent=consistent,
        accepted=accepted,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def verify_pair(cfg, key, left_a, right_a, left_b, right_b, rig) -> VerifiedLoop:
    return _verify_pair_impl(cfg, key, left_a, right_a, left_b, right_b, rig)


@functools.partial(jax.jit, static_argnames=("cfg",))
def verify_pair_batch(
    cfg: VerifyConfig,
    keys: jax.Array,  # (P, 2) PRNG keys
    left_a: jax.Array,  # (P, H, W)
    right_a: jax.Array,
    left_b: jax.Array,
    right_b: jax.Array,
    rig: stereo.RectifiedRig,
) -> VerifiedLoop:
    """vmap'd verification: P candidate pairs in one device dispatch.

    The reference processes candidates one at a time at 1 Hz on a CPU core
    (src/Cerebro.cpp:1203); here a whole batch of pairs — stereo depth,
    matching, and all three RANSAC pose options — executes as one fused
    XLA program. All VerifiedLoop fields gain a leading P axis.
    """
    return jax.vmap(
        _verify_pair_impl, in_axes=(None, 0, 0, 0, 0, 0, None)
    )(cfg, keys, left_a, right_a, left_b, right_b, rig)


@functools.partial(jax.jit, static_argnames=("cfg",))
def verify_pair_depth(cfg, key, left_a, depth_a, left_b, depth_b, rig) -> VerifiedLoop:
    return _verify_pair_depth_impl(cfg, key, left_a, depth_a, left_b, depth_b, rig)
