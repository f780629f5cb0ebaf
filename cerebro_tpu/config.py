"""Typed configuration for the whole engine.

Replaces the reference's four-layer config system (opencv-yaml files, ROS
private params, compile-time ``#define`` switches, and hard-coded constants
in thread bodies — see reference src/Cerebro.h:49, src/cerebro_node.cpp:401)
with one frozen dataclass tree. Every default that mirrors a reference
constant cites its source file:line.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DescriptorConfig:
    """Whole-image descriptor network (replaces the keras-server RPC, L3).

    Reference: scripts/whole_image_desc_compute_server.py + NetVLAD layer in
    scripts/predict_utils.py:11-79.
    """

    # Input geometry. EuRoC native is 752x480 gray
    # (ref config/vinsfusion/euroc/euroc_stereo_imu_config.yaml:17-18); the
    # reference's bundled June2019 models run at 240x320
    # (scripts/whole_image_desc_compute_server.py listing). We default to
    # 240x320 and keep dims MXU-friendly.
    image_hw: Tuple[int, int] = (240, 320)
    num_channels: int = 1
    # Descriptor backend: "ported" (the reference's actual trained flagship
    # weights, mobilenet_conv7_allpairloss, run natively — see
    # models/mobilenet.py), "netvlad" (in-framework net, needs trained
    # weights), or "gist" (training-free multi-scale statistics — the useful
    # version of the reference's SampleGPUComputer dummy descriptor,
    # scripts/whole_image_desc_compute_server.py:27-60).
    kind: str = "netvlad"
    # Directory of the ported-weights artifact (kind="ported"); None uses
    # artifacts/descriptor_ported.
    artifact_dir: Optional[str] = None
    # CNN trunk for kind="netvlad": "mobile" (conv_pw_7 analog) or "vgg16"
    # (the reference's VGG16 cut backing ReljaNetVLAD,
    # scripts/keras_helpers.py:231-336).
    backbone: str = "mobile"
    # Optional WPCA artifact (.npz from models/wpca.py): descriptors are
    # whitened + re-projected after the network, whatever the kind — the
    # ReljaNetVLAD pipeline shape, VLAD -> WPCA -> L2
    # (scripts/whole_image_desc_compute_server.py:62-165).
    wpca_artifact: Optional[str] = None
    # NetVLAD clusters (K=16 in the bundled gray_conv6_K16 model family).
    num_clusters: int = 16
    # Ghost clusters (GhostVLAD, ref scripts/predict_utils.py:83-155): they
    # absorb uninformative features in the softmax and are dropped before
    # normalization. 0 = plain NetVLAD.
    num_ghost: int = 0
    # Trunk output channel count; descriptor dim = num_clusters * trunk_dim
    # (ref descriptors are 4096-8192 dim, SURVEY.md terminology section).
    trunk_dim: int = 256
    # Compute dtype on the MXU.
    dtype: str = "bfloat16"
    # Batch size used for on-chip batched descriptor inference.
    batch_size: int = 8
    # Minimum tracked-feature count for a frame to be described at all —
    # kidnapped frames are skipped (ref src/Cerebro.cpp:206-210).
    min_tracked_features: int = 20


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    """Similarity search + temporal consistency (candidate generation).

    Reference: Cerebro::descrip_N__dot__descrip_0_N (src/Cerebro.cpp:903-1103)
    plus the faiss variants and HypothesisManager.
    """

    # Candidate-generation method (ref Cerebro::run dispatch,
    # src/Cerebro.cpp:350-357): "A" dense argmax + 3-way temporal
    # consistency (default), "B" top-k naive, "C" top-k clique merging,
    # "D" multi-hypothesis TTL tracking.
    method: str = "A"
    # Dot-product acceptance threshold (ref src/Cerebro.cpp:912 DOT_PROD_THRESH).
    dot_threshold: float = 0.85
    # The argmaxes of the newest 3 descriptors' score vectors must agree
    # within this many frames (ref src/Cerebro.cpp:913 LOCALITY_THRESH).
    locality_threshold: int = 12
    # Newest frames excluded from search — no trivial self-matches
    # (ref src/Cerebro.cpp:914 `l - 50` exclusion window).
    exclusion_window: int = 50
    # Number of consecutive newest descriptors that must agree (u, um, umm in
    # ref src/Cerebro.cpp:1019-1032).
    consistency_frames: int = 3
    # Descriptor DB capacity (ref statically allocates 29000 columns,
    # src/Cerebro.cpp:946). Must be a multiple of the shard tile (128).
    db_capacity: int = 29184  # 57 * 512 — ref 29000 rounded up to the search tile
    # Store the DB int8-quantized: half the HBM per row (2x capacity per
    # byte), int8 MXU scoring; <2e-2 dot-product deviation on unit
    # descriptors. Method A (single argmax) only; composes with a mesh
    # (parallel.shard_db_quantized + sharded int8 search).
    quantized: bool = False
    # Reject candidate pairs that still share live tracker feature ids:
    # shared ids mean VINS tracked continuously between the frames, so the
    # pair is odometrically connected — re-observation, not a loop
    # closure. Robust companion to the Δt>10 s gate (needs per-keyframe
    # feature tracks via ingest_frame(feat_ids=...); DataNode stores the
    # same tracks, ref src/DataNode.h:49-190). Applied only WITHIN one
    # world: tracker id counters reset across kidnap sessions, so
    # cross-world id equality is coincidental — and cross-world pairs are
    # the loop closures that merge worlds.
    reject_shared_tracks: bool = True
    # Top-k returned by the sharded retrieval kernel (ref faiss k-NN=5,
    # src/Cerebro.cpp:460).
    top_k: int = 5
    # Method A candidates PER QUERY handed to the geometric verifier.
    # 1 = the reference's exact behavior (single argmax). >1 widens the
    # frontier: each query's top-k distinct history hits that pass the
    # temporal-consistency rule all become candidates, and geometric
    # verification — not the argmax — decides. Trades verify compute for
    # recall (the trade the reference's faiss methods exist to make,
    # src/Cerebro.cpp:366-722).
    candidates_per_query: int = 1
    # Hypothesis tracker (Method D equivalent, ref src/HypothesisManager.*).
    hypothesis_ttl: int = 20  # ref src/HypothesisManager.h:32
    hypothesis_locality: int = 7  # ref src/HypothesisManager.cpp:51
    hypothesis_decay: int = 4  # ref src/HypothesisManager.cpp:74-86
    # Queries per digest tick. The reference digests once per 10 Hz tick,
    # which covers the (up to) 3 newest descriptors scored that tick
    # (src/Cerebro.cpp:1019-1032 + src/HypothesisManager.cpp:74-86).
    # Anchoring decay to the QUERY index — not the update() call — makes
    # Method D invariant to how the stream is batched. Default 1 is the
    # photo-world sweep frontier (SWEEP_METHOD_D.json: digest-per-query
    # dominates every slower cadence at all promote/TTL/decay settings);
    # even so Method D's frontier recall is 0.15 vs Method C's 0.95 —
    # D is kept for reference parity, C is the recommended top-k method.
    hypothesis_digest_every: int = 1
    # support needed to promote a hypothesis to a loop candidate (the
    # reference's digest logic is marked 'under development'; 3 mirrors the
    # 3-consecutive-frame rule of Method A)
    hypothesis_promote: int = 3


@dataclasses.dataclass(frozen=True)
class VerifyConfig:
    """Geometric verification of loop candidates.

    Reference: loopcandiate_consumer_thread (src/Cerebro.cpp:1185-2213),
    DlsPnpWithRansac.cpp, ProcessedLoopCandidate.cpp.
    """

    # Feature matching gates (ref src/Cerebro.cpp:1487 `<150` reject;
    # src/ProcessedLoopCandidate.cpp:112 `>800` accept).
    min_matches_attempt: int = 150
    min_matches_accept: int = 800
    # Max number of features extracted per image (ref ORB x 5000,
    # src/utils/PointFeatureMatching.cpp:21). Static shape for vmap.
    max_features: int = 1024
    max_matches: int = 1024
    # RANSAC budget (ref src/DlsPnpWithRansac.cpp:88-93,206-212); we run a
    # fixed hypothesis batch in parallel instead of 5-50 sequential iters.
    ransac_hypotheses: int = 256
    pnp_sample_size: int = 6
    icp_sample_size: int = 4
    pnp_inlier_error: float = 0.03  # normalized-coord reprojection L1
    icp_inlier_error: float = 0.1  # metres
    # ICP inlier threshold also scales with pair depth:
    # max(icp_inlier_error, icp_depth_relative * max(Z_a, Z_b)). Stereo
    # depth noise grows as Z^2·σ_d/(fx·B) — a fixed 0.1 m makes every
    # far point a guaranteed outlier and Option C fail wholesale on deep
    # scenes (the reference's StereoBM rigs share the noise model; its
    # fixed 0.1 works because its demo scenes are close-range). 0 restores
    # the fixed threshold.
    icp_depth_relative: float = 0.035
    min_inlier_ratio: float = 0.7
    min_points_for_solve: int = 20  # ref src/DlsPnpWithRansac.cpp:19,136
    # GMS support threshold factor (ref GMSMatcher THRESH_FACTOR=6,
    # src/utils/GMSMatcher/gms_matcher.h). Lower = more permissive.
    gms_factor: float = 6.0
    # Rotation-invariant matching: steer descriptor patches into each
    # keypoint's dominant-orientation frame (ORB is rotation-invariant by
    # construction, ref src/utils/PointFeatureMatching.cpp:21, and GMS runs
    # 8 rotation patterns, ref gms_matcher.h:9-46 — a rolled revisit must
    # still verify). Default ON for parity.
    oriented_matching: bool = True
    # Scale-robust matching: anything beyond (1.0,) turns on multi-octave
    # Harris detection (3-level pyramid, per-keypoint octave descriptors) +
    # fractional scale banks on frame b filling the half-octave gaps, best
    # (octave-pair x fraction x orientation) bank wins. Mirrors the
    # reference's scale handling: ORB detects on an 8-level pyramid
    # (src/utils/PointFeatureMatching.cpp:21) and GMS sweeps 5 relative
    # scales (src/utils/GMSMatcher/gms_matcher.h:9-46). A revisit at 1.5-2x
    # approach distance must still verify.
    scale_banks: Tuple[float, ...] = (0.5, 0.70710678, 1.0, 1.41421356)
    # Point matcher for verification (measured per pair on a v5e chip):
    #   "steerable" — ring-Fourier steerable-basis matcher
    #     (ops/steerable.py): rotation/scale banks as phase multiplies +
    #     alternate basis matmuls on ONE superpatch extraction. 7.8 ms,
    #     scale+rotation robust (148 matches on a 1.54x approach-distance
    #     pair where the single-scale gather matcher collapses to 60).
    #   "gather" — per-keypoint bilinear-gather banks
    #     (features.match_image_pair): highest quality (157 on the same
    #     pair) but 276 ms with full banks / 13 ms single-scale.
    matcher: str = "steerable"
    # Two-tier verification: every pair is verified with the cheap tier
    # first (the configured matcher; for "gather" a single-scale variant);
    # only match-count failures — the failure mode an extreme scale change
    # causes — escalate to the full gather-bank matcher.
    cascade: bool = True
    # Depth validity range in metres (ref src/utils/PointFeatureMatching.cpp:125).
    min_depth: float = 0.1
    max_depth: float = 25.0
    # Stereo block matching parity target: StereoBM(numDisparities=64,
    # blockSize=21) (ref src/utils/CameraGeometry.cpp:81).
    num_disparities: int = 64
    block_size: int = 21
    # 3-way pose consistency gate (ref src/ProcessedLoopCandidate.cpp:77-87):
    # pairwise delta-poses within 5 deg (ypr inf-norm) and 0.2 m.
    consistency_deg: float = 5.0
    consistency_m: float = 0.2
    # Reject candidate pairs closer than this in time
    # (ref src/ProcessedLoopCandidate.cpp:49-56).
    min_pair_dt_s: float = 10.0


@dataclasses.dataclass(frozen=True)
class KidnapConfig:
    """Kidnap (failure) detection + multi-world recovery.

    Reference: Cerebro::kidnaped_thread (src/Cerebro.cpp:2235-2475).
    """

    # Kidnap begins when tracked features drop below this
    # (ref src/Cerebro.cpp:2254 THRESH_N_FEATS).
    feature_threshold: int = 15
    # ... sustained for this long (ref src/Cerebro.cpp:2255).
    sustain_s: float = 3.0
    # Input-stream gap that also triggers the reset path
    # (ref src/DataManager.cpp:263-291 >1 s image-timestamp gap).
    stream_gap_s: float = 1.0


@dataclasses.dataclass(frozen=True)
class PoseGraphConfig:
    """Distributed pose-graph optimizer (capability of the external
    solve_keyframe_pose_graph repo, now in-framework — ref README.md:176-194).
    """

    # 4-DOF (x, y, z, yaw — VINS drift dims, the reference ecosystem's
    # parameterization) or 6-DOF (full se(3) twists).
    dof: int = 4
    max_gn_iters: int = 25
    cg_iters: int = 100
    # Switch-constraint (robust loop edge) prior weight, DCS/SC style —
    # this is the robustifier for outlier loop edges (the role the
    # reference ecosystem's switch-constrained solver plays; no separate
    # Huber kernel is layered on top).
    switch_prior_weight: float = 1.0
    damping: float = 1e-6
    # Shape-bucket floors for the padded live solve. A growing graph walks
    # the power-of-two buckets (one recompile each); a LIVE engine that
    # knows its horizon should set floors covering the whole run so the
    # solve keeps ONE compiled shape — mid-stream executable churn on a
    # remote-TPU relay can evict other live programs (observed: a detect
    # dispatch stalled ~10 s behind a mid-stream optimize reload).
    node_bucket_floor: int = 16
    loop_bucket_floor: int = 32


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Host-side orchestration parameters (replaces thread rates + RAM
    policy of the reference's DataManager/ImageDataManager)."""

    # Descriptor batching window: frames accumulated before one batched
    # inference dispatch (replaces the 20 Hz scan + adaptive skip of
    # ref src/Cerebro.cpp:124,193-203 — on TPU we batch instead of skip).
    descriptor_batch: int = 8
    # Keyframe image RAM window before stashing to disk
    # (ref src/DataManager.cpp:709,728-730 keeps ~5-10 s in RAM).
    image_ram_window_s: float = 10.0
    # Disk stash directory (ref /tmp/cerebro_stash, src/ImageDataManager.h:47).
    # Empty = a private per-instance temp dir (stash files are keyed
    # ns__idx; engines sharing a directory clobber each other — set an
    # explicit path only for teach-and-repeat flows that must find it).
    stash_dir: str = ""
    # Reload cache TTL in hits (ref src/ImageDataManager.cpp:155).
    image_cache_ttl: int = 10
    # Backpressure / load shedding (parity: ref sheds descriptor work with
    # P(skip) = 1 - Δt/est_compute_ms when the GPU server can't keep up,
    # src/Cerebro.cpp:193-203). Here the policy is deterministic: when the
    # ingest backlog exceeds `shed_backlog` frames, only every
    # ceil(backlog/shed_backlog)-th eligible keyframe is queued for
    # description until the backlog drains. Frames are still stored (poses,
    # kidnap monitoring, images) — only the descriptor work is shed, exactly
    # like the reference's skip.
    shed_backlog: int = 512
    # Persistent XLA compilation cache (runtime/compile_cache.py): the
    # engine's programs compile in 25-50 s each on the chip; with the cache
    # a machine pays that once ever, not once per process. Empty string
    # disables; None uses ~/.cache/cerebro_tpu/xla.
    compilation_cache_dir: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """SPMD mesh layout. The descriptor DB history axis is sharded over
    `data` (the sequence-parallel analog, SURVEY.md §5.7); batch inference is
    data-parallel over the same axis."""

    # Names of mesh axes; a 1-axis mesh shards the DB history dimension.
    axis_db: str = "db"
    # Number of devices; None = all visible devices.
    num_devices: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class CerebroConfig:
    descriptor: DescriptorConfig = dataclasses.field(default_factory=DescriptorConfig)
    loop: LoopConfig = dataclasses.field(default_factory=LoopConfig)
    verify: VerifyConfig = dataclasses.field(default_factory=VerifyConfig)
    kidnap: KidnapConfig = dataclasses.field(default_factory=KidnapConfig)
    posegraph: PoseGraphConfig = dataclasses.field(default_factory=PoseGraphConfig)
    runtime: RuntimeConfig = dataclasses.field(default_factory=RuntimeConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def replace(self, **kw) -> "CerebroConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = CerebroConfig()
