"""cerebro_tpu — TPU-native loop-closure + relocalization engine.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
mpkuse/cerebro (reference: /root/reference): learned whole-image descriptor
network on-chip, batched descriptor similarity search with temporal
consistency, vmap'd RANSAC PnP/ICP geometric verification, kidnap detection
with multi-world recovery, teach-and-repeat state save/load, and a
distributed pose-graph Gauss-Newton optimizer — all designed for SPMD
execution over a `jax.sharding.Mesh` (descriptor DB sharded over devices,
distributed top-k retrieval over ICI collectives).

The reference is a ROS1 C++ node + Keras GPU RPC server organized as 8
threads over mutex-guarded maps (see SURVEY.md §1). This package replaces
that with (1) a host-side ingest/orchestration layer, (2) jitted SPMD
compute stages, and (3) functional state containers with orbax
checkpointing. Batch-by-default: stages operate on batches of keyframes and
candidates rather than one frame per wall-clock tick.
"""

__version__ = "0.1.0"

from cerebro_tpu.config import (  # noqa: F401
    CerebroConfig,
    DescriptorConfig,
    KidnapConfig,
    LoopConfig,
    PoseGraphConfig,
    VerifyConfig,
)
