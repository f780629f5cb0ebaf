"""Whole-image descriptor network: trunk + NetVLAD, jitted batch inference.

This module replaces the reference's entire L3 descriptor service — the ROS
RPC round-trip to a Keras/TF GPU process
(scripts/whole_image_desc_compute_server.py, called from
src/Cerebro.cpp:263) — with an on-chip batched forward pass. The service's
contract is preserved: image in, L2-normalized descriptor out; descriptor
dimension = num_clusters * trunk_dim (4096 by default, matching the 4096-8192
range of the reference's models).
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cerebro_tpu.config import DescriptorConfig
from cerebro_tpu.models.backbones import MobileTrunk, VGGTrunk, normalize_image
from cerebro_tpu.models.netvlad import GhostVLAD, NetVLAD


class DescriptorNet(nn.Module):
    """End-to-end: normalized image batch -> unit-norm descriptor batch."""

    num_clusters: int = 16
    trunk_dim: int = 256
    num_ghost: int = 0  # >0 selects GhostVLAD (ref predict_utils.py:83-155)
    backbone: str = "mobile"  # "mobile" (conv_pw_7 analog) or "vgg16"
    # (the ReljaNetVLAD/keras_helpers VGG cut, ref keras_helpers.py:231-336)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        # images: (B, H, W, C) already normalized to [-1, 1].
        if self.backbone == "vgg16":
            feats = VGGTrunk(out_dim=self.trunk_dim, dtype=self.dtype)(images)
        else:
            feats = MobileTrunk(out_dim=self.trunk_dim, dtype=self.dtype)(images)
        if self.num_ghost > 0:
            return GhostVLAD(
                num_clusters=self.num_clusters,
                num_ghost=self.num_ghost,
                dtype=self.dtype,
            )(feats)
        return NetVLAD(num_clusters=self.num_clusters, dtype=self.dtype)(feats)

    @property
    def descriptor_dim(self) -> int:
        return self.num_clusters * self.trunk_dim


def create_descriptor_model(
    cfg: DescriptorConfig, seed: int = 0
) -> Tuple[DescriptorNet, dict]:
    """Build the net and init params for the configured input geometry.

    Mirrors the reference's zero-image probe that discovers descriptor size
    at startup (src/Cerebro.cpp:75-120) — here the size is static:
    num_clusters * trunk_dim.
    """
    net = DescriptorNet(
        num_clusters=cfg.num_clusters,
        trunk_dim=cfg.trunk_dim,
        num_ghost=cfg.num_ghost,
        backbone=cfg.backbone,
        dtype=jnp.dtype(cfg.dtype),
    )
    h, w = cfg.image_hw
    dummy = jnp.zeros((1, h, w, cfg.num_channels), jnp.float32)
    params = net.init(jax.random.PRNGKey(seed), dummy)
    return net, params


def load_descriptor_params(directory: str, cfg: DescriptorConfig, seed: int = 0):
    """Load a trained-weights artifact (e.g. scripts/pretrain_synthetic.py
    output) shaped for ``cfg``. Returns (net, params)."""
    import os

    import orbax.checkpoint as ocp

    net, params0 = create_descriptor_model(cfg, seed=seed)
    ckpt = ocp.StandardCheckpointer()
    params = ckpt.restore(
        os.path.abspath(os.path.join(directory, "params")), params0
    )
    return net, params


@functools.partial(jax.jit, static_argnums=0)
def describe_batch(net: DescriptorNet, params, images_u8: jax.Array) -> jax.Array:
    """uint8 image batch (B,H,W,C) -> (B, D) unit descriptors, on device.

    One fused jit program: normalization + trunk + NetVLAD. Replaces the
    per-image RPC of ref src/Cerebro.cpp:221-275 with device-side batching.
    """
    x = normalize_image(images_u8)
    return net.apply(params, x)
