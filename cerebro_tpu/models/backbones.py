"""CNN trunks for the whole-image descriptor network (Flax linen).

Behavioral equivalent of the reference's Keras backbones
(scripts/keras_helpers.py:231-336 — mobilenet cut at ``conv_pw_7_relu``,
VGG16/19 cuts): a depthwise-separable MobileNet-style trunk that downsamples
the input to a coarse feature map consumed by NetVLAD.

TPU notes: channel counts are multiples of 128 where it matters (the final
projection feeding NetVLAD), convs run in bfloat16 with float32 accumulation,
and all shapes are static. BatchNorm is replaced by GroupNorm so inference
needs no running statistics and the net is batch-size independent.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class SeparableBlock(nn.Module):
    """Depthwise 3x3 + pointwise 1x1, the MobileNet v1 building block."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        x = nn.Conv(
            features=c_in,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=c_in,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.GroupNorm(num_groups=min(32, c_in), dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Conv(
            features=self.features,
            kernel_size=(1, 1),
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.GroupNorm(num_groups=min(32, self.features), dtype=jnp.float32)(x)
        return nn.relu(x)


class MobileTrunk(nn.Module):
    """MobileNet-style trunk: stem conv s2 + separable blocks.

    Default config reaches a /16 feature map with `out_dim` channels — the
    analog of mobilenet cut at conv_pw_7 (ref keras_helpers.py:231-287).
    """

    out_dim: int = 256
    widths: Sequence[int] = (64, 128, 128, 256, 256)
    strides: Sequence[int] = (2, 1, 2, 1, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, H, W, C) float in [-1, 1] (the reference's server normalizes
        # inputs as (im-128)*2/255, whole_image_desc_compute_server.py:629).
        x = x.astype(self.dtype)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x)
        x = nn.relu(x)
        for w, s in zip(self.widths, self.strides):
            x = SeparableBlock(features=w, stride=s, dtype=self.dtype)(x)
        x = SeparableBlock(features=self.out_dim, stride=2, dtype=self.dtype)(x)
        return x  # (B, H/16, W/16, out_dim)


class VGGTrunk(nn.Module):
    """VGG16-style trunk cut mid-network (ref keras_helpers.py:231-336
    ``make_from_vgg16``: plain 3x3 conv stacks + maxpool, cut at a block
    boundary — the backbone of the reference's ReljaNetVLAD pipeline,
    whole_image_desc_compute_server.py:62-165).

    ``cut_block`` selects how deep to go (1-indexed; 4 = through
    block4_conv3 at /8, 5 adds the 512-wide block5 at /16). A final 1x1
    projection to ``out_dim`` keeps the NetVLAD input MXU-aligned (VGG's
    native widths 64/128/256/512 already are). GroupNorm after each block
    replaces the reference's ImageNet-pretrained scale conditioning — this
    trunk trains in-framework (cartwheel_train equivalent, train/)."""

    out_dim: int = 256
    cut_block: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, H, W, C) float in [-1, 1].
        x = x.astype(self.dtype)
        blocks = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
        for b, (width, depth) in enumerate(blocks[: self.cut_block]):
            for _ in range(depth):
                x = nn.Conv(width, (3, 3), padding="SAME", use_bias=True,
                            dtype=self.dtype)(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.GroupNorm(num_groups=min(32, width), dtype=jnp.float32)(x)
            x = x.astype(self.dtype)
        if x.shape[-1] != self.out_dim:
            x = nn.Conv(self.out_dim, (1, 1), use_bias=False, dtype=self.dtype)(x)
        return x  # (B, H/2^cut, W/2^cut, out_dim)


def normalize_image(img_u8: jax.Array) -> jax.Array:
    """uint8/float image -> [-1, 1] float, matching the reference server's
    ``(im - 128) * 2 / 255`` (scripts/whole_image_desc_compute_server.py:629)."""
    return (img_u8.astype(jnp.float32) - 128.0) * (2.0 / 255.0)
