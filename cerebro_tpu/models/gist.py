"""Training-free whole-image descriptor (gist-style).

The learned NetVLAD descriptor (models/descriptor.py) needs trained weights
to discriminate places — at random init every image maps to nearly the same
vector (the reference had the same dependency: its detection quality comes
from the bundled trained .h5 weights, ref scripts/keras.models/ +
cartwheel_train). This module provides the capability the reference's
``SampleGPUComputer`` dummy stands in for
(scripts/whole_image_desc_compute_server.py:27-60), but actually useful: a
deterministic, training-free descriptor built from multi-scale local
statistics, discriminative enough for identical/near-identical revisits and
for pipeline/integration testing.

Construction: downsample to a coarse grid at 2 scales, per-cell mean +
gradient-energy statistics, per-image standardization (removes the shared
"DC" component that plagues untrained nets), fixed random projection to D
dims, L2 norm. One jit program, MXU-shaped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _avg_pool(x: jax.Array, k: int) -> jax.Array:
    """(B, H, W) -> (B, H/k, W/k) mean pooling."""
    B, H, W = x.shape
    return x.reshape(B, H // k, k, W // k, k).mean(axis=(2, 4))


@functools.partial(jax.jit, static_argnames=("dim",))
def gist_descriptors(images_u8: jax.Array, dim: int = 256) -> jax.Array:
    """(B, H, W) or (B, H, W, 1) uint8 -> (B, dim) unit descriptors.

    H and W must be divisible by 16."""
    if images_u8.ndim == 4:
        images_u8 = images_u8[..., 0]
    x = images_u8.astype(jnp.float32) / 255.0
    B = x.shape[0]

    gx = x - jnp.roll(x, 1, axis=2)
    gy = x - jnp.roll(x, 1, axis=1)
    grad = jnp.sqrt(gx * gx + gy * gy + 1e-12)

    # Standardize each feature group separately (per image): the groups
    # (brightness vs gradient energy, per scale) live on different scales,
    # and a whole-vector standardization would leave a large cross-image
    # common component encoding only the group structure.
    feats = []
    for k in (8, 16):
        for chan in (x, grad):
            g = _avg_pool(chan, k).reshape(B, -1)
            g = g - jnp.mean(g, axis=-1, keepdims=True)
            g = g / (jnp.std(g, axis=-1, keepdims=True) + 1e-6)
            # weight groups equally regardless of cell count
            feats.append(g / jnp.sqrt(float(g.shape[-1])))
    f = jnp.concatenate(feats, axis=-1)  # (B, F)

    proj = jax.random.normal(jax.random.PRNGKey(7), (f.shape[-1], dim)) / jnp.sqrt(
        float(f.shape[-1])
    )
    d = jnp.dot(f, proj, preferred_element_type=jnp.float32)
    return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
