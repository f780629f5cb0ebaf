"""NetVLAD / GhostVLAD aggregation layers (Flax linen).

Re-designed from the behavior of the reference's custom Keras layers
(scripts/predict_utils.py:11-79 ``NetVLADLayer`` and :83-155
``GhostVLADLayer``): a 1x1-conv soft-assignment over K cluster centers,
softmax, residual aggregation to the centers, intra-normalization per
cluster, flatten, and final L2 normalization. Ghost clusters participate in
the softmax but are dropped before normalization.

TPU notes: the soft-assignment conv and the residual aggregation are both
expressed as single einsums so XLA maps them onto the MXU; everything runs
in bfloat16 with float32 accumulation (`preferred_element_type`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class NetVLAD(nn.Module):
    """num_clusters K over C-dim local features -> (K*C,) unit descriptor."""

    num_clusters: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, H, W, C) feature map from the trunk.
        B, H, W, C = x.shape
        K = self.num_clusters
        feats = x.reshape(B, H * W, C)

        # Soft assignment: 1x1 conv == dense over channels.
        assign_w = self.param("assign_w", nn.initializers.lecun_normal(), (C, K), jnp.float32)
        assign_b = self.param("assign_b", nn.initializers.zeros, (K,), jnp.float32)
        centers = self.param("centers", nn.initializers.lecun_normal(), (K, C), jnp.float32)

        logits = (
            jnp.einsum(
                "bnc,ck->bnk",
                feats.astype(self.dtype),
                assign_w.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + assign_b
        )
        a = jax.nn.softmax(logits, axis=-1)  # (B, N, K) float32

        # Residual aggregation: V[b,k,c] = sum_n a[b,n,k] * (f[b,n,c] - mu[k,c])
        #                               = (a^T f)[b,k,c] - (sum_n a)[b,k] * mu[k,c]
        af = jnp.einsum(
            "bnk,bnc->bkc",
            a.astype(self.dtype),
            feats.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        a_sum = jnp.sum(a, axis=1)  # (B, K)
        V = af - a_sum[..., None] * centers[None]  # (B, K, C) float32

        # Intra-normalize per cluster, flatten, L2 (ref predict_utils.py:64-71).
        V = V / (jnp.linalg.norm(V, axis=-1, keepdims=True) + 1e-12)
        v = V.reshape(B, K * C)
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)


class GhostVLAD(nn.Module):
    """NetVLAD with G ghost clusters absorbing uninformative features
    (ref scripts/predict_utils.py:83-155)."""

    num_clusters: int = 16
    num_ghost: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        K, G = self.num_clusters, self.num_ghost
        feats = x.reshape(B, H * W, C)

        assign_w = self.param("assign_w", nn.initializers.lecun_normal(), (C, K + G), jnp.float32)
        assign_b = self.param("assign_b", nn.initializers.zeros, (K + G,), jnp.float32)
        centers = self.param("centers", nn.initializers.lecun_normal(), (K, C), jnp.float32)

        logits = (
            jnp.einsum(
                "bnc,ck->bnk",
                feats.astype(self.dtype),
                assign_w.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + assign_b
        )
        a_full = jax.nn.softmax(logits, axis=-1)
        # per-token probability mass captured by the ghost columns —
        # observable via apply(..., mutable=["intermediates"]): trained
        # ghosts should soak up clutter tokens (ref GhostVLAD purpose,
        # scripts/predict_utils.py:83-155)
        self.sow("intermediates", "ghost_mass", jnp.sum(a_full[..., K:], axis=-1))
        a = a_full[..., :K]  # drop ghost columns post-softmax

        af = jnp.einsum(
            "bnk,bnc->bkc",
            a.astype(self.dtype),
            feats.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        a_sum = jnp.sum(a, axis=1)
        V = af - a_sum[..., None] * centers[None]
        V = V / (jnp.linalg.norm(V, axis=-1, keepdims=True) + 1e-12)
        v = V.reshape(B, K * C)
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
